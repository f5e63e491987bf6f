package graft.redis

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TlsChannel

/** `rediss://` laws (sea-streamer-redis/src/connection.rs:131-136): RESP
  * byte-identical inside a TLS channel, trust from the configured
  * truststore only, and the reference's ONE tls knob —
  * `disable_hostname_verification` — with its exact scope (waives the
  * NAME check, never chain verification).
  */
class RedisTlsSpec extends AnyFunSuite {

  test("RESP round-trips inside TLS; plaintext and untrusting clients " +
      "never reach the protocol") {
    val (server, trust) = TlsChannel.ephemeral
    val srv = new EmbeddedRedis(tls = Some(server))
    try {
      val c = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust)))
      try {
        assert(c.tlsProtocol.exists(_.startsWith("TLSv1")),
          s"not a TLS channel: ${c.tlsProtocol}")
        c.commandS("XADD", "s", "1-1", "payload", "x")
        val ids = c.commandS("XRANGE", "s", "-", "+") match {
          case Resp.Arr(entries) => entries.collect {
            case Resp.Arr(Seq(Resp.Bulk(id), _*)) => new String(id, "UTF-8")
          }
          case other => fail(s"unexpected XRANGE reply: $other")
        }
        assert(ids == Seq("1-1"), s"lost the entry: $ids")
      } finally c.close()
      // plaintext client: first RESP frame is not a TLS hello — dead
      // channel or garbage reply, never a parseable RESP success
      intercept[Exception] {
        val c2 = new RedisClient(srv.host, srv.port)
        try c2.commandS("PING") finally c2.close()
      }
      // untrusting client (fresh trust root): handshake fails at
      // construction — trust is the configured truststore's, never the
      // JVM default CAs
      val (_, wrongTrust) = TlsChannel.generate()
      intercept[javax.net.ssl.SSLHandshakeException] {
        new RedisClient(srv.host, srv.port,
          tls = Some(RedisClient.Tls(wrongTrust)))
      }
    } finally srv.close()
  }

  test("disable_hostname_verification waives ONLY the name check: a " +
      "trusted cert naming the wrong host fails verified, passes waived") {
    // a certificate whose SAN does NOT cover 127.0.0.1 — trusted chain,
    // wrong name (the exact situation the reference knob exists for:
    // connecting to a node by IP when the cert names the service DNS)
    val (server, trust) = TlsChannel.generate("SAN=DNS:db.internal.example")
    val srv = new EmbeddedRedis(tls = Some(server))
    try {
      intercept[javax.net.ssl.SSLHandshakeException] {
        new RedisClient(srv.host, srv.port,
          tls = Some(RedisClient.Tls(trust, verifyHostname = true)))
      }
      val c = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust, verifyHostname = false)))
      try assert(c.commandS("PING").toString.contains("PONG"))
      finally c.close()
      // the waiver does NOT extend to chain trust: wrong truststore still
      // fails even with hostname verification off
      val (_, wrongTrust) = TlsChannel.generate()
      intercept[javax.net.ssl.SSLHandshakeException] {
        new RedisClient(srv.host, srv.port,
          tls = Some(RedisClient.Tls(wrongTrust, verifyHostname = false)))
      }
    } finally srv.close()
  }

  test("LIVE redis-stream source reads over TLS — the Tls config rides " +
      "InputPartition serialization to executor tasks") {
    val spark = graft.TestSession.spark
    val (server, trust) = TlsChannel.ephemeral
    val srv = new EmbeddedRedis(tls = Some(server))
    try {
      val w = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust)))
      try (1 to 5).foreach(i =>
        w.commandS("XADD", "ev", s"$i-1",
          RedisStreams.DefaultMessageField, s"p$i"))
      finally w.close()
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "ev").option("shards", "1")
        .option("startingOffsets", "earliest")
        .option("ssl.truststore.location", trust.truststore)
        .option("ssl.truststore.password", trust.password)
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("rediss_live_sink").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("rediss_live_sink")
        .collect().map(r => new String(r.getAs[Array[Byte]]("payload")))
        .sorted.toSeq
      assert(got == Seq("p1", "p2", "p3", "p4", "p5"),
        s"live TLS read lost messages: $got")
    } finally srv.close()
  }

  test("facade rediss:// runs bounded write + read end-to-end over TLS; " +
      "config laws hold") {
    val spark = graft.TestSession.spark
    val (server, trust) = TlsChannel.ephemeral
    val srv = new EmbeddedRedis(tls = Some(server))
    try {
      import graft.facade.SeaStreamer
      // rediss without trust material is unusable — refused at connect
      intercept[graft.core.SeaStreamErr.Unsupported] {
        SeaStreamer.connect(s"rediss://${srv.host}:${srv.port}", spark)
      }
      // kafka.* keys on rediss are a config error, not silently dropped
      intercept[graft.core.SeaStreamErr.Unsupported] {
        SeaStreamer.connect(s"rediss://${srv.host}:${srv.port}", spark,
          Map("redis.ssl.truststore.location" -> trust.truststore,
            "kafka.security.protocol" -> "SSL"))
      }
      val conn = SeaStreamer.connect(
        s"rediss://${srv.host}:${srv.port}", spark,
        Map("redis.ssl.truststore.location" -> trust.truststore,
          "redis.ssl.truststore.password" -> trust.password))
      import spark.implicits._
      val df = Seq(
        ("ev", 0L, 0L, new java.sql.Timestamp(1000), "a".getBytes),
        ("ev", 0L, 1L, new java.sql.Timestamp(2000), "b".getBytes))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(df)
      val got = conn.createConsumer(Seq("ev"),
        SeaStreamer.ConsumerOptions(live = false, redisShards = 1))
        .collect().map(r => new String(r.getAs[Array[Byte]]("payload")))
        .sorted.toSeq
      assert(got == Seq("a", "b"), "rediss bounded round-trip lost messages")
    } finally srv.close()
  }
}
