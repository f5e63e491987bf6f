package graft.redis

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TlsChannel

/** AUTH laws — the reference's username/password connect options
  * (sea-streamer-redis/src/streamer.rs:23-24,140-152; applied per
  * connection at create_connection, connection.rs:141-146) against the
  * embedded server's requirepass/ACL gate with redis's real reply
  * grammar: NOAUTH before credentials, WRONGPASS on a bad pair, the
  * legacy 2-arg `AUTH password` for the `default` user.
  */
class RedisAuthSpec extends AnyFunSuite {

  private val Creds = Some(("alice", "s3cret"))

  test("good credentials AUTH in the constructor and the whole command " +
      "surface serves; the legacy 2-arg form reaches the default user") {
    val srv = new EmbeddedRedis(auth = Some(("default", "hunter2")))
    try {
      // 2-arg AUTH (no username) targets `default`
      val c = new RedisClient(srv.host, srv.port,
        auth = Some(RedisClient.Auth(None, "hunter2")))
      try {
        c.commandS("XADD", "s", "1-1", "payload", "x")
        assert(srv.entries("s").map(_._1) == Seq("1-1"))
      } finally c.close()
    } finally srv.close()
    val srv2 = new EmbeddedRedis(auth = Some(("alice", "s3cret")))
    try {
      val c = new RedisClient(srv2.host, srv2.port,
        auth = Some(RedisClient.Auth(Some("alice"), "s3cret")))
      try c.commandS("XADD", "s", "2-2", "payload", "y")
      finally c.close()
      assert(srv2.entries("s").map(_._1) == Seq("2-2"))
    } finally srv2.close()
  }

  test("bad pair fails typed at construction (WRONGPASS); an " +
      "unauthenticated connection gets NOAUTH on every data command") {
    val srv = new EmbeddedRedis(auth = Creds)
    try {
      val e = intercept[RedisClient.RedisError] {
        new RedisClient(srv.host, srv.port,
          auth = Some(RedisClient.Auth(Some("alice"), "wrong")))
      }
      assert(e.getMessage.startsWith("WRONGPASS"), e.getMessage)
      // wrong username is the same refusal (redis never says which half)
      val e2 = intercept[RedisClient.RedisError] {
        new RedisClient(srv.host, srv.port,
          auth = Some(RedisClient.Auth(Some("bob"), "s3cret")))
      }
      assert(e2.getMessage.startsWith("WRONGPASS"))
      // no credentials: the connection opens (AUTH is the client's move)
      // but every data command is refused — nothing served, nothing stored
      val bare = new RedisClient(srv.host, srv.port)
      try {
        val e3 = intercept[RedisClient.RedisError](
          bare.commandS("XADD", "s", "1-1", "payload", "x"))
        assert(e3.getMessage.startsWith("NOAUTH"))
        assert(srv.entries("s").isEmpty)
      } finally bare.close()
    } finally srv.close()
  }

  test("AUTH against a server with no password set is refused (redis's " +
      "exact error), and authentication is per connection") {
    val open = new EmbeddedRedis()
    try {
      val e = intercept[RedisClient.RedisError] {
        new RedisClient(open.host, open.port,
          auth = Some(RedisClient.Auth(None, "anything")))
      }
      assert(e.getMessage.contains("no password is set"), e.getMessage)
    } finally open.close()
    // per-connection: one authenticated socket does not open the door for
    // a second, unauthenticated one
    val srv = new EmbeddedRedis(auth = Creds)
    try {
      val good = new RedisClient(srv.host, srv.port,
        auth = Some(RedisClient.Auth(Some("alice"), "s3cret")))
      val bare = new RedisClient(srv.host, srv.port)
      try {
        good.commandS("XADD", "s", "1-1", "payload", "x")
        val e = intercept[RedisClient.RedisError](
          bare.commandS("XRANGE", "s", "-", "+"))
        assert(e.getMessage.startsWith("NOAUTH"))
      } finally { good.close(); bare.close() }
    } finally srv.close()
  }

  test("facade: redis.username/redis.password connect options carry AUTH " +
      "end-to-end; username without password and stray TLS keys on " +
      "plain redis are refused at connect") {
    import graft.facade.SeaStreamer
    val spark = graft.TestSession.spark
    import spark.implicits._
    val srv = new EmbeddedRedis(auth = Creds)
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}",
        spark, Map("redis.username" -> "alice", "redis.password" -> "s3cret"))
      val env = (0 until 10).map { i =>
        ("s0", 0L, i.toLong,
          new java.sql.Timestamp(1700000000000L + i * 1000L),
          s"p$i".getBytes("UTF-8"))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env)
      val replay = conn.createConsumer(Seq("s0"),
        SeaStreamer.ConsumerOptions(live = false,
          autoStreamReset = SeaStreamer.AutoStreamReset.Earliest))
      assert(replay.count() == 10)
      // bad credentials surface typed from the executor path, not a hang
      intercept[Exception] {
        SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark,
          Map("redis.password" -> "wrong"))
          .createConsumer(Seq("s0"),
            SeaStreamer.ConsumerOptions(live = false)).count()
      }
      // username without password: refused at connect, before any socket
      intercept[graft.core.SeaStreamErr.Unsupported] {
        SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark,
          Map("redis.username" -> "alice"))
      }
      // TLS options on plain redis:// stay refused (credentials are the
      // ONLY security options the plaintext scheme accepts)
      intercept[graft.core.SeaStreamErr.Unsupported] {
        SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark,
          Map("redis.ssl.truststore.location" -> "/tmp/x"))
      }
    } finally srv.close()
  }

  test("AUTH composes with TLS: credentials inside the encrypted channel") {
    val (server, trust) = TlsChannel.ephemeral
    val srv = new EmbeddedRedis(tls = Some(server), auth = Creds)
    try {
      val c = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust)),
        auth = Some(RedisClient.Auth(Some("alice"), "s3cret")))
      try {
        assert(c.tlsProtocol.exists(_.startsWith("TLSv1")))
        c.commandS("XADD", "s", "1-1", "payload", "x")
        assert(srv.entries("s").map(_._1) == Seq("1-1"))
      } finally c.close()
      // TLS alone is not auth: a trusting client without credentials is
      // still NOAUTH-refused inside the channel
      val trusting = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust)))
      try {
        val e = intercept[RedisClient.RedisError](
          trusting.commandS("XRANGE", "s", "-", "+"))
        assert(e.getMessage.startsWith("NOAUTH"))
      } finally trusting.close()
    } finally srv.close()
  }
}
