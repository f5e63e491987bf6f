package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** Fault-path laws for the kafka wire stack — the behaviors the reference
  * inherits from librdkafka's retry machinery (and spells out for redis,
  * sea-streamer-redis/src/producer.rs:464-507): survive disconnects by
  * retrying from known state, refuse to silently skip corruption, replay
  * refused produces. EmbeddedKafka's fault taps inject each failure on
  * demand; every law asserts BOTH the recovery and the absence of
  * duplicates / silent drops.
  */
class KafkaFaultSpec extends AnyFunSuite {

  private def withBroker[T](f: (EmbeddedKafka, KafkaClient) => T): T = {
    val srv = new EmbeddedKafka
    val c = new KafkaClient(srv.host, srv.port)
    try f(srv, c) finally { c.close(); srv.close() }
  }


  test("connect-time failure consumes the retry budget and surfaces typed") {
    // the reconnect loop must own ESTABLISHMENT too: a broker briefly down
    // between drop and reconnect throws from mkClient, which must retry on
    // the same budget and surface the same typed error as a mid-call drop
    val fails = new java.util.concurrent.atomic.AtomicInteger(2)
    val session = new KafkaClient.Session(() =>
      if (fails.getAndDecrement() > 0)
        throw new java.io.IOException("connect refused")
      else null: KafkaClient, backoffMs = 1L)
    try assert(session.retrying("op")(_ => 42) == 42,
      "connect failures within budget must retry through")
    finally session.close()
    val dead = new KafkaClient.Session(() =>
      throw new java.io.IOException("refused"), maxRetries = 2, backoffMs = 1L)
    val e = intercept[graft.core.SeaStreamErr.Backend] {
      dead.retrying("op")(_ => ())
    }
    assert(e.getMessage.contains("retries exhausted"))
  }

  test("connection drop mid-fetch: session resumes from its cursor, no duplicate rows") {
    withBroker { (srv, seed) =>
      seed.metadata(Seq("t"))
      // one batch per record so the paged scan issues MANY fetches and the
      // drops land mid-scan, not before it
      (0 until 20).foreach(i =>
        seed.produce("t", 0, Seq((i.toLong, null, s"m$i".getBytes))))
      srv.dropFetches.set(3)
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port), backoffMs = 1L)
      try {
        val all = KafkaSource.pagedFetch(session, "t", 0, 0L, 20L,
          maxBytes = 1).toSeq // 1-byte cap → one batch per fetch page
        assert(all.map(_.sequence) == (0L until 20L),
          "a reconnect must deliver every offset exactly once")
      } finally session.close()
      assert(srv.dropFetches.get() == 0, "all injected drops were consumed")
    }
  }

  test("retries exhausted surfaces a typed backend error, not a hang") {
    withBroker { (srv, seed) =>
      seed.metadata(Seq("t"))
      seed.produce("t", 0, Seq((1L, null, "x".getBytes)))
      srv.dropFetches.set(1000)
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port),
        maxRetries = 3, backoffMs = 1L)
      try {
        val e = intercept[graft.core.SeaStreamErr.Backend] {
          KafkaSource.pagedFetch(session, "t", 0, 0L, 1L).toSeq
        }
        assert(e.getMessage.contains("retries exhausted"))
      } finally session.close()
    }
  }

  test("corrupt record-batch CRC is a typed error — never a silent skip, never a retry") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      c.produce("t", 0, (0 until 5).map(i => (i.toLong, null, s"m$i".getBytes)))
      srv.corruptFetches.set(1)
      // bare client: the CRC check is the client's, before any retry layer
      val e = intercept[KafkaWire.CorruptBatchException](c.fetch("t", 0, 0L))
      assert(e.getMessage.contains("CRC mismatch"))
      // the session must NOT retry corruption (same bytes would come back;
      // mirroring SsReader's ChecksumException law) — with the tap spent,
      // a second fetch succeeds, so a wrongly-retrying session would pass
      // the scan; inject an inexhaustible tap to pin the no-retry rule
      srv.corruptFetches.set(1000)
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port), backoffMs = 1L)
      try {
        intercept[KafkaWire.CorruptBatchException] {
          KafkaSource.pagedFetch(session, "t", 0, 0L, 5L).toSeq
        }
      } finally session.close()
      assert(srv.corruptFetches.get() == 999,
        "exactly one corrupted response served to the session — no retry " +
          "consumed more")
      srv.corruptFetches.set(0)
    }
  }

  test("boundedRead end-to-end survives injected drops (executor-path law)") {
    withBroker { (srv, seed) =>
      seed.metadata(Seq("e"))
      seed.produce("e", 0, (0 until 50).map(i => (i.toLong, null, s"m$i".getBytes)))
      srv.dropFetches.set(2)
      val spark = graft.TestSession.spark
      val df = KafkaSource.boundedRead(spark, srv.host, srv.port, Seq("e"))
      assert(df.count() == 50L,
        "the Spark scan must self-heal through connection drops")
      assert(srv.dropFetches.get() == 0)
    }
  }

  test("fault recovery holds over SASL_SSL: a dropped TLS connection " +
      "re-handshakes, re-authenticates and resumes exactly-once") {
    // the Session's mkClient closure must carry the FULL security config:
    // a reconnect that came back plaintext or unauthenticated would be
    // cut by the listener and read as data loss
    val (server, trust) = KafkaTls.ephemeral
    val creds = ("svc", "pw")
    val srv = new EmbeddedKafka(credentials = Some(creds),
      tls = Some(server))
    try {
      val mk = () => new KafkaClient(srv.host, srv.port,
        sasl = Some(creds), saslMechanism = KafkaWire.Scram.Sha256,
        tls = Some(trust))
      val seed = mk()
      try {
        seed.metadata(Seq("t"))
        (0 until 20).foreach(i =>
          seed.produce("t", 0, Seq((i.toLong, null, s"m$i".getBytes))))
      } finally seed.close()
      srv.dropFetches.set(3)
      val session = new KafkaClient.Session(mk, backoffMs = 1L)
      try {
        val all = KafkaSource.pagedFetch(session, "t", 0, 0L, 20L,
          maxBytes = 1).toSeq
        assert(all.map(_.sequence) == (0L until 20L),
          "a TLS reconnect must deliver every offset exactly once")
      } finally session.close()
      assert(srv.dropFetches.get() == 0, "all injected drops were consumed")
    } finally srv.close()
  }

  test("refused produce replays without duplicates; fatal codes do not retry") {
    withBroker { (srv, seed) =>
      seed.metadata(Seq("t"))
      srv.failProduces.set(2) // NotLeaderForPartition: retriable, unappended
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port), backoffMs = 1L)
      try {
        val base = session.retrying("produce")(_.produce("t", 0,
          Seq((1L, null, "a".getBytes), (2L, null, "b".getBytes))))
        assert(base == 0L)
        assert(srv.logSize("t", 0) == 2L,
          "the refused attempts must not have appended anything")
        // fatal: UNSUPPORTED_VERSION is not in the retriable set — one
        // attempt, the typed server error surfaces through the session
        srv.failProduceCode = KafkaWire.Err.UnsupportedVersion
        srv.failProduces.set(1)
        val e = intercept[KafkaClient#KafkaServerErr] {
          session.retrying("produce")(_.produce("t", 0,
            Seq((3L, null, "c".getBytes))))
        }
        assert(e.code == KafkaWire.Err.UnsupportedVersion)
        assert(srv.logSize("t", 0) == 2L, "fatal refusal appended nothing")
      } finally session.close()
    }
  }
}
