package graft.redis

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Fault-path laws for the redis stack — the behaviors the reference
  * spells out: the consumer's reconnect loop
  * (sea-streamer-redis/src/consumer/node.rs:299-310) and the producer's
  * requeue-on-failure machinery (producer.rs:464-507). EmbeddedRedis's
  * fault taps inject each failure on demand; every law asserts BOTH the
  * recovery and the absence of duplicates / silent drops — the twin of
  * KafkaFaultSpec on the RESP side.
  */
class RedisFaultSpec extends AnyFunSuite {

  private def withServer[T](f: EmbeddedRedis => T): T = {
    val srv = new EmbeddedRedis
    try f(srv) finally srv.close()
  }

  private def seed(srv: EmbeddedRedis, key: String, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((0 until n).map(i =>
      RedisStreams.xadd(key, 1000L + i, s"m$i".getBytes(UTF_8))))
    finally c.close()
  }


  test("connect-time failure consumes the retry budget and surfaces typed") {
    // the reconnect loop must own ESTABLISHMENT too: a broker briefly down
    // between drop and reconnect throws from mkClient, which must retry on
    // the same budget and surface the same typed error as a mid-call drop
    val fails = new java.util.concurrent.atomic.AtomicInteger(2)
    val session = new RedisClient.Session(() =>
      if (fails.getAndDecrement() > 0)
        throw new java.io.IOException("connect refused")
      else null: RedisClient, backoffMs = 1L)
    try assert(session.retrying("op")(_ => 42) == 42,
      "connect failures within budget must retry through")
    finally session.close()
    val dead = new RedisClient.Session(() =>
      throw new java.io.IOException("refused"), maxRetries = 2, backoffMs = 1L)
    val e = intercept[graft.core.SeaStreamErr.Backend] {
      dead.retrying("op")(_ => ())
    }
    assert(e.getMessage.contains("retries exhausted"))
  }

  test("connection drop mid-scan: session resumes from its cursor, no duplicate rows") {
    withServer { srv =>
      seed(srv, "t:0", 20)
      // page size 1 → 20+ XRANGE round trips, so the drops land mid-scan
      srv.dropReads.set(3)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port), backoffMs = 1L)
      try {
        val all = RedisSource.pagedScan(session, "t:0", "t", 0L, batch = 1)
          .toSeq
        assert(all.size == 20, "a reconnect must deliver every entry")
        assert(all.map(m => new String(m.payload, UTF_8)) ==
          (0 until 20).map(i => s"m$i"),
          "cursor resume must be exactly-once and in order")
      } finally session.close()
      assert(srv.dropReads.get() == 0, "all injected drops were consumed")
    }
  }

  test("fault recovery holds over rediss: a dropped TLS connection " +
      "re-handshakes and resumes the scan cursor exactly-once") {
    // the Session's mkClient closure must carry the TLS config — a
    // reconnect that came back plaintext would be cut by the TLS
    // listener and read as data loss
    val (server, trust) = graft.core.TlsChannel.ephemeral
    val srv = new EmbeddedRedis(tls = Some(server))
    try {
      val w = new RedisClient(srv.host, srv.port,
        tls = Some(RedisClient.Tls(trust)))
      try w.pipeline((0 until 20).map(i =>
        RedisStreams.xadd("t:0", 1000L + i, s"m$i".getBytes(UTF_8))))
      finally w.close()
      srv.dropReads.set(3)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port,
          tls = Some(RedisClient.Tls(trust))), backoffMs = 1L)
      try {
        val all = RedisSource.pagedScan(session, "t:0", "t", 0L, batch = 1)
          .toSeq
        assert(all.map(m => new String(m.payload, UTF_8)) ==
          (0 until 20).map(i => s"m$i"),
          "TLS cursor resume must be exactly-once and in order")
      } finally session.close()
      assert(srv.dropReads.get() == 0, "all injected drops were consumed")
    } finally srv.close()
  }

  test("retries exhausted surfaces a typed backend error, not a hang") {
    withServer { srv =>
      seed(srv, "t:0", 1)
      srv.dropReads.set(1000)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port),
        maxRetries = 3, backoffMs = 1L)
      try {
        val e = intercept[graft.core.SeaStreamErr.Backend] {
          RedisSource.pagedScan(session, "t:0", "t", 0L, batch = 1).toSeq
        }
        assert(e.getMessage.contains("retries exhausted"))
      } finally session.close()
      srv.dropReads.set(0)
    }
  }

  test("drop mid-pipeline: writer resends only unapplied XADDs — no duplicates, no holes") {
    withServer { srv =>
      // the countdown tap drops the 4th XADD: 3 applied + acked, the 4th
      // refused-with-nothing-appended, the connection cut (earlier replies
      // flushed first). The writer must resend exactly entries 4..10.
      srv.dropXaddCountdown.set(4)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port), backoffMs = 1L)
      try {
        session.pipelineAcked((0 until 10).map(i =>
          RedisStreams.xadd("w:0", 2000L + i, s"a$i".getBytes(UTF_8))))
        // and again with the drop on the FIRST command of the batch
        srv.dropXaddCountdown.set(1)
        session.pipelineAcked((0 until 10).map(i =>
          RedisStreams.xadd("w:0", 3000L + i, s"b$i".getBytes(UTF_8))))
      } finally session.close()
      val payloads = srv.entries("w:0").flatMap(_._2).collect {
        case ("msg", v) => new String(v, UTF_8)
      }
      assert(payloads == (0 until 10).map(i => s"a$i") ++
        (0 until 10).map(i => s"b$i"),
        "every entry appended exactly once, in send order")
      assert(srv.dropXaddCountdown.get() == 0)
    }
  }

  test("transient error reply retries in place; fatal reply surfaces without retry") {
    withServer { srv =>
      // TRYAGAIN on the FIRST command only: y is processed in the same
      // pipeline pass, so a blind tail-resend would append y twice — the
      // law is that only the refused command is requeued. x and y target
      // DIFFERENT keys: real redis refuses a `<ms>-*` below a key's tip
      // (the embedded server now does too), so the requeue of an
      // earlier-ms command behind an applied later-ms one is only legal
      // across keys — which is also the only place the selective-requeue
      // law arises for a per-key-monotone producer
      srv.failXadds.set(1)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port), backoffMs = 1L)
      try {
        session.pipelineAcked(Seq(
          RedisStreams.xadd("f:0", 1L, "x".getBytes(UTF_8)),
          RedisStreams.xadd("f:1", 2L, "y".getBytes(UTF_8))))
        assert(srv.entries("f:0").size == 1 && srv.entries("f:1").size == 1,
          "refused attempts must not have appended anything extra")
        // fatal: a non-retriable reply is one attempt, typed, no append
        srv.failXaddError = "WRONGTYPE Operation against a key holding the wrong kind of value"
        srv.failXadds.set(1)
        val e = intercept[RedisClient.FatalReply] {
          session.pipelineAcked(Seq(
            RedisStreams.xadd("f:0", 3L, "z".getBytes(UTF_8))))
        }
        assert(e.getMessage.startsWith("WRONGTYPE"))
        assert(srv.entries("f:0").size == 1, "fatal refusal appended nothing")
        assert(srv.failXadds.get() == 0,
          "exactly one fatal reply served — no retry consumed more")
      } finally session.close()
    }
  }

  test("session reused after a fatal mid-batch reply stays ack-exact") {
    withServer { srv =>
      // Fatal on the FIRST command of a 3-batch: y and z are processed in
      // the same pipeline pass, so their replies are queued behind the fatal
      // one. A session that kept the connection would read THOSE as the next
      // batch's acks — here the next batch's first command is transiently
      // refused, and a desynced session would attribute y's leftover id
      // reply to it, never requeue it, and leave a hole. The law: after
      // FatalReply the connection is dropped, so the reused session stays
      // reply-aligned and the follow-up batch is exactly-once.
      srv.failXaddError = "WRONGTYPE Operation against a key holding the wrong kind of value"
      srv.failXadds.set(1)
      val session = new RedisClient.Session(
        () => new RedisClient(srv.host, srv.port), backoffMs = 1L)
      try {
        intercept[RedisClient.FatalReply] {
          session.pipelineAcked(Seq(
            RedisStreams.xadd("g:0", 1L, "x".getBytes(UTF_8)),
            RedisStreams.xadd("g:0", 2L, "y".getBytes(UTF_8)),
            RedisStreams.xadd("g:0", 3L, "z".getBytes(UTF_8))))
        }
        // reuse the SAME session: transient refusal on the next batch's
        // first command must be seen as such (not masked by stale
        // replies). d and e target different keys — the requeue of an
        // earlier-ms command behind an applied later-ms one is only
        // id-legal across keys (real redis's monotonicity refusal,
        // which the embedded server now shares)
        srv.failXaddError = "TRYAGAIN Multiple keys request during rehashing of slot"
        srv.failXadds.set(1)
        session.pipelineAcked(Seq(
          RedisStreams.xadd("g:0", 4L, "d".getBytes(UTF_8)),
          RedisStreams.xadd("g:1", 5L, "e".getBytes(UTF_8))))
      } finally session.close()
      val payloads = (srv.entries("g:0") ++ srv.entries("g:1"))
        .flatMap(_._2).collect {
          case ("msg", v) => new String(v, UTF_8)
        }
      assert(payloads.sorted == Seq("d", "e", "y", "z"),
        "x fatally refused (nothing appended); y/z applied pre-fatal; " +
          "d requeued after its transient refusal; e applied — each once")
      assert(srv.failXadds.get() == 0)
    }
  }

  test("boundedRead end-to-end survives injected drops (executor-path law)") {
    withServer { srv =>
      seed(srv, "e:0", 50)
      seed(srv, "e:1", 50)
      srv.dropReads.set(2)
      val spark = graft.TestSession.spark
      val df = RedisSource.boundedRead(spark, srv.host, srv.port,
        Seq(("e", 0L), ("e", 1L)), batch = 7)
      assert(df.count() == 100L,
        "the Spark scan must self-heal through connection drops")
      assert(srv.dropReads.get() == 0)
    }
  }

  test("countdown tap fires exactly once under concurrent connections") {
    // multi-partition Spark writes open one socket per task, each handled
    // on its own server thread — the Nth-command drop must fire exactly
    // once no matter how those threads interleave on the tap. A get()>0
    // && decrementAndGet()==0 pair can fire on the wrong command or never
    // (two threads both pass the get, both decrement, neither sees 0), so
    // the tap is one atomic getAndUpdate firing on pre-decrement == 1.
    withServer { srv =>
      val tap = new java.util.concurrent.atomic.AtomicInteger(64)
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      try {
        val tasks = (1 to 16).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit =
              (1 to 32).foreach { _ =>
                if (srv.takeCountdown(tap)) fired.incrementAndGet()
              }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      assert(fired.get() == 1,
        s"the 64th concurrent command must trip the tap exactly once " +
          s"(fired ${fired.get()} times)")
      assert(tap.get() == 0, "the spent tap must stay at zero")
    }
  }
}
