package graft.iggy

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import IggyWire.{Partitioning, PollStrategy}

/** Fault-path laws for the iggy stack — the third backend to get the
  * KafkaFaultSpec / RedisFaultSpec treatment. Offsets are dense and the
  * poll cursor is an explicit AtOffset, so reconnect-resume is
  * exactly-once by construction; the laws pin that, plus typed
  * exhaustion and refused-send replay.
  */
class IggyFaultSpec extends AnyFunSuite {

  private def withBroker[T](f: (EmbeddedIggy, IggyClient) => T): T = {
    val srv = new EmbeddedIggy
    val c = new IggyClient(srv.host, srv.port)
    try f(srv, c) finally { c.close(); srv.close() }
  }

  private def seed(c: IggyClient, topic: String, n: Int): Unit = {
    c.createStreamIfAbsent("s")
    c.createTopicIfAbsent("s", topic, 1)
    (0 until n).foreach(i => c.sendMessages("s", topic,
      Partitioning.PartitionId(0), Seq((1000L + i, s"m$i".getBytes(UTF_8)))))
  }


  test("connect-time failure consumes the retry budget and surfaces typed") {
    // the reconnect loop must own ESTABLISHMENT too: a broker briefly down
    // between drop and reconnect throws from mkClient, which must retry on
    // the same budget and surface the same typed error as a mid-call drop
    val fails = new java.util.concurrent.atomic.AtomicInteger(2)
    val session = new IggyClient.Session(() =>
      if (fails.getAndDecrement() > 0)
        throw new java.io.IOException("connect refused")
      else null: IggyClient, backoffMs = 1L)
    try assert(session.retrying("op")(_ => 42) == 42,
      "connect failures within budget must retry through")
    finally session.close()
    val dead = new IggyClient.Session(() =>
      throw new java.io.IOException("refused"), maxRetries = 2, backoffMs = 1L)
    val e = intercept[graft.core.SeaStreamErr.Backend] {
      dead.retrying("op")(_ => ())
    }
    assert(e.getMessage.contains("retries exhausted"))
  }

  test("connection drop mid-poll: session resumes at its offset, no duplicate rows") {
    withBroker { (srv, seeder) =>
      seed(seeder, "t", 20)
      // page size 1 → 20+ polls; drops land mid-scan, the session must
      // re-login and re-poll the SAME offset
      srv.dropPolls.set(3)
      val session = new IggyClient.Session(
        () => new IggyClient(srv.host, srv.port), backoffMs = 1L)
      try {
        val all = IggySource.pagedPoll(session, "s", "t", 0,
          PollStrategy.First, batch = 1).toSeq
        assert(all.map(_.sequence) == (0L until 20L),
          "a reconnect must deliver every offset exactly once")
      } finally session.close()
      assert(srv.dropPolls.get() == 0, "all injected drops were consumed")
    }
  }

  test("a corrupted polled payload is caught by its CRC and re-fetched clean") {
    // end-to-end law for the polled-message checksum on the EXPLICIT-cursor
    // path (AtOffset/First — what the Spark source and every pagedPoll page
    // past the first use): the broker flips one payload bit AFTER computing
    // the CRC (wire bit-rot), the decode throws, the session reconnects,
    // and the SAME offset is re-fetched — every message delivered exactly
    // once with intact bytes, the reader never sees the corruption.
    // (A group-Next poll with autoCommit does NOT get this law: the server
    // committed before the reply corrupted — the documented at-most-once
    // edge of commit-on-poll, pagedPoll's scaladoc.)
    withBroker { (srv, seeder) =>
      seed(seeder, "t", 20)
      srv.corruptPollCountdown.set(3) // the 3rd poll arrives corrupted
      val session = new IggyClient.Session(
        () => new IggyClient(srv.host, srv.port), backoffMs = 1L)
      try {
        val all = IggySource.pagedPoll(session, "s", "t", 0,
          PollStrategy.First, batch = 1).toSeq
        assert(all.map(_.sequence) == (0L until 20L),
          "the retry must deliver every offset exactly once")
        assert(all.map(m => new String(m.payload, UTF_8)) ==
          (0 until 20).map(i => s"m$i"),
          "every payload must arrive with intact bytes")
      } finally session.close()
      assert(srv.corruptPollCountdown.get() == 0,
        "the injected corruption was consumed")
    }
  }

  test("retries exhausted surfaces a typed backend error, not a hang") {
    withBroker { (srv, seeder) =>
      seed(seeder, "t", 1)
      srv.dropPolls.set(1000)
      val session = new IggyClient.Session(
        () => new IggyClient(srv.host, srv.port),
        maxRetries = 3, backoffMs = 1L)
      try {
        val e = intercept[graft.core.SeaStreamErr.Backend] {
          IggySource.pagedPoll(session, "s", "t", 0,
            PollStrategy.First, batch = 1).toSeq
        }
        assert(e.getMessage.contains("retries exhausted"))
      } finally session.close()
      srv.dropPolls.set(0)
    }
  }

  test("dropped send replays its own request only — no duplicates, no holes") {
    withBroker { (srv, seeder) =>
      seeder.createStreamIfAbsent("s")
      seeder.createTopicIfAbsent("s", "w", 1)
      // the countdown tap cuts the 3rd send BEFORE anything is appended:
      // sends 1-2 are acked, send 3 retries itself, 4-5 proceed
      srv.dropSendCountdown.set(3)
      val session = new IggyClient.Session(
        () => new IggyClient(srv.host, srv.port), backoffMs = 1L)
      try {
        (0 until 5).foreach(i => session.retrying("send")(_.sendMessages(
          "s", "w", Partitioning.PartitionId(0),
          Seq((2000L + i, s"b$i".getBytes(UTF_8))))))
      } finally session.close()
      val payloads = srv.messages("s", "w", 0).map(m => new String(m._2, UTF_8))
      assert(payloads == (0 until 5).map(i => s"b$i"),
        "every send applied exactly once, in order")
      assert(srv.dropSendCountdown.get() == 0)
    }
  }

  test("boundedRead end-to-end survives injected drops (executor-path law)") {
    withBroker { (srv, seeder) =>
      seed(seeder, "e", 60)
      srv.dropPolls.set(2)
      val spark = graft.TestSession.spark
      val df = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("e"), stream = "s", batch = 7)
      assert(df.count() == 60L,
        "the Spark scan must self-heal through connection drops")
      assert(srv.dropPolls.get() == 0)
    }
  }

  test("countdown tap fires exactly once under concurrent connections") {
    // the twin of RedisFaultSpec's law: iggy's Nth-send drop must trip
    // exactly once however the per-socket server threads interleave —
    // one atomic getAndUpdate firing on pre-decrement == 1, never a
    // non-atomic get/decrement pair
    val srv = new EmbeddedIggy
    try {
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
    } finally srv.close()
  }
}
