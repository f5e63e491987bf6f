package graft.redis

import org.scalatest.funsuite.AnyFunSuite

/** Laws of the exactly-once Spark→redis sink — k8's contract rebuilt on
  * the primitive redis actually has (MULTI/EXEC): per-(epoch, slot)
  * atomicity of entries + ledger watermark, idempotent replay, and the
  * crash window (a MULTI queued but never EXECed applies NOTHING — the
  * connection takes its queue with it, real redis's contract).
  */
class RedisEosSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSession.spark

  private def envelope(rows: Seq[(String, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (k, sh, ts, v) =>
      (k, sh, new java.sql.Timestamp(ts), v.getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "timestamp", "payload")
  }

  private def values(srv: EmbeddedRedis, stream: String): Seq[String] =
    (0L until 4L).flatMap(sh =>
      srv.entries(RedisStreams.shardedKey(stream, sh, sharded = true))
        .flatMap(_._2.collectFirst {
          case (f, bs) if f == RedisStreams.DefaultMessageField =>
            new String(bs, "UTF-8")
        }))

  test("embedded MULTI/EXEC grammar: queued replies, atomic apply, " +
      "DISCARD drops, nesting and bare EXEC refuse, a dropped connection " +
      "takes its queue with it") {
    val srv = new EmbeddedRedis
    val c = new RedisClient(srv.host, srv.port)
    try {
      // error replies surface as typed RedisError (the client's law)
      assert(intercept[RedisClient.RedisError](
        c.command(RedisStreams.exec: _*)).msg.contains("EXEC without MULTI"))
      assert(c.command(RedisStreams.multi: _*) == Resp.Simple("OK"))
      assert(intercept[RedisClient.RedisError](
        c.command(RedisStreams.multi: _*)).msg.contains("can not be nested"))
      assert(c.command(RedisStreams.xadd("t:0", 1L, "a".getBytes): _*) ==
        Resp.Simple("QUEUED"))
      assert(c.command(RedisStreams.set("lk", "1"): _*) ==
        Resp.Simple("QUEUED"))
      // nothing applied while queued
      assert(srv.entries("t:0").isEmpty && srv.kvGet("lk").isEmpty)
      c.command(RedisStreams.exec: _*) match {
        case Resp.Arr(rs) => assert(rs.length == 2, s"got $rs")
        case other => fail(s"EXEC reply: $other")
      }
      assert(srv.entries("t:0").length == 1)
      assert(srv.kvGet("lk").map(new String(_, "UTF-8")).contains("1"))
      // DISCARD drops the queue
      c.command(RedisStreams.multi: _*)
      c.command(RedisStreams.xadd("t:0", 2L, "b".getBytes): _*)
      assert(c.command(RedisStreams.discard: _*) == Resp.Simple("OK"))
      assert(srv.entries("t:0").length == 1, "DISCARD leaked an entry")
      // a connection that dies mid-MULTI applies nothing
      val dying = new RedisClient(srv.host, srv.port)
      dying.command(RedisStreams.multi: _*)
      dying.command(RedisStreams.xadd("t:0", 3L, "c".getBytes): _*)
      dying.close()
      Thread.sleep(50)
      assert(srv.entries("t:0").length == 1,
        "a dropped connection's MULTI queue leaked")
    } finally { c.close(); srv.close() }
  }

  test("writeExactlyOnce: entries + watermark commit atomically, a " +
      "replayed epoch skips, the next epoch appends") {
    val srv = new EmbeddedRedis
    try {
      val e0 = envelope(Seq(("t", 0L, 1L, "a"), ("t", 1L, 2L, "b"),
        ("t", 2L, 3L, "c")))
      RedisSource.writeExactlyOnce(e0, srv.host, srv.port, "eos", 0L)
      assert(values(srv, "t").sorted == Seq("a", "b", "c"))
      RedisSource.writeExactlyOnce(e0, srv.host, srv.port, "eos", 0L)
      assert(values(srv, "t").sorted == Seq("a", "b", "c"),
        "a replayed committed epoch duplicated entries")
      RedisSource.writeExactlyOnce(envelope(Seq(("t", 3L, 4L, "d"))),
        srv.host, srv.port, "eos", 1L)
      assert(values(srv, "t").sorted == Seq("a", "b", "c", "d"))
      // watermarks sit past the committed epochs on every touched slot
      val marks = (0 until 8).flatMap(sl =>
        srv.kvGet(s"eos:slot:$sl").map(new String(_, "UTF-8").toLong))
      assert(marks.nonEmpty && marks.forall(w => w == 1L || w == 2L),
        s"unexpected ledger state: $marks")
    } finally srv.close()
  }

  test("crash before EXEC applies NOTHING — no entries, watermark " +
      "unmoved; the epoch replay lands exactly one copy") {
    val srv = new EmbeddedRedis
    try {
      val rows = envelope(Seq(("t", 0L, 1L, "x"), ("t", 1L, 2L, "y"),
        ("t", 2L, 3L, "z"), ("t", 3L, 4L, "w")))
      graft.ops.Failpoints.arm("redis-spec-crash")
      val thrown = intercept[Exception] {
        RedisSource.writeExactlyOnce(rows, srv.host, srv.port, "eos2", 0L,
          crashBeforeCommit = Some("redis-spec-crash"))
      }
      assert(Iterator.iterate(thrown: Throwable)(_.getCause)
        .takeWhile(_ != null).take(8)
        .exists(t => String.valueOf(t.getMessage).contains("injected crash")),
        s"wrong failure: $thrown")
      // the crashed slot queued but never EXECed: its rows and watermark
      // are nowhere (other slots may have committed — fine)
      val mid = values(srv, "t")
      assert(mid.distinct == mid, s"duplicates before replay: $mid")
      RedisSource.writeExactlyOnce(rows, srv.host, srv.port, "eos2", 0L)
      assert(values(srv, "t").sorted == Seq("w", "x", "y", "z"),
        "replay after a queued-not-EXECed crash broke exactly-once")
    } finally srv.close()
  }
}
