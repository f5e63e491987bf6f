package graft.redis

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class RespSpec extends AnyFunSuite {

  test("command encoding matches the RESP wire format byte-for-byte") {
    val wire = new String(Resp.encodeCommandS("XADD", "k", "1000-*", "msg", "hi"), UTF_8)
    assert(wire ==
      "*5\r\n$4\r\nXADD\r\n$1\r\nk\r\n$6\r\n1000-*\r\n$3\r\nmsg\r\n$2\r\nhi\r\n")
  }

  test("reply parsing covers every RESP2 type including nesting") {
    def parse(s: String) = Resp.parse(new ByteArrayInputStream(s.getBytes(UTF_8)))
    assert(parse("+OK\r\n") == Resp.Simple("OK"))
    assert(parse("-ERR boom\r\n") == Resp.Err("ERR boom"))
    assert(parse(":42\r\n") == Resp.Num(42))
    assert(parse("$5\r\nhello\r\n").asInstanceOf[Resp.Bulk].utf8 == "hello")
    assert(parse("$-1\r\n") == Resp.NullBulk)
    assert(parse("*-1\r\n") == Resp.NullArr)
    val nested = parse("*2\r\n:1\r\n*2\r\n+a\r\n$1\r\nb\r\n")
    assert(nested.asInstanceOf[Resp.Arr].items.head == Resp.Num(1))
  }

  test("value encode/parse roundtrips") {
    val v = Resp.Arr(Seq(Resp.Bulk("1000-0".getBytes(UTF_8)),
      Resp.Arr(Seq(Resp.Bulk("msg".getBytes(UTF_8)), Resp.NullBulk))))
    val back = Resp.parse(new ByteArrayInputStream(Resp.encodeValue(v)))
    assert(back.asInstanceOf[Resp.Arr].items.size == 2)
  }
}

class RedisStreamsSpec extends AnyFunSuite {

  test("command builders produce the reference's exact argument shapes") {
    def render(cmd: Seq[Array[Byte]]) = cmd.map(new String(_, UTF_8))
    assert(render(RedisStreams.xread(Seq("a:0" -> "$", "b:1" -> "0-0"),
      count = Some(10))) ==
      Seq("XREAD", "COUNT", "10", "STREAMS", "a:0", "b:1", "$", "0-0"))
    assert(render(RedisStreams.xreadGroup("g", "c", Seq("k" -> ">"))) ==
      Seq("XREADGROUP", "GROUP", "g", "c", "STREAMS", "k", ">"))
    assert(render(RedisStreams.xgroupCreate("k", "g")) ==
      Seq("XGROUP", "CREATE", "k", "g", "0", "MKSTREAM"))
    assert(render(RedisStreams.xtrimMaxLen("k", 1000)) ==
      Seq("XTRIM", "k", "MAXLEN", "~", "1000"))
    assert(render(RedisStreams.xautoclaim("k", "g", "c", 5000)) ==
      Seq("XAUTOCLAIM", "k", "g", "c", "5000", "0-0"))
  }

  test("entry id packing matches the (ms << 16) | sub_seq law") {
    assert(RedisStreams.packSeqNo(1000L, 3L) == ((1000L << 16) | 3L))
    assert(RedisStreams.parseEntryId("1700000000123-7") == (1700000000123L, 7L))
    // sub_seq saturates at 16 bits
    assert((RedisStreams.packSeqNo(1L, 0x1FFFFL) & 0xFFFFL) == 0xFFFFL)
  }

  test("sharded key naming follows `name:shard`") {
    assert(RedisStreams.shardedKey("events", 3, sharded = true) == "events:3")
    assert(RedisStreams.shardedKey("events", 3, sharded = false) == "events")
  }

  test("offset json roundtrips sharded keys (colons in key names)") {
    import graft.redis.spark.RedisOffset
    val off = RedisOffset(Map(
      "events:3" -> "1700000000000-12",
      "events:11" -> "0-0",
      "bare" -> "5-1"))
    assert(RedisOffset.fromJson(off.json()) == off)
    assert(RedisOffset.fromJson(RedisOffset(Map.empty).json()) ==
      RedisOffset(Map.empty))
  }

  test("hostPort handles ports, bare hosts, IPv6 and trailing colons") {
    import graft.facade.SeaStreamer.hostPort
    assert(hostPort("localhost:6380", 6379) == ("localhost", 6380))
    assert(hostPort("localhost", 6379) == ("localhost", 6379))
    assert(hostPort("::1", 6379) == ("::1", 6379))
    assert(hostPort("[::1]:6380", 6379) == ("::1", 6380))
    assert(hostPort("[fe80::2]", 6379) == ("fe80::2", 6379))
    assert(hostPort("host:", 6379) == ("host", 6379))
  }
}

/** Client + Spark integration against the in-process RESP server — real
  * sockets, executor-side connections.
  */
class RedisClientSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("pipelined XADD then XRANGE roundtrips messages with packed seqnos") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try {
        val replies = c.pipeline((0 until 5).map(i =>
          RedisStreams.xadd("s:0", 1000L + i, s"m$i".getBytes(UTF_8))))
        assert(replies.size == 5)
        val msgs = RedisStreams.decodeEntries(
          c.command(RedisStreams.xrange("s:0"): _*), "s", 0L)
        assert(msgs.map(m => new String(m.payload, UTF_8)) ==
          (0 until 5).map(i => s"m$i"))
        assert(msgs.map(_.sequence) ==
          (0 until 5).map(i => (1000L + i) << 16))
        assert(msgs.map(_.timestamp.getTime) == (0 until 5).map(1000L + _))
      } finally c.close()
    } finally srv.close()
  }

  test("same-millisecond entries get increasing sub-sequences") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try {
        c.pipeline((0 until 3).map(_ =>
          RedisStreams.xadd("t:0", 500L, "x".getBytes(UTF_8))))
        val msgs = RedisStreams.decodeEntries(
          c.command(RedisStreams.xrange("t:0"): _*), "t", 0L)
        assert(msgs.map(_.sequence & 0xFFFFL) == Seq(0L, 1L, 2L))
      } finally c.close()
    } finally srv.close()
  }

  test("pagination survives >64k entries in one millisecond (raw-id cursor)") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try {
        val n = 66000 // sub-seq overflows 16 bits at 65536
        c.pipeline((0 until n).map(_ =>
          RedisStreams.xadd("big:0", 777L, "x".getBytes(UTF_8))))
        // paged scan with a small page MUST terminate and see every entry
        val session = new RedisClient.Session(
          () => new RedisClient(srv.host, srv.port))
        try {
          val scan = RedisSource.pagedScan(session, "big:0", "big", 0L,
            batch = 4096)
          assert(scan.size == n)
        } finally session.close()
      } finally c.close()
    } finally srv.close()
  }

  test("errors surface as RedisError") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try intercept[RedisClient.RedisError] { c.commandS("NOPE") }
      finally c.close()
    } finally srv.close()
  }

  test("facade: redis:// producer and bounded consumer roundtrip") {
    import spark.implicits._
    import graft.facade.SeaStreamer
    import graft.facade.SeaStreamer.ConsumerOptions
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val env = (0 until 30).map { i =>
        ("clicks", 0L, 0L, new java.sql.Timestamp(5000L + i),
          s"c$i".getBytes(UTF_8))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env)

      val back = conn.createConsumer(Seq("clicks"),
        ConsumerOptions(live = false))
      assert(back.count() == 30)
      assert(back.select($"payload".cast("string")).as[String]
        .collect().toSet == (0 until 30).map(i => s"c$i").toSet)
    } finally srv.close()
  }

  test("live micro-batch consumer tails new XADDs incrementally") {
    import spark.implicits._
    import graft.facade.SeaStreamer
    import graft.facade.SeaStreamer.ConsumerOptions
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      def env(from: Int, n: Int) = (from until from + n).map { i =>
        ("live", 0L, 0L, new java.sql.Timestamp(9000L + i),
          s"v$i".getBytes(UTF_8))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env(0, 20))

      val q = conn.createConsumer(Seq("live"), ConsumerOptions(live = true,
        autoStreamReset = SeaStreamer.AutoStreamReset.Earliest))
        .writeStream.outputMode("append").format("memory")
        .queryName("redis_live_test").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_live_test").count() == 20)
        // appended entries arrive in the next micro-batch, exactly once
        conn.createGenericProducer().send(env(20, 10))
        q.processAllAvailable()
        val got = spark.table("redis_live_test")
          .select($"payload".cast("string")).as[String].collect().toSet
        assert(got == (0 until 30).map(i => s"v$i").toSet)
        // seqnos carry the redis (ms<<16)|sub packing
        val seqs = spark.table("redis_live_test")
          .select("sequence").as[Long].collect()
        assert(seqs.forall(s => (s >> 16) >= 9000L))
      } finally q.stop()
    } finally srv.close()
  }

  test("spark roundtrip: pipelined writes, one scan task per shard") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      val df = (0 until 200).map { i =>
        ("events", (i % 4).toLong, i.toLong,
          new java.sql.Timestamp(10000L + i), s"p$i".getBytes(UTF_8))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      RedisSource.write(df, srv.host, srv.port, pipelineSize = 16)

      val back = RedisSource.boundedRead(spark, srv.host, srv.port,
        (0L until 4L).map(sh => ("events", sh)), batch = 32)
      assert(back.count() == 200)
      val payloads = back.select($"payload".cast("string")).as[String]
        .collect().toSet
      assert(payloads == (0 until 200).map(i => s"p$i").toSet)
      // per-shard ordering by redis id (ms ascending)
      val shard0 = back.filter($"shard_id" === 0L)
        .orderBy("sequence").select($"payload".cast("string")).as[String]
        .collect().toSeq
      assert(shard0 == (0 until 200 by 4).map(i => s"p$i"))
      // group bookkeeping: create + ack through the same wire
      val c = new RedisClient(srv.host, srv.port)
      try {
        c.command(RedisStreams.xgroupCreate("events:0", "g1"): _*)
        val n = c.command(RedisStreams.xack("events:0", "g1",
          Seq("10000-0", "10004-0")): _*)
        assert(n == Resp.Num(2))
        assert(srv.ackedIds("events:0", "g1") == Set("10000-0", "10004-0"))
      } finally c.close()
    } finally srv.close()
  }

  test("latest multi-stream: a quiet stream's post-anchor messages are " +
    "never lost to a busy sibling (realtime-multi law)") {
    // The reference regression (sea-streamer-redis/tests/realtime-multi.rs):
    // a shard that had never delivered kept re-anchoring `$` on every XREAD,
    // so a quiet stream's messages fell between a busy sibling's reads. The
    // micro-batch source pins every key's anchor ONCE at initialOffset and
    // each batch reads (anchor_then, tip_now] per key, so the failure mode
    // must be structurally impossible — this test holds that door shut.
    import spark.implicits._
    import graft.facade.SeaStreamer
    import graft.facade.SeaStreamer.ConsumerOptions
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      def env(key: String, from: Int, n: Int) =
        (from until from + n).map { i =>
          (key, 0L, 0L, new java.sql.Timestamp(9000L + i),
            s"$key$i".getBytes(UTF_8))
        }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      // pre-anchor backlog on the busy stream only; `slow` has never
      // delivered anything when the consumer anchors
      conn.createGenericProducer().send(env("fast", 0, 20))
      val q = conn.createConsumer(Seq("fast", "slow"), ConsumerOptions(
        live = true, autoStreamReset = SeaStreamer.AutoStreamReset.Latest))
        .writeStream.outputMode("append").format("memory")
        .queryName("redis_multi_test").start()
      try {
        q.processAllAvailable() // anchor: must skip the fast backlog
        assert(spark.table("redis_multi_test").count() == 0)
        // busy stream keeps delivering across several batches...
        conn.createGenericProducer().send(env("fast", 20, 5))
        q.processAllAvailable()
        // ...and only then does the quiet stream speak, while fast stays busy
        conn.createGenericProducer().send(env("slow", 0, 3))
        conn.createGenericProducer().send(env("fast", 25, 5))
        q.processAllAvailable()
        val got = spark.table("redis_multi_test")
          .select($"payload".cast("string")).as[String].collect().toSet
        val want = (20 until 30).map(i => s"fast$i").toSet ++
          (0 until 3).map(i => s"slow$i").toSet
        assert(got == want, "quiet-stream messages were lost or backlog leaked")
      } finally q.stop()
    } finally srv.close()
  }

  test("EVERY stream command on a string-squatted key replies WRONGTYPE " +
      "like real redis — no empty range, no silently-created group, no " +
      "served read (round-18 family-wide type fidelity)") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    try {
      rc.command(RedisStreams.set("sq", "string-value"): _*)
      def raw(parts: String*): Seq[Array[Byte]] =
        parts.map(_.getBytes("UTF-8"))
      val family: Seq[Seq[Array[Byte]]] = Seq(
        RedisStreams.xrange("sq"),
        RedisStreams.xrevrangeTip("sq"),
        RedisStreams.xadd("sq", 1L, "x".getBytes("UTF-8")),
        RedisStreams.xack("sq", "g", Seq("1-1")),
        raw("XREADGROUP", "GROUP", "g", "c", "COUNT", "1",
          "STREAMS", "sq", ">"),
        raw("XREAD", "COUNT", "1", "STREAMS", "sq", "0-0"),
        raw("XGROUP", "CREATE", "sq", "g", "0"),
        raw("XAUTOCLAIM", "sq", "g", "c", "0", "0-0"),
        raw("XTRIM", "sq", "MAXLEN", "1"),
        raw("XDEL", "sq", "1-1"),
        raw("XLEN", "sq"))
      val replies = rc.pipelineRaw(family)
      family.zip(replies).foreach { case (cmd, reply) =>
        val cname = new String(cmd.head, "UTF-8")
        reply match {
          case Resp.Err(m) =>
            assert(m.startsWith("WRONGTYPE"), s"$cname: $m")
          case other => fail(s"$cname served a squatted key: $other")
        }
      }
      // and the squat is not corrupted: the string still reads back
      assert(rc.command(RedisStreams.get("sq"): _*) match {
        case Resp.Bulk(bs) => new String(bs, "UTF-8") == "string-value"
        case _ => false
      })
      // multi-stream reads refuse when ANY listed key is squatted, not
      // just the first (real redis type-checks every key) — a healthy
      // stream ahead of the squat must not mask it
      rc.command(RedisStreams.xadd("ok", 1L, "x".getBytes("UTF-8")): _*)
      val multi: Seq[Seq[Array[Byte]]] = Seq(
        RedisStreams.xread(Seq("ok" -> "0-0", "sq" -> "0-0")),
        raw("XREADGROUP", "GROUP", "g", "c",
          "STREAMS", "ok", "sq", ">", ">"))
      rc.pipelineRaw(multi).foreach {
        case Resp.Err(m) => assert(m.startsWith("WRONGTYPE"), m)
        case other => fail(s"multi-stream read served a squat: $other")
      }
    } finally { rc.close(); srv.close() }
  }

  test("producer clampToTip: a re-send at-or-below the stream tip lands " +
      "as a duplicate at the tip instead of crash-looping on the " +
      "'equal or smaller' refusal; the default producer stays loud") {
    import spark.implicits._
    import graft.facade.SeaStreamer
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      def env(ms: Long, v: String) = Seq(
        ("tipc", 0L, 0L, new java.sql.Timestamp(ms), v.getBytes(UTF_8)))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createProducer("tipc").send(env(5000L, "first"))
      // default: a BELOW-tip send surfaces the server's refusal loudly
      val loud = intercept[Exception](
        conn.createProducer("tipc").send(env(4000L, "late-loud")))
      val chain = Iterator.iterate(loud: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.toString).mkString(" | ")
      assert(chain.contains("equal or smaller"), chain)
      // clamped: the same send floors at the tip and LANDS
      conn.createProducer("tipc", redisClampToTip = true)
        .send(env(4000L, "late-clamped"))
      val entries = srv.entries("tipc")
      val vals = entries.map(e => new String(e._2.head._2, UTF_8))
      assert(vals == Seq("first", "late-clamped"), vals.toString)
      // the clamped id sits AT the tip ms (5000), sequence advanced
      assert(entries.last._1.startsWith("5000-"), entries.last._1)
    } finally srv.close()
  }

  test("clampToTip survives a CONCURRENT writer advancing the tip " +
      "between probe and send: the fatal refusal re-probes, re-clamps " +
      "and resends — at-least-once, never a crash loop") {
    import spark.implicits._
    import graft.facade.SeaStreamer
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      conn.createProducer("race").send(Seq(
        ("race", 0L, 0L, new java.sql.Timestamp(7000L), "tip".getBytes(UTF_8)))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload"))
      // the rival's tip advance, deterministically: the NEXT XADD is
      // refused with the server's verbatim non-monotone error even
      // though our probe said 7000 was safe
      srv.failXaddError = EmbeddedRedis.XaddSmallerErr
      srv.failXadds.set(1)
      conn.createProducer("race", redisClampToTip = true).send(
        (0 until 3).map(i => ("race", 0L, 0L,
          new java.sql.Timestamp(7100L + i), s"r$i".getBytes(UTF_8)))
          .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload"))
      val vals = srv.entries("race").map(e => new String(e._2.head._2, UTF_8))
      // every value landed at least once (the refused chunk's applied
      // tail may duplicate on the resend — the documented trade)
      assert(Set("r0", "r1", "r2").subsetOf(vals.toSet), vals.toString)
      assert(srv.failXadds.get() == 0, "the injected refusal never fired")
    } finally srv.close()
  }

  test("clampToTip converges on a TRIMMED-EMPTY stream: last_id outlives " +
      "XTRIM, a tip probe sees nothing, but the XINFO last-generated-id " +
      "probe finds the real refusal bar") {
    import spark.implicits._
    import graft.facade.SeaStreamer
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      def env(ms: Long, v: String) = Seq(
        ("trm", 0L, 0L, new java.sql.Timestamp(ms), v.getBytes(UTF_8)))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createProducer("trm").send(env(9000L, "old"))
      // trim to EMPTY: the visible tip is gone, last_id (9000-0) is not
      rc.command(RedisStreams.xtrimMaxLen("trm", 0): _*)
      assert(srv.entries("trm").isEmpty)
      // a below-bar re-send through the clamped producer LANDS (at the
      // surviving bar), where an XREVRANGE-probed clamp would refuse
      // forever
      conn.createProducer("trm", redisClampToTip = true)
        .send(env(8000L, "late"))
      val entries = srv.entries("trm")
      assert(entries.map(e => new String(e._2.head._2, UTF_8)) ==
        Seq("late"), entries.toString)
      assert(entries.head._1.startsWith("9000-"), entries.head._1)
    } finally { rc.close(); srv.close() }
  }
}
