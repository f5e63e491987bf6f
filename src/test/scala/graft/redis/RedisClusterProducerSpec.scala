package graft.redis

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.TestSession
import graft.facade.SeaStreamer
import graft.facade.SeaStreamer.ConsumerOptions
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-aware producer path: a multi-node `redis://` URI routes every
  * key's pipelined XADDs to its slot owner (CLUSTER SLOTS bootstrap), MOVED
  * bounces replay against the new owner, and the multi-node consumer reads
  * each key back from the node that owns it — the reference producer's
  * redirect loop (producer.rs:428-507) and cluster consumer end-to-end.
  */
class RedisClusterProducerSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Two streams whose bare keys hash to different halves of the slot
    * space get a two-node topology splitting at the midpoint between them.
    */
  private def twoNodeTopology(): (EmbeddedRedis, EmbeddedRedis, String, String) = {
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    // find two stream names owned by different nodes under a fixed split
    val mid = RedisCluster.HashSlots / 2
    val names = (0 until 1000).map(i => s"st$i")
    val lo = names.find(n => RedisCluster.hashSlot(n) < mid).get
    val hi = names.find(n => RedisCluster.hashSlot(n) >= mid).get
    val slots = Seq((0, mid - 1, a.host, a.port),
      (mid, RedisCluster.HashSlots - 1, b.host, b.port))
    a.slots = slots
    b.slots = slots
    (a, b, lo, hi)
  }

  test("multi-node URI: producer routes keys to slot owners; consumer reads them back") {
    import spark.implicits._
    val (a, b, lo, hi) = twoNodeTopology()
    try {
      val conn = SeaStreamer.connect(
        s"redis://${a.host}:${a.port},${b.host}:${b.port}", spark)
      val env = (0 until 40).map { i =>
        (if (i % 2 == 0) lo else hi, 0L, i.toLong,
          new java.sql.Timestamp(7000L + i), s"x$i".getBytes(UTF_8))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env)

      // entries physically live on their owner nodes only
      assert(a.entries(lo).size == 20 && b.entries(lo).isEmpty)
      assert(b.entries(hi).size == 20 && a.entries(hi).isEmpty)

      // bounded multi-node consumer resolves owners the same way
      val back = conn.createConsumer(Seq(lo, hi), ConsumerOptions(live = false))
      assert(back.count() == 40)
      assert(back.select($"payload".cast("string")).as[String]
        .collect().toSet == (0 until 40).map(i => s"x$i").toSet)
    } finally { a.close(); b.close() }
  }

  test("clampToTip on the cluster path: the tip probe routes to the " +
      "key's slot owner and a below-tip re-send lands clamped there") {
    import spark.implicits._
    val (a, b, lo, hi) = twoNodeTopology()
    try {
      val conn = SeaStreamer.connect(
        s"redis://${a.host}:${a.port},${b.host}:${b.port}", spark)
      def env(key: String, ms: Long, v: String) = Seq(
        (key, 0L, 0L, new java.sql.Timestamp(ms), v.getBytes(UTF_8)))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createProducer(hi).send(env(hi, 9000L, "tip"))
      // below-tip re-send through the clamped producer: must land AT the
      // tip ms on the OWNER node (the probe had to route there too)
      conn.createProducer(hi, redisClampToTip = true)
        .send(env(hi, 8000L, "late"))
      val entries = b.entries(hi)
      assert(entries.map(e => new String(e._2.head._2, UTF_8)) ==
        Seq("tip", "late"), entries.toString)
      assert(entries.last._1.startsWith("9000-"), entries.last._1)
      assert(a.entries(hi).isEmpty)
    } finally { a.close(); b.close() }
  }

  test("stale slot map: MOVED replies re-route and replay the whole pipeline") {
    import spark.implicits._
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      // slot map claims `a` owns everything, but `a` bounces key k to `b`
      val all = Seq((0, RedisCluster.HashSlots - 1, a.host, a.port))
      a.slots = all; b.slots = all
      a.redirects = Map("k" -> s"${b.host}:${b.port}")
      val conn = SeaStreamer.connect(
        s"redis://${a.host}:${a.port},${b.host}:${b.port}", spark)
      val env = (0 until 15).map { i =>
        ("k", 0L, i.toLong, new java.sql.Timestamp(8000L + i),
          s"m$i".getBytes(UTF_8))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env)
      assert(b.entries("k").size == 15, "MOVED replay must land on the new owner")
      assert(a.entries("k").isEmpty)
    } finally { a.close(); b.close() }
  }

  test("live producer: micro-batches flow through sendStream; ledger dedups replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(String, Long, java.sql.Timestamp, Array[Byte])]
      val ledger = Files.createTempDirectory("rs_ledger").toString
      val ckpt = Files.createTempDirectory("rs_ckpt").toString
      val frame = input.toDF()
        .toDF("stream_key", "shard_id", "timestamp", "payload")
        .selectExpr("stream_key", "shard_id",
          "cast(0 as long) as sequence", "timestamp", "payload")
      val q = conn.createGenericProducer()
        .sendStream(frame, ckpt, exactlyOnceLedger = Some(ledger))
      try {
        input.addData(Seq.tabulate(10)(i =>
          ("liveout", 0L, new java.sql.Timestamp(9000L + i),
            s"v$i".getBytes(UTF_8))))
        q.processAllAvailable()
        assert(srv.entries("liveout").size == 10)
        // the ledger recorded the epoch; re-applying it is a no-op
        assert(graft.ops.ExactlyOnce.isCommitted(spark, ledger, 0L))
        input.addData(Seq.tabulate(5)(i =>
          ("liveout", 0L, new java.sql.Timestamp(9100L + i),
            s"w$i".getBytes(UTF_8))))
        q.processAllAvailable()
        assert(srv.entries("liveout").size == 15)
      } finally q.stop()
    } finally srv.close()
  }

  test("live producer with redisLedgerPrefix: epochs land as WATCH+MULTI " +
      "transactions with the epoch ledger; mechanisms are exclusive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(String, Long, java.sql.Timestamp, Array[Byte])]
      val ckpt = Files.createTempDirectory("reos_ckpt").toString
      val frame = input.toDF()
        .toDF("stream_key", "shard_id", "timestamp", "payload")
        .selectExpr("stream_key", "shard_id",
          "cast(0 as long) as sequence", "timestamp", "payload")
      val producer = conn.createGenericProducer()
      val q = producer.sendStream(frame, ckpt,
        redisLedgerPrefix = Some("feos"), eosSlots = 4)
      try {
        input.addData(Seq.tabulate(10)(i =>
          ("txout", 0L, new java.sql.Timestamp(9000L + i),
            s"v$i".getBytes(UTF_8))))
        q.processAllAvailable()
        assert(srv.entries("txout").size == 10)
        // the epoch watermark committed atomically with the entries, on
        // the facade-chosen slot count
        val marks = (0 until 4).flatMap(sl =>
          srv.kvGet(s"feos:slot:$sl").map(new String(_, UTF_8).toLong))
        assert(marks.nonEmpty && marks.forall(_ >= 1L),
          s"missing epoch watermarks: $marks")
        input.addData(Seq.tabulate(5)(i =>
          ("txout", 0L, new java.sql.Timestamp(9100L + i),
            s"w$i".getBytes(UTF_8))))
        q.processAllAvailable()
        assert(srv.entries("txout").size == 15,
          "second epoch lost or duplicated rows")
      } finally q.stop()
      // mechanism exclusivity and scheme gating are typed errors
      intercept[graft.core.SeaStreamErr.Unsupported] {
        producer.sendStream(frame, ckpt,
          exactlyOnceLedger = Some("/tmp/x"),
          redisLedgerPrefix = Some("feos"))
      }
      intercept[graft.core.SeaStreamErr.Unsupported] {
        producer.sendStream(frame, ckpt,
          kafkaTransactionalId = Some("kx"),
          redisLedgerPrefix = Some("feos"))
      }
    } finally srv.close()
  }

  test("live producer with redisLedgerPrefix on a multi-node URI routes " +
      "the CLUSTER sink: per-key transactions on the owner nodes, " +
      "hash-tagged ledgers co-slotted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      val mid = RedisCluster.HashSlots / 2
      val topo = Seq((0, mid - 1, a.host, a.port),
        (mid, RedisCluster.HashSlots - 1, b.host, b.port))
      a.slots = topo; b.slots = topo
      val conn = SeaStreamer.connect(
        s"redis://${a.host}:${a.port},${b.host}:${b.port}", spark)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(String, Long, java.sql.Timestamp, Array[Byte])]
      val ckpt = Files.createTempDirectory("ceos_ckpt").toString
      val frame = input.toDF()
        .toDF("stream_key", "shard_id", "timestamp", "payload")
        .selectExpr("stream_key", "shard_id",
          "cast(0 as long) as sequence", "timestamp", "payload")
      // default producer is unsharded (redisShards = 1): keys are the
      // bare stream names — pick one stream per cluster half so the law
      // actually exercises BOTH owner nodes
      def nodeOf(key: String): EmbeddedRedis =
        if (RedisCluster.hashSlot(key) < mid) a else b
      val pool = (0 until 64).map(i => s"c$i")
      val keys = Seq(
        pool.find(k => RedisCluster.hashSlot(k) < mid).get,
        pool.find(k => RedisCluster.hashSlot(k) >= mid).get)
      val q = conn.createGenericProducer().sendStream(frame, ckpt,
        redisLedgerPrefix = Some("fceos"))
      try {
        input.addData((0 until 10).map(i =>
          (keys(i % 2), 0L, new java.sql.Timestamp(9000L + i),
            s"v$i".getBytes(UTF_8))))
        q.processAllAvailable()
        keys.foreach { k =>
          assert(nodeOf(k).entries(k).size == 5, s"$k missing entries")
          val other = if (nodeOf(k) eq a) b else a
          assert(other.entries(k).isEmpty, s"$k leaked to the wrong node")
          assert(nodeOf(k).kvGet(s"fceos:{$k}")
            .map(new String(_, UTF_8)).contains("1"),
            s"missing co-slotted ledger for $k")
        }
      } finally q.stop()
    } finally { a.close(); b.close() }
  }
}

/** Redirect edge semantics: a mid-pipeline slot migration must replay ONLY
  * the bounced suffix (the applied prefix would otherwise duplicate), and
  * ASK re-routes one-shot with the ASKING handshake without poisoning the
  * owner cache.
  */
class RedisRedirectEdgeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import java.nio.charset.StandardCharsets.UTF_8

  test("mid-pipeline MOVED: applied prefix never replays, suffix lands once") {
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      // `a` accepts 6 XADDs to key k then answers MOVED to `b`
      a.bounceAfter = Map("k" -> (6, s"${b.host}:${b.port}"))
      val cc = new RedisClusterClient(Seq((a.host, a.port)))
      try {
        val replies = cc.pipelineFor("k", (0 until 10).map(i =>
          RedisStreams.xadd("k", 1000L + i, s"m$i".getBytes(UTF_8))))
        assert(replies.size == 10)
        assert(a.entries("k").size == 6)
        assert(b.entries("k").size == 4, "only the bounced suffix replays")
        val all = (a.entries("k") ++ b.entries("k"))
          .map(e => new String(e._2.head._2, UTF_8))
        assert(all.sorted == (0 until 10).map(i => s"m$i").sorted,
          "no duplicates, no losses")
        assert(cc.ownerOf("k").contains((b.host, b.port)))
      } finally cc.close()
    } finally { a.close(); b.close() }
  }

  test("ASK: suffix re-sends with ASKING, owner cache stays unpoisoned") {
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      a.askRedirects = Map("k" -> s"${b.host}:${b.port}")
      val cc = new RedisClusterClient(Seq((a.host, a.port)))
      try {
        val replies = cc.pipelineFor("k", (0 until 5).map(i =>
          RedisStreams.xadd("k", 2000L + i, s"a$i".getBytes(UTF_8))))
        assert(replies.size == 5)
        assert(b.entries("k").size == 5)
        // ASK is one-shot: the cache must NOT now claim b owns k
        assert(!cc.ownerOf("k").contains((b.host, b.port)))
      } finally cc.close()
    } finally { a.close(); b.close() }
  }
}

/** group + startingOffsets=latest must anchor the clamp at the tip — a
  * capped consumer cannot crawl a deep dead prefix in empty batches before
  * the first live entry (while still keeping pending re-deliveries inside
  * the first batch's range).
  */
class RedisGroupLatestSpec extends org.scalatest.funsuite.AnyFunSuite {
  import java.nio.charset.StandardCharsets.UTF_8
  private lazy val spark = graft.TestSession.spark

  test("latest group consumer skips the dead prefix in O(1) batches") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try (0 until 5000).grouped(500).foreach { chunk =>
        c.pipeline(chunk.map(i =>
          RedisStreams.xadd("gl", 9000L + i, s"old$i".getBytes(UTF_8))))
      } finally c.close()
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "gl")
        .option("group", "glg").option("startingOffsets", "latest")
        .option("maxEntriesPerTrigger", "100")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_gl_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_gl_sink").count() == 0) // latest: no backlog
        val crawl = q.recentProgress.length
        assert(crawl <= 3, s"clamp crawled the dead prefix in $crawl batches")
        // live entries flow immediately
        val c2 = new RedisClient(srv.host, srv.port)
        try c2.pipeline((0 until 50).map(i =>
          RedisStreams.xadd("gl", 20000L + i, s"new$i".getBytes(UTF_8))))
        finally c2.close()
        q.processAllAvailable()
        assert(spark.table("redis_gl_sink").count() == 50)
      } finally q.stop()
    } finally srv.close()
  }
}
