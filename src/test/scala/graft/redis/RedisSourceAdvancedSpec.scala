package graft.redis

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** Admission control on the redis micro-batch source: a deep backlog drains
  * in bounded batches (`maxEntriesPerTrigger`), and a checkpointed restart
  * resumes from the committed offset — never behind it (the
  * SupportsAdmissionControl law the ss source already pins).
  */
class RedisAdmissionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def seed(srv: EmbeddedRedis, key: String, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try (0 until n).grouped(500).foreach { chunk =>
      c.pipeline(chunk.map(i =>
        RedisStreams.xadd(key, 100000L + i, s"e$i".getBytes(UTF_8))))
    } finally c.close()
  }

  test("deep backlog drains in maxEntriesPerTrigger-bounded micro-batches") {
    val srv = new EmbeddedRedis
    try {
      seed(srv, "deep", 8000)
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "deep").option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "1000")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_admission_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_admission_sink").count() == 8000)
        assert(spark.table("redis_admission_sink")
          .select("sequence").distinct().count() == 8000)
        val batches = q.recentProgress.filter(_.numInputRows > 0)
        assert(batches.length >= 8,
          s"expected >=8 capped batches, got ${batches.length}")
        assert(batches.forall(_.numInputRows <= 1000),
          batches.map(_.numInputRows).mkString(","))
      } finally q.stop()
    } finally srv.close()
  }

  test("admission cap holds even when backlogged keys outnumber it") {
    val srv = new EmbeddedRedis
    try {
      // 4 backlogged keys, budget 3: a per-key floor of 1 would read 4 per
      // trigger; the fix serves a deterministic subset instead
      Seq("ka", "kb", "kc", "kd").foreach(k => seed(srv, k, 5))
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "ka,kb,kc,kd")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "3")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_tight_cap_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_tight_cap_sink").count() == 20)
        assert(spark.table("redis_tight_cap_sink")
          .select("stream_key", "sequence").distinct().count() == 20)
        assert(q.recentProgress.forall(_.numInputRows <= 3),
          q.recentProgress.map(_.numInputRows).mkString(","))
      } finally q.stop()
    } finally srv.close()
  }

  test("checkpointed restart resumes at the committed offset: no loss, bounded replay") {
    val srv = new EmbeddedRedis
    try {
      seed(srv, "ck", 5000)
      val ckpt = Files.createTempDirectory("redis_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def run(drain: Boolean): Unit = {
        val q = spark.readStream.format("redis-stream")
          .option("host", srv.host).option("port", srv.port.toString)
          .option("streams", "ck").option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "800")
          .load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select("sequence").collect().foreach(r => seen.add(r.getLong(0)))
            ()
          }.start()
        try {
          if (drain) q.processAllAvailable()
          else {
            // stop mid-drain: wait for at least two committed batches
            val deadline = System.nanoTime() + 30L * 1000000000L
            while (q.recentProgress.count(_.numInputRows > 0) < 2 &&
              System.nanoTime() < deadline) Thread.sleep(20)
          }
        } finally q.stop()
      }
      run(drain = false)
      run(drain = true)
      val all = {
        val b = Seq.newBuilder[Long]
        seen.forEach(x => b += x)
        b.result()
      }
      assert(all.toSet.size == 5000, "restart lost entries")
      // at-least-once: only the uncommitted tail may replay, never the
      // committed prefix (a regressed restart would re-emit thousands)
      assert(all.size - 5000 <= 1600,
        s"replayed ${all.size - 5000} rows — restart planned behind the checkpoint")
    } finally srv.close()
  }
}

/** Group (`XREADGROUP`/PEL) delivery through `format("redis-stream")`:
  * recovery of a dead consumer's unacked deliveries, lagged XACK settling,
  * and restart continuity — the reference's load-balanced failover laws
  * (sea-streamer-redis/tests/load-balanced.rs:160+, node.rs:647-744).
  */
class RedisGroupSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def send(srv: EmbeddedRedis, key: String, from: Int, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((from until from + n).map(i =>
      RedisStreams.xadd(key, 200000L + i, s"g$i".getBytes(UTF_8))))
    finally c.close()
  }

  test("dead consumer's PEL is claimed and re-delivered; acks settle next batch") {
    val srv = new EmbeddedRedis
    try {
      send(srv, "k", 0, 100)
      // a consumer takes 30 deliveries into the PEL and dies without acking
      val dead = new RedisGroupConsumer(srv.host, srv.port,
        "k", 0L, sharded = false, "g", "dead")
      try { dead.create(); assert(dead.fetch(30).size == 30) }
      finally dead.close()

      val ckpt = Files.createTempDirectory("redis_grp_ckpt").toString
      val runs = new java.util.concurrent.ConcurrentHashMap[Int,
        java.util.concurrent.ConcurrentLinkedQueue[String]]()
      def start(run: Int) = {
        runs.put(run, new java.util.concurrent.ConcurrentLinkedQueue[String]())
        spark.readStream.format("redis-stream")
          .option("host", srv.host).option("port", srv.port.toString)
          .option("streams", "k").option("startingOffsets", "earliest")
          .option("group", "g")
          .option("claimMinIdleMs", "0") // test compresses idle time
          .load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.selectExpr("cast(payload as string)").collect()
              .foreach(r => runs.get(run).add(r.getString(0)))
            ()
          }.start()
      }
      def gotIn(run: Int): Seq[String] = {
        val b = Seq.newBuilder[String]
        runs.get(run).forEach(x => b += x)
        b.result()
      }

      val q = start(1)
      try {
        q.processAllAvailable()
        // the 30 stranded deliveries came back via XAUTOCLAIM; the rest via
        // the group cursor — every entry exactly once within the run
        val got = gotIn(1)
        assert(got.toSet == (0 until 100).map(i => s"g$i").toSet)
        assert(got.length == 100)

        // acks lag one batch (Rolling law): a later batch settles them
        send(srv, "k", 100, 10)
        q.processAllAvailable()
        assert(gotIn(1).length == 110)
        val pending = srv.pendingIds("k", "g")
        assert(pending.size == 10, s"expected only the last batch pending, got $pending")
        assert(pending.values.forall(_ == "spark"))
      } finally q.stop()

      // restart from the checkpoint: committed deliveries are acked, never
      // re-emitted; only genuinely new entries flow
      send(srv, "k", 110, 20)
      val q2 = start(2)
      try {
        q2.processAllAvailable()
        val got2 = gotIn(2)
        assert(got2.toSet == (110 until 130).map(i => s"g$i").toSet,
          got2.mkString(","))
      } finally q2.stop()
    } finally srv.close()
  }
}

/** Seek-by-time pushed into the XRANGE start id (no residual filter), the
  * strictly-greater law of SURVEY §2.4 (seek-rewind.rs:22-121).
  */
class RedisSeekSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import graft.facade.SeaStreamer
  import graft.facade.SeaStreamer.ConsumerOptions

  private def seed(srv: EmbeddedRedis): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((0 until 50).map(i =>
      RedisStreams.xadd("s", 1000L + i, s"m$i".getBytes(UTF_8))))
    finally c.close()
  }

  test("replay seek: exact > law, pushed — no Filter in the optimized plan") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      seed(srv)
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val df = conn.createConsumer(Seq("s"), ConsumerOptions(live = false,
        seekTimestamp = Some(new java.sql.Timestamp(1024L))))
      val ts = df.select("timestamp").as[java.sql.Timestamp].collect().map(_.getTime)
      assert(ts.length == 25) // 1025..1049: strictly greater than 1024
      assert(ts.forall(_ > 1024L))
      val filters = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }
      assert(filters.isEmpty,
        s"seek must push into the XRANGE start, found: $filters")
    } finally srv.close()
  }

  test("rewind >= law: ms floor pushed as a prefix prune, exact residual filter") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      seed(srv)
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val n = RedisStreams.packSeqNo(1030L, 0L)
      val df = conn.createConsumer(Seq("s"), ConsumerOptions(live = false,
        rewindSeqNo = Some(n)))
      val seqs = df.select("sequence").as[Long].collect()
      assert(seqs.length == 20) // ms 1030..1049
      assert(seqs.forall(_ >= n))
      // exactly ONE residual filter (the exact >=); the prune rode the cursor
      val filters = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }
      assert(filters.size == 1)
    } finally srv.close()
  }

  test("assign pins the consumer to explicit (stream, shard) keys") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try {
        c.pipeline((0 until 10).map(i =>
          RedisStreams.xadd("as:0", 2000L + i, s"s0-$i".getBytes(UTF_8))))
        c.pipeline((0 until 10).map(i =>
          RedisStreams.xadd("as:1", 2000L + i, s"s1-$i".getBytes(UTF_8))))
      } finally c.close()
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      // replay: only the assigned shard is read
      val replay = conn.createConsumer(Seq("as"), ConsumerOptions(live = false,
        redisShards = 2, assignShards = Some(Seq(("as", 1L)))))
      assert(replay.select($"payload".cast("string")).as[String]
        .collect().toSet == (0 until 10).map(i => s"s1-$i").toSet)
      // live: the source plans only the assigned key
      val q = conn.createConsumer(Seq("as"), ConsumerOptions(live = true,
        redisShards = 2, assignShards = Some(Seq(("as", 1L))),
        autoStreamReset = SeaStreamer.AutoStreamReset.Earliest))
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_assign_live").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_assign_live")
          .select($"payload".cast("string")).as[String].collect().toSet ==
          (0 until 10).map(i => s"s1-$i").toSet)
      } finally q.stop()
    } finally srv.close()
  }

  test("live seek: startingTimestamp option carries the > law into the source") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      seed(srv)
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val df = conn.createConsumer(Seq("s"), ConsumerOptions(live = true,
        seekTimestamp = Some(new java.sql.Timestamp(1024L))))
      val filters = df.queryExecution.logical.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }
      assert(filters.isEmpty)
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName("redis_seek_live").start()
      try {
        q.processAllAvailable()
        val ts = spark.table("redis_seek_live")
          .select("timestamp").as[java.sql.Timestamp].collect().map(_.getTime)
        assert(ts.length == 25)
        assert(ts.forall(_ > 1024L))
      } finally q.stop()
    } finally srv.close()
  }
}

/** Slot-map bootstrap (`CLUSTER SLOTS`) and per-shard node routing in the
  * streaming source — the reference's multi-node cluster consumer
  * (sea-streamer-redis/src/cluster.rs:1-135, consumer/cluster.rs:14-239).
  */
class RedisClusterRoutingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("crc16/xmodem golden and the hash-tag rule") {
    // the CRC16 variant the cluster spec mandates: check value 0x31C3
    assert(RedisCluster.crc16XModem("123456789".getBytes(UTF_8)) == 0x31C3)
    assert(RedisCluster.hashTag("stream:{user1}:0") == "user1")
    assert(RedisCluster.hashTag("plain") == "plain")
    assert(RedisCluster.hashTag("odd{}braces") == "odd{}braces") // empty tag ignored
    assert(RedisCluster.hashSlot("stream:{a}:0") == RedisCluster.hashSlot("other:{a}:9"))
    assert((0 until 100).forall(i =>
      RedisCluster.hashSlot(s"k$i") < RedisCluster.HashSlots))
  }

  test("bootstrapSlots builds the ownership map from CLUSTER SLOTS") {
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      val mid = 8192
      a.slots = Seq((0, mid - 1, a.host, a.port), (mid, 16383, b.host, b.port))
      val cc = new RedisClusterClient(Seq((a.host, a.port)))
      try {
        val map = cc.bootstrapSlots()
        assert(map.nodes.toSet == Set((a.host, a.port), (b.host, b.port)))
        assert(map.ownerOfSlot(0).contains((a.host, a.port)))
        assert(map.ownerOfSlot(16383).contains((b.host, b.port)))
        // routed command goes straight to the slot owner, no MOVED hop
        val key = (0 until 1000).map(i => s"k$i")
          .find(k => RedisCluster.hashSlot(k) >= mid).get
        cc.command(key, RedisStreams.xadd(key, 1000L, "x".getBytes(UTF_8)): _*)
        assert(b.entries(key).size == 1 && a.entries(key).isEmpty)
      } finally cc.close()
    } finally { a.close(); b.close() }
  }

  test("streaming source routes each shard key to its owner node") {
    import spark.implicits._
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      val s0 = RedisCluster.hashSlot("ev:0")
      val s1 = RedisCluster.hashSlot("ev:1")
      assert(s0 != s1) // deterministic: distinct keys, distinct slots here
      // each node owns exactly one of the two shard keys
      a.slots = Seq((s0, s0, a.host, a.port), (s1, s1, b.host, b.port))
      b.slots = a.slots
      def fill(node: EmbeddedRedis, key: String, tag: String): Unit = {
        val c = new RedisClient(node.host, node.port)
        try c.pipeline((0 until 20).map(i =>
          RedisStreams.xadd(key, 3000L + i, s"$tag$i".getBytes(UTF_8))))
        finally c.close()
      }
      fill(a, "ev:0", "a")
      fill(b, "ev:1", "b")

      val q = spark.readStream.format("redis-stream")
        .option("host", a.host).option("port", a.port.toString)
        .option("cluster", "true")
        .option("streams", "ev").option("shards", "2")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_cluster_sink").start()
      try {
        q.processAllAvailable()
        val got = spark.table("redis_cluster_sink")
          .select($"payload".cast("string")).as[String].collect().toSet
        val want = (0 until 20).flatMap(i => Seq(s"a$i", s"b$i")).toSet
        assert(got == want, "shard keys were not routed to their owner nodes")
      } finally q.stop()
    } finally { a.close(); b.close() }
  }
}

/** Producer-side stream trimming (trim_stream_max_len / trim_stream_min_ts,
  * sea-streamer-redis/src/producer.rs:168-218) — real XTRIM semantics on
  * the embedded server, surfaced through the facade producer.
  */
class RedisTrimSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import graft.facade.SeaStreamer

  test("trimMaxLen and trimMinTimestamp drop exactly the right entries") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try c.pipeline((0 until 100).map(i =>
        RedisStreams.xadd("tr", 5000L + i, s"t$i".getBytes(UTF_8))))
      finally c.close()
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val prod = conn.createGenericProducer()

      assert(prod.trimMaxLen("tr", 40) == 60L)
      assert(srv.entries("tr").size == 40)
      assert(srv.entries("tr").head._1.startsWith("5060-")) // oldest dropped

      // drop everything older than ms 5080 (entries 5060..5079 go)
      assert(prod.trimMinTimestamp("tr",
        new java.sql.Timestamp(5080L)) == 20L)
      assert(srv.entries("tr").size == 20)
      assert(srv.entries("tr").head._1.startsWith("5080-"))

      // trimming a non-redis backend is a contract error
      val fileConn = SeaStreamer.connect("file:///tmp/graft/nowhere", spark)
      assertThrows[graft.core.SeaStreamErr.Unsupported](
        fileConn.createGenericProducer().trimMaxLen("tr", 1))
    } finally srv.close()
  }
}

/** kafkaAssignJson builds the built-in source's assign JSON exactly. */
class KafkaAssignSpec extends AnyFunSuite {
  test("assign pairs render as the kafka source's TopicPartition JSON") {
    import graft.facade.SeaStreamer
    assert(SeaStreamer.kafkaAssignJson(Seq(("t", 2L), ("t", 0L), ("u", 1L))) ==
      """{"t":[0,2],"u":[1]}""")
  }
}

/** RedisOffset JSON codec: roundtrip over the full key alphabet (stream
  * names with dots/dashes/underscores plus `:shard` suffixes). */
class RedisOffsetCodecSpec extends AnyFunSuite {
  test("offset json roundtrips arbitrary key maps") {
    import graft.redis.spark.RedisOffset
    val cases = Seq(
      Map.empty[String, String],
      Map("events" -> "0-0"),
      Map("a.b-c_d:0" -> "1700000000000-65535",
          "a.b-c_d:12" -> "9-9",
          "plain" -> "123-456"))
    cases.foreach { m =>
      val off = RedisOffset(m)
      assert(RedisOffset.fromJson(off.json()).ids == m, off.json())
    }
  }
}

/** Scale-shape guards: the redis read paths must fan out one Spark
  * partition per (stream, shard) key — the unit that makes 32k shard keys
  * parallelize across a cluster instead of funneling.
  */
class RedisPlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("boundedRead plans exactly one partition per shard key") {
    val srv = new EmbeddedRedis
    try {
      val shards = (0 until 3).flatMap(st => (0L until 4L).map(sh => (s"ps$st", sh)))
      val df = RedisSource.boundedRead(spark, srv.host, srv.port, shards)
      assert(df.rdd.getNumPartitions == 12)
    } finally srv.close()
  }

  test("micro-batch planning yields one input partition per key with backlog") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try (0 until 6).foreach { sh =>
        c.pipeline((0 until 5).map(i =>
          RedisStreams.xadd(s"mb:$sh", 4000L + i, s"x$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      } finally c.close()
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      val opts = new java.util.HashMap[String, String]()
      opts.put("host", srv.host); opts.put("port", srv.port.toString)
      opts.put("streams", "mb"); opts.put("shards", "6")
      val stream = new graft.redis.spark.RedisMicroBatchStream(
        new CaseInsensitiveStringMap(opts))
      val start = stream.initialOffset()
      val end = stream.latestOffset(start,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      val parts = stream.planInputPartitions(start, end)
      assert(parts.length == 6, "one partition per shard key")
      stream.stop()
    } finally srv.close()
  }
}

/** SCAN-based shard discovery (the reference consumer's sweep,
  * consumer/shard.rs:38-93): consumers find `stream:N` keys without being
  * told the shard count, ignore unrelated keys sharing the prefix, and the
  * live source picks up shards created mid-run.
  */
class RedisShardDiscoverySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import graft.facade.SeaStreamer
  import graft.facade.SeaStreamer.ConsumerOptions

  private def fill(srv: EmbeddedRedis, key: String, tag: String, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((0 until n).map(i =>
      RedisStreams.xadd(key, 6000L + i, s"$tag$i".getBytes(UTF_8))))
    finally c.close()
  }

  test("replay discovers shard keys by SCAN, skipping prefix-sharing decoys") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      (0 until 3).foreach(sh => fill(srv, s"ev:$sh", s"s$sh-", 10))
      fill(srv, "ev", "bare-", 5)       // bare key = shard 0 too
      fill(srv, "ev:notashard", "x", 3) // non-numeric suffix: ignored
      fill(srv, "evother", "y", 3)      // different stream: ignored
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      val got = conn.createConsumer(Seq("ev"), ConsumerOptions(live = false,
        discoverShards = true))
        .select($"payload".cast("string")).as[String].collect().toSet
      val want = (0 until 3).flatMap(sh => (0 until 10).map(i => s"s$sh-$i"))
        .toSet ++ (0 until 5).map(i => s"bare-$i")
      assert(got == want)
    } finally srv.close()
  }

  test("live source discovers NEW shards between micro-batches") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      fill(srv, "dy:0", "a", 10)
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "dy").option("discoverShards", "true")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_disc_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_disc_sink").count() == 10)
        // a shard that did not exist at stream start appears mid-run
        fill(srv, "dy:1", "b", 7)
        q.processAllAvailable()
        val got = spark.table("redis_disc_sink")
          .select($"payload".cast("string")).as[String].collect().toSet
        assert(got == ((0 until 10).map(i => s"a$i") ++
          (0 until 7).map(i => s"b$i")).toSet)
        assert(spark.table("redis_disc_sink")
          .select("shard_id").distinct().count() == 2)
      } finally q.stop()
    } finally srv.close()
  }
}

/** Restart-replay determinism with discovery: a replayed batch reaches
  * planInputPartitions on a FRESH stream instance before any sweep ran —
  * the plan must come from the logged offsets, never an empty (or changed)
  * discovery state.
  */
class RedisDiscoveryRestartSpec extends AnyFunSuite {
  test("a fresh instance replays a logged batch purely from its offsets") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try (0 until 2).foreach(sh =>
        c.pipeline((0 until 8).map(i =>
          RedisStreams.xadd(s"rr:$sh", 7000L + i, s"p$sh-$i".getBytes(UTF_8)))))
      finally c.close()
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      def stream() = {
        val opts = new java.util.HashMap[String, String]()
        opts.put("host", srv.host); opts.put("port", srv.port.toString)
        opts.put("streams", "rr"); opts.put("discoverShards", "true")
        new graft.redis.spark.RedisMicroBatchStream(
          new CaseInsensitiveStringMap(opts))
      }
      // original run: discover, plan a batch, checkpoint its offsets as json
      val s1 = stream()
      val start = s1.initialOffset()
      val end = s1.latestOffset(start,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      val (startJson, endJson) = (start.json(), end.json())
      s1.stop()
      // restart: Spark hands the logged offsets straight to a NEW instance
      val s2 = stream()
      val parts = s2.planInputPartitions(
        s2.deserializeOffset(startJson), s2.deserializeOffset(endJson))
      s2.stop()
      assert(parts.length == 2, "replayed batch must plan every logged key")
      val ids = parts.map(_.asInstanceOf[graft.redis.spark.RedisInputPartition])
        .map(p => (p.key, p.stream, p.shard)).toSet
      assert(ids == Set(("rr:0", "rr", 0L), ("rr:1", "rr", 1L)))
    } finally srv.close()
  }
}

/** Discovery × group interplay: a shard created mid-run must get the group
  * created before any reader XREADGROUPs it (real redis answers NOGROUP),
  * and EmbeddedRedis now enforces that law too.
  */
class RedisDiscoveryGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("XREADGROUP/XAUTOCLAIM/XPENDING on a missing group answer NOGROUP") {
    val srv = new EmbeddedRedis
    try {
      val c = new RedisClient(srv.host, srv.port)
      try {
        c.pipeline(Seq(RedisStreams.xadd("ng", 1L, "x".getBytes(UTF_8))))
        val e = intercept[RedisClient.RedisError](
          c.command(RedisStreams.xreadGroup("nope", "c", Seq("ng" -> ">")): _*))
        assert(e.msg.startsWith("NOGROUP"))
        assert(intercept[RedisClient.RedisError](
          c.command(RedisStreams.xautoclaim("ng", "nope", "c", 0L): _*))
          .msg.startsWith("NOGROUP"))
        assert(intercept[RedisClient.RedisError](
          c.command(RedisStreams.xpending("ng", "nope"): _*))
          .msg.startsWith("NOGROUP"))
      } finally c.close()
    } finally srv.close()
  }

  test("a shard created mid-run gets its group created before it is read") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      def fill(key: String, tag: String, n: Int): Unit = {
        val c = new RedisClient(srv.host, srv.port)
        try c.pipeline((0 until n).map(i =>
          RedisStreams.xadd(key, 6500L + i, s"$tag$i".getBytes(UTF_8))))
        finally c.close()
      }
      fill("dg:0", "a", 8)
      val q = spark.readStream.format("redis-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("streams", "dg").option("discoverShards", "true")
        .option("group", "dgg").option("claimMinIdleMs", "0")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("redis_dg_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("redis_dg_sink").count() == 8)
        fill("dg:1", "b", 6) // new shard: group must be created on it
        q.processAllAvailable()
        val got = spark.table("redis_dg_sink")
          .select($"payload".cast("string")).as[String].collect().toSet
        assert(got == ((0 until 8).map(i => s"a$i") ++
          (0 until 6).map(i => s"b$i")).toSet)
      } finally q.stop()
    } finally srv.close()
  }
}
