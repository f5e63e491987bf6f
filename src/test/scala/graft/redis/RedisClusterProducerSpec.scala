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
}
