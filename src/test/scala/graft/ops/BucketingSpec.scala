package graft.ops

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("bucketed join plans without a shuffle and matches plain join") {
    val li = spark.read
      .parquet(s"${TestSession.sfDir}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read
      .parquet(s"${TestSession.sfDir}/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      joined.count() // force AQE-final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      // same result as the plain join
      val expect = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("producer auto-seq continues across sends per (stream, shard)") {
    import graft.facade.SeaStreamer
    import graft.facade.SeaStreamer.ConsumerOptions
    val dir = java.nio.file.Files.createTempDirectory("autoseq").toString
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    def batch(n: Int, tsBase: Long) = (0 until n).map { i =>
      (if (i % 2 == 0) "a" else "b", 0L, 0L,
        new java.sql.Timestamp(tsBase + i), s"m$i".getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")

    val p = conn.createGenericProducer()
    p.sendAssignSeq(batch(10, 1000L))
    p.sendAssignSeq(batch(10, 2000L))
    val back = conn.createConsumer(Seq("*"), ConsumerOptions(live = false))
    val seqs = back.select("stream_key", "sequence")
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // each key got 5 messages per batch: 0..4 then continuing 5..9
    assert(seqs("a") == (0L until 10L))
    assert(seqs("b") == (0L until 10L))
  }

  test("send receipts are the written per-message headers") {
    import graft.facade.SeaStreamer
    import graft.facade.SeaStreamer.ConsumerOptions
    val dir = java.nio.file.Files.createTempDirectory("receipts").toString
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    def batch(n: Int, tsBase: Long) = (0 until n).map { i =>
      (if (i % 2 == 0) "a" else "b", 0L, 0L,
        new java.sql.Timestamp(tsBase + i), s"m$i".getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")

    val p = conn.createGenericProducer()
    val r1 = p.sendAssignSeqReceipts(batch(10, 1000L))
      .select("stream_key", "sequence").as[(String, Long)].collect().toSet
    // one receipt per message carrying the assigned header
    assert(r1 == (0L until 5L).flatMap(i => Seq("a" -> i, "b" -> i)).toSet)
    // a second send's receipts continue the sequences (and are not a
    // recomputation against the store the first send changed)
    val r2 = p.sendAssignSeqReceipts(batch(10, 2000L))
      .select("stream_key", "sequence").as[(String, Long)].collect().toSet
    assert(r2 == (5L until 10L).flatMap(i => Seq("a" -> i, "b" -> i)).toSet)
    // receipts match exactly what a consumer reads back
    val back = conn.createConsumer(Seq("*"), ConsumerOptions(live = false))
      .select("stream_key", "sequence").as[(String, Long)].collect().toSet
    assert(back == r1 ++ r2)
  }
}
