package graft.ops

import graft.TestSession
import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** Orderings pinned by sea-streamer-fuse/src/lib.rs:196-313. */
class StreamJoinSpec extends AnyFunSuite {

  private def seq(key: String, items: Seq[Long]): Seq[SeaMessage] =
    items.map(i => SeaMessage(key, 0, i,
      new java.sql.Timestamp(i * 1000), Array.emptyByteArray))

  private def ks(ms: Seq[SeaMessage]): Seq[(String, Long)] =
    ms.map(m => (m.stream_key, m.sequence))

  test("mux 2 streams interleaved") {
    val got = StreamJoin.gatedBounded(
      seq("a", Seq(1, 3, 5, 7, 9)) ++ seq("b", Seq(2, 4, 6, 8, 10)),
      align = Seq("a", "b"))
    assert(ks(got) == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "b" -> 4L,
      "a" -> 5L, "b" -> 6L, "a" -> 7L, "b" -> 8L, "a" -> 9L, "b" -> 10L))
  }

  test("mux 2 streams runs") {
    val got = StreamJoin.gatedBounded(
      seq("a", Seq(1, 2, 5, 8, 9)) ++ seq("b", Seq(3, 4, 6, 7, 10)),
      align = Seq("a", "b"))
    assert(ks(got) == Seq("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L,
      "a" -> 5L, "b" -> 6L, "b" -> 7L, "a" -> 8L, "a" -> 9L, "b" -> 10L))
  }

  test("mux 3 streams with tie broken by key") {
    val got = StreamJoin.gatedBounded(
      seq("a", Seq(1, 3, 5, 7, 9)) ++ seq("c", Seq(5)) ++
        seq("b", Seq(2, 4, 6, 8, 10)),
      align = Seq("a", "b", "c"))
    assert(ks(got) == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "b" -> 4L,
      "a" -> 5L, "c" -> 5L, "b" -> 6L, "a" -> 7L, "b" -> 8L,
      "a" -> 9L, "b" -> 10L))
  }

  test("mux 4 streams") {
    val got = StreamJoin.gatedBounded(
      seq("a", Seq(1, 3)) ++ seq("d", Seq(5)) ++ seq("b", Seq(2, 4)) ++
        seq("c", Seq(3)),
      align = Seq("a", "b", "c", "d"))
    assert(ks(got) == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "c" -> 3L,
      "b" -> 4L, "d" -> 5L))
  }

  test("streaming gated merge buffers until every aligned stream has data") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[SeaMessage]
    val q = StreamJoin.gated(input.toDS(), align = Seq("a", "b"))
      .writeStream.outputMode("append").format("memory")
      .queryName("fuse_gated_test").start()
    try {
      // only 'a' messages: gate must stay closed
      input.addData(seq("a", Seq(1, 3, 5)))
      q.processAllAvailable()
      assert(spark.table("fuse_gated_test").count() == 0)

      // 'b' arrives: everything up to the smaller head flushes
      input.addData(seq("b", Seq(2)))
      q.processAllAvailable()
      val got1 = spark.table("fuse_gated_test")
        .select("stream_key", "sequence").as[(String, Long)].collect().toSeq
      assert(got1 == Seq("a" -> 1L, "b" -> 2L))

      input.addData(seq("b", Seq(4, 6)))
      q.processAllAvailable()
      val got2 = spark.table("fuse_gated_test")
        .select("stream_key", "sequence").as[(String, Long)].collect().toSeq
      assert(got2 == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "b" -> 4L, "a" -> 5L))
    } finally q.stop()
  }

  test("gatedByKey gates each group independently and in parallel") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    def sh(key: String, shard: Long, items: Seq[Long]): Seq[SeaMessage] =
      items.map(i => SeaMessage(key, shard, i,
        new java.sql.Timestamp(i * 1000), Array.emptyByteArray))

    val input = MemoryStream[SeaMessage]
    val q = StreamJoin
      .gatedByKey(input.toDS(), align = Seq("a", "b"), _.shard_id)
      .writeStream.outputMode("append").format("memory")
      .queryName("fuse_gated_keyed_test").start()
    try {
      // shard 0 has both aligned streams, shard 1 only 'a': shard 0's gate
      // opens while shard 1 stays closed — groups are independent
      input.addData(sh("a", 0, Seq(1, 3)) ++ sh("b", 0, Seq(2)) ++
        sh("a", 1, Seq(10, 11)))
      q.processAllAvailable()
      val got1 = spark.table("fuse_gated_keyed_test")
        .select("shard_id", "stream_key", "sequence")
        .as[(Long, String, Long)].collect().toSeq
      assert(got1 == Seq((0L, "a", 1L), (0L, "b", 2L)))

      // 'b' lands on shard 1: only shard 1 flushes, ordering within the
      // group matches the global gated law (a's queue drains, then the gate
      // closes with b=12 buffered — same retention rule as `gated`)
      input.addData(sh("b", 1, Seq(12)))
      q.processAllAvailable()
      val got2 = spark.table("fuse_gated_keyed_test")
        .select("shard_id", "stream_key", "sequence")
        .as[(Long, String, Long)].collect().toSeq
      assert(got2.drop(2) == Seq((1L, "a", 10L), (1L, "a", 11L)))
    } finally q.stop()
  }

  test("transformWithState gate matches the flatMapGroupsWithState law") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // TWS requires the RocksDB provider; restore the session default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SeaMessage]
      val q = StreamJoin.gatedByShardTws(input.toDS(), align = Seq("a", "b"))
        .writeStream.outputMode("append").format("memory")
        .queryName("fuse_tws_test").start()
      try {
        input.addData(seq("a", Seq(1, 3, 5)))
        q.processAllAvailable()
        assert(spark.table("fuse_tws_test").count() == 0, "gate must hold")
        input.addData(seq("b", Seq(2, 4)))
        q.processAllAvailable()
        val got = spark.table("fuse_tws_test")
          .select("stream_key", "sequence").as[(String, Long)].collect().toSeq
        assert(got == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "b" -> 4L))
      } finally q.stop()
    } finally spark.conf.set(key, prev)
  }

  test("batch merge equals global (ts, key, seq) order") {
    val spark = TestSession.spark
    import spark.implicits._
    val df = (seq("a", Seq(1, 3, 5)) ++ seq("b", Seq(2, 4))).toDF()
    val got = StreamJoin.merge(Seq(df))
      .select("stream_key", "sequence").as[(String, Long)].collect().toSeq
    assert(got == Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "b" -> 4L, "a" -> 5L))
  }
}
