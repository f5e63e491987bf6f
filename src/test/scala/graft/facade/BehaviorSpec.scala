package graft.facade

import java.nio.file.Files

import graft.TestSession
import graft.core.SeaStreamErr
import graft.facade.SeaStreamer.{AutoCommit, AutoStreamReset, ConsumerMode, ConsumerOptions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral fixtures ported from the reference test suites (FIXTURES.md §2):
  * seek/rewind windows, group round-robin, sharding modulo.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Counting stream: payloads "0".."99", one stream, monotonic seq/ts
    * (sea-streamer-redis/tests/seek-rewind.rs:56-116).
    */
  private def countingStream(dir: String): SeaStreamer.Connection = {
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    val df = (0 until 100).map { i =>
      ("counting", 0L, i.toLong,
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toString.getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
    conn.createGenericProducer().send(df)
    conn
  }

  private def payloads(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.select($"payload".cast("string")).as[String].collect().map(_.toInt)
      .sorted.toSeq

  test("rewind to beginning sees [0..99]") {
    val dir = Files.createTempDirectory("bh").toString
    val conn = countingStream(dir)
    val got = conn.createConsumer(Seq("counting"), ConsumerOptions(
      live = false, autoStreamReset = AutoStreamReset.Earliest))
    assert(payloads(got) == (0 until 100))
  }

  test("rewind to seq N sees [N..99] (greater-or-equal law)") {
    val dir = Files.createTempDirectory("bh").toString
    val conn = countingStream(dir)
    val got = conn.createConsumer(Seq("counting"), ConsumerOptions(
      live = false, rewindSeqNo = Some(30L)))
    assert(payloads(got) == (30 until 100))
  }

  test("seek to timestamp sees strictly-greater window") {
    val dir = Files.createTempDirectory("bh").toString
    val conn = countingStream(dir)
    // ts of message 49 — seek must start at 50 (strictly greater)
    val got = conn.createConsumer(Seq("counting"), ConsumerOptions(
      live = false,
      seekTimestamp = Some(new java.sql.Timestamp(1700000000000L + 49 * 1000L))))
    assert(payloads(got) == (50 until 100))
  }

  test("group round-robin: member i gets seq % n == i") {
    val dir = Files.createTempDirectory("bh").toString
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    val df = (0 until 10).map { i =>
      ("g", 0L, i.toLong, new java.sql.Timestamp(1000L + i),
        i.toString.getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
    conn.createGenericProducer().send(df)
    val members = conn.createGroupConsumers(Seq("g"), "group1", 2,
      ConsumerOptions(live = false))
    assert(payloads(members(0)) == Seq(0, 2, 4, 6, 8))
    assert(payloads(members(1)) == Seq(1, 3, 5, 7, 9))
    // union of receipts covers everything, both nonempty (load-balanced law)
    assert((payloads(members(0)) ++ payloads(members(1))).sorted == (0 until 10))
  }

  test("sharded write: round-robin shard = i % 3, merged read = all") {
    import graft.ops.Sharders
    val dir = Files.createTempDirectory("bh").toString
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    val df = (0 until 10).map { i =>
      ("sh", 0L, i.toLong, new java.sql.Timestamp(1000L + i),
        i.toString.getBytes("UTF-8"))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
    conn.createGenericProducer().send(
      Sharders.applyShard(df, Sharders.roundRobin(3)))
    val back = conn.createConsumer(Seq("sh"), ConsumerOptions(live = false))
    val shards = back.select($"sequence", $"shard_id")
      .as[(Long, Long)].collect().toMap
    (0 until 10).foreach(i => assert(shards(i.toLong) == i % 3))
    assert(payloads(back) == (0 until 10))
  }

  test("ack/commit guard laws") {
    val dir = Files.createTempDirectory("bh").toString
    val conn = SeaStreamer.connect(s"file://$dir", spark)
    val rt = conn.committer(ConsumerOptions(mode = ConsumerMode.RealTime))
    assertThrows[SeaStreamErr.CommitNotAllowed.type](rt.ack())
    assertThrows[SeaStreamErr.CommitNotAllowed.type](rt.commit())
    val delayed = conn.committer(ConsumerOptions(
      mode = ConsumerMode.Resumable, autoCommit = AutoCommit.Delayed))
    assertThrows[SeaStreamErr.Unsupported](delayed.ack())
    val rolling = conn.committer(ConsumerOptions(
      mode = ConsumerMode.Resumable, autoCommit = AutoCommit.Rolling))
    rolling.ack() // allowed
    assertThrows[SeaStreamErr.Unsupported](rolling.commit())
    val disabled = conn.committer(ConsumerOptions(
      mode = ConsumerMode.Resumable, autoCommit = AutoCommit.Disabled))
    disabled.ack(); disabled.commit() // both allowed
  }
}
