package graft.ops

import java.nio.file.Files

import graft.TestSession
import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** Replay law: a micro-batch re-delivered with the same epochId (what a
  * restart does to the last uncommitted batch) must not re-apply its
  * output (reference Kafka transactional producer parity,
  * producer.rs:236-301).
  */
class ExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("epochOnce applies each epoch exactly once across replays") {
    val ledger = Files.createTempDirectory("eo-ledger").toString
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val writer = ExactlyOnce.epochOnce(ledger) { (df, epoch) =>
      applied.add(epoch * 1000 + df.count())
    }
    val df = Seq(1, 2, 3).toDF("x")

    writer(df, 7L)
    writer(df, 7L) // replayed epoch: must be skipped
    writer(df, 8L)
    assert(applied.toArray.toSeq == Seq(7003L, 8003L))
    assert(ExactlyOnce.isCommitted(spark, ledger, 7L) &&
      ExactlyOnce.isCommitted(spark, ledger, 8L) &&
      !ExactlyOnce.isCommitted(spark, ledger, 9L))
  }

  test("a body crash leaves the epoch uncommitted, so replay retries it") {
    val ledger = Files.createTempDirectory("eo-ledger2").toString
    var attempts = 0
    val writer = ExactlyOnce.epochOnce(ledger) { (_, _) =>
      attempts += 1
      if (attempts == 1) throw new RuntimeException("sink down")
    }
    val df = Seq(1).toDF("x")
    intercept[RuntimeException] { writer(df, 1L) }
    assert(!ExactlyOnce.isCommitted(spark, ledger, 1L))
    writer(df, 1L) // replay succeeds and commits
    assert(attempts == 2 && ExactlyOnce.isCommitted(spark, ledger, 1L))
  }

  test("end-to-end: stream restart with epochOnce never duplicates output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ledger = Files.createTempDirectory("eo-ledger3").toString
    val ckpt = Files.createTempDirectory("eo-ckpt").toString
    val outDir = Files.createTempDirectory("eo-out").toString

    def msg(i: Int) = SeaMessage("k", 0, i.toLong,
      new java.sql.Timestamp(1000L + i), s"m$i".getBytes)

    val input = MemoryStream[SeaMessage]
    def start() = input.toDS().toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(ExactlyOnce.epochOnce(ledger) { (df, epoch) =>
        // idempotent body: epoch-keyed deterministic destination
        df.write.mode("overwrite").parquet(s"$outDir/epoch=$epoch")
      })
      .start()

    val q1 = start()
    try { input.addData(Seq(msg(1), msg(2))); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(Seq(msg(3))); q2.processAllAvailable() }
    finally q2.stop()

    val all = spark.read.parquet(s"$outDir/epoch=*")
      .select("sequence").as[Long].collect().sorted
    assert(all.toSeq == Seq(1L, 2L, 3L), s"duplicated or lost: ${all.toSeq}")
  }
}
