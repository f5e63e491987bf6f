package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` output without a transactional broker — the
  * Spark-native analogue of the reference's Kafka transactional producer
  * (sea-streamer-kafka/src/producer.rs:236-301, txn id = producer identity):
  * here the "transaction id" is (ledger, epochId).
  *
  * Spark replays the last uncommitted micro-batch after a restart with the
  * SAME epochId, so a sink that already saw the epoch must not apply it
  * again. The wrapper consults a commit ledger (one marker file per epoch,
  * published by rename) and skips replayed epochs entirely.
  *
  * The ledger is resolved through the Hadoop FileSystem API, so it can —
  * and should — live NEXT TO THE CHECKPOINT (hdfs://, s3a://, file://):
  * a replacement driver then sees the same ledger the failed driver wrote.
  * Rename is atomic on HDFS and local filesystems; on object stores without
  * atomic rename the marker write narrows but does not close the window.
  *
  * Guarantee: epochs whose marker exists are never re-applied (exactly-once
  * for every completed epoch). A crash BETWEEN the body finishing and the
  * marker rename re-runs the body once on replay — close that last window
  * by making the body's writes idempotent (deterministic file names like
  * the ss sink's epoch-keyed parts, or an upsert keyed on epochId).
  *
  * At 100 TB scale the ledger is one tiny file per micro-batch, prunable
  * below the checkpoint's retained batch horizon.
  */
object ExactlyOnce {

  private def marker(dir: Path, epochId: Long): Path =
    new Path(dir, f"epoch-$epochId%012d.committed")

  /** Wrap a foreachBatch body with epoch-replay dedup. */
  def epochOnce(ledgerDir: String)(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (df: DataFrame, epochId: Long) => {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val dir = new Path(ledgerDir)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val dst = marker(dir, epochId)
      if (!fs.exists(dst)) {
        body(df, epochId)
        val tmp = new Path(dir, f".epoch-$epochId%012d.inprogress")
        val out = fs.create(tmp, true)
        try out.write(String.valueOf(System.currentTimeMillis())
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        if (!fs.rename(tmp, dst) && !fs.exists(dst))
          throw new java.io.IOException(
            s"could not publish epoch marker $dst")
      }
    }
  }

  /** True when the ledger already committed this epoch. */
  def isCommitted(spark: org.apache.spark.sql.SparkSession,
      ledgerDir: String, epochId: Long): Boolean = {
    val dir = new Path(ledgerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(marker(dir, epochId))
  }
}
