package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` output without a transactional broker — the
  * Spark-native analogue of the reference's Kafka transactional producer
  * (sea-streamer-kafka/src/producer.rs:236-301, txn id = producer identity):
  * here the "transaction id" is (ledger, epochId).
  *
  * Spark replays the last uncommitted micro-batch after a restart with the
  * SAME epochId, so a sink that already saw the epoch must not apply it
  * again. The wrapper consults a commit ledger (one marker file per epoch,
  * published by atomic rename) and skips replayed epochs entirely.
  *
  * Guarantee: epochs whose marker exists are never re-applied (exactly-once
  * for every completed epoch). A crash BETWEEN the body finishing and the
  * marker rename re-runs the body once on replay — close that last window
  * by making the body's writes idempotent (deterministic file names like
  * the ss sink's epoch-keyed parts, or an upsert keyed on epochId).
  *
  * The ledger lives on the same storage as the checkpoint; at 100 TB scale
  * it is one tiny file per micro-batch, prunable below the checkpoint's
  * retained batch horizon.
  */
object ExactlyOnce {

  /** Wrap a foreachBatch body with epoch-replay dedup. */
  def epochOnce(ledgerDir: String)(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    val dir = new File(ledgerDir)
    (df: DataFrame, epochId: Long) => {
      dir.mkdirs()
      val marker = new File(dir, f"epoch-$epochId%012d.committed")
      if (!marker.exists()) {
        body(df, epochId)
        val tmp = new File(dir, f".epoch-$epochId%012d.inprogress")
        Files.write(tmp.toPath,
          String.valueOf(System.currentTimeMillis())
            .getBytes(StandardCharsets.UTF_8))
        Files.move(tmp.toPath, marker.toPath,
          StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** True when the ledger already committed this epoch. */
  def isCommitted(ledgerDir: String, epochId: Long): Boolean =
    new File(ledgerDir, f"epoch-$epochId%012d.committed").exists()
}
