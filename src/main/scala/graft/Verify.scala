package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    // optional comma-separated allowlist for local iteration (the driver
    // runs without it and gets every query)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Timestamp-typed outputs write as UTC-adjusted parquet, which DuckDB
      // reads as TIMESTAMPTZ — but the oracle computes over the driver's
      // naive-micros inputs and yields plain TIMESTAMP. Cast LTZ→NTZ at the
      // write boundary (UTC session ⇒ same wall-clock values) so both sides
      // of the compare carry the same type. No-op for the (typical) queries
      // that project epochs instead of raw timestamps.
      try {
        val out = fn(spark, sfDir)
        import org.apache.spark.sql.functions.col
        import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
        val norm = out.schema.fields.filter(_.dataType == TimestampType)
          .foldLeft(out) { (df, f) =>
            df.withColumn(f.name, col(f.name).cast(TimestampNTZType))
          }
        norm.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free per-query persisted frames AND localCheckpoint RDD blocks —
      // they would otherwise accumulate across all ~70 queries
      finally GraftSession.releaseCaches(spark)
    }
    // JSON string escape (shared graft.core.JsonText): a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    def q(s: String): String = graft.core.JsonText.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
