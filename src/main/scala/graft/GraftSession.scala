package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: one place for the configs every entrypoint
  * (Verify, Bench, tests) must agree on.
  *
  *   - shuffle.partitions = cores (local mode; a real cluster would size this
  *     to ~2-3× total cores — the queries themselves never hardcode it)
  *   - AQE on: runtime coalescing + skew-join handling is the 100 TB story
  *   - nanosAsLong: events.parquet carries TIMESTAMP(NANOS) which the Spark 4
  *     parquet reader otherwise rejects (normalized in analytics.Tables)
  *   - UTC so the DuckDB oracle agrees on every epoch/date computation
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
