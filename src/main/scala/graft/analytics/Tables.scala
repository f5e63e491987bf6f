package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB): every accessor is a plain parquet scan — Catalyst
  * pushes filters/projections into the scan, so callers must NOT cache or
  * collect here. Partitioning is whatever the file layout gives; queries that
  * need co-location repartition explicitly on their join/agg keys.
  */
final class Tables(spark: SparkSession, dir: String) {
  /** Driver testdata has shipped timestamps three ways across rounds:
    * TIMESTAMP(NANOS) (→ LONG under nanosAsLong, see [[events]]),
    * UTC-adjusted micros (→ TimestampType), and naive micros
    * (isAdjustedToUTC=false). Sessions built by [[graft.GraftSession]] read
    * the naive form as TimestampType at the scan
    * (`parquet.inferTimestampNTZ.enabled=false` + UTC session — value-
    * preserving, and timestamp range filters stay pushable). This fold is
    * the FALLBACK for externally-built sessions where the conf is absent:
    * correctness holds (same UTC reinterpretation) at the cost of the
    * projection cast blocking parquet pushdown on that column.
    */
  def t(name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** events.parquet stores ts as TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    * [[graft.GraftSession]]) so it arrives as LONG nanos. Normalize to a µs
    * TimestampType column here (integer div — a double division would lose
    * precision at 1.7e18 ns).
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
