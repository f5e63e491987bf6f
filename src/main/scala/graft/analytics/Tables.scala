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
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

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
