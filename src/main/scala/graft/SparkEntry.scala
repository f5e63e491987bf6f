package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Aggregates the per-module query maps. Every query takes (spark, sfDir) and
  * returns a DataFrame; oracleSql holds the DuckDB-equivalent SQL for the
  * driver's hash-compare (column names must match exactly).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Relational.queries ++ analytics.Transport.queries ++
      analytics.Dedup.queries ++ analytics.TextAnalysis.queries ++
      analytics.Similarity.queries ++ analytics.Multimodal.queries ++
      analytics.Pipeline.queries ++ analytics.RedisTransport.queries ++
      analytics.IggyTransport.queries ++
      analytics.KafkaTransport.queries

  def oracleSql: Map[String, String] =
    analytics.Relational.oracles ++ analytics.Transport.oracles ++
      analytics.Dedup.oracles ++ analytics.TextAnalysis.oracles ++
      analytics.Similarity.oracles ++ analytics.Multimodal.oracles ++
      analytics.Pipeline.oracles ++ analytics.RedisTransport.oracles ++
      analytics.IggyTransport.oracles ++
      analytics.KafkaTransport.oracles
}
