package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: the shuffle-free co-located join path (the 100 TB answer
  * to "this join shuffles every time"). Writing both sides bucketed+sorted on
  * the join key lets Catalyst plan a sort-merge join with NO Exchange — each
  * task reads matching buckets from both tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (plan should carry no
    * hash-partition Exchange when both are bucketed the same way).
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
