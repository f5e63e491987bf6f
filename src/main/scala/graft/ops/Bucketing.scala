package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: the shuffle-free co-located join path (the 100 TB answer
  * to "this join shuffles every time"). Writing both sides bucketed+sorted on
  * the join key lets Catalyst plan a sort-merge join with NO Exchange — each
  * task reads matching buckets from both tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. Idempotent across
    * SESSIONS, not just runs: a fresh in-memory catalog has no entry for a
    * previous session's table, so Overwrite alone trips over the leftover
    * warehouse location — drop the catalog entry AND clear the stale
    * directory first.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath + "/" + table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Append into an existing bucketed table created by [[writeBucketed]] —
    * the grow path for persisted indexes. The batch's rows land as NEW
    * files inside the same bucket layout (the existing index bytes are
    * never read or rewritten), and reads group files by bucket id, so a
    * [[bucketedJoin]] over the grown table still plans with no Exchange —
    * multiple files per bucket cost a per-task sort, never a shuffle.
    * Spark validates the (numBuckets, key) spec against the catalog entry,
    * so a drifted layout fails loudly instead of silently mis-bucketing.
    */
  def appendBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Append)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (plan should carry no
    * hash-partition Exchange when both are bucketed the same way). The
    * merge hint pins the sort-merge strategy the bucket layout exists for —
    * an auto-broadcast of a locally-small side would silently bypass the
    * exchange-free bucket matching this op is about.
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), Seq(key), joinType)
}
