package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: the shuffle-free co-located join path (the 100 TB answer
  * to "this join shuffles every time"). Writing both sides bucketed+sorted on
  * the join key lets Catalyst plan a sort-merge join with NO Exchange — each
  * task reads matching buckets from both tables.
  */
object Bucketing {

  /** Run independent Spark actions CONCURRENTLY from driver threads and
    * wait for all (optimization guide §2.6 "overlap independent jobs"):
    * a bucketed index write is numBuckets tasks plus single-threaded
    * driver commit work, so a sequence of them leaves the executor mostly
    * idle — submitting them together lets each job's tasks back-fill the
    * others' tails and overlaps the driver-side commits. Threads are
    * fresh per call, so Spark's inheritable thread-locals (job group /
    * description) match an inline call. All tasks are awaited even on
    * failure (no half-written set left racing); the first error rethrows.
    */
  def concurrently(tasks: Seq[() => Unit]): Unit = tasks match {
    case Seq() => ()
    case Seq(one) => one()
    case many =>
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = many.map { f =>
        val t = new Thread(() =>
          try f() catch { case e: Throwable => errs.add(e) })
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join())
      if (!errs.isEmpty) {
        // rethrow the first error with the OTHERS attached — correlated
        // write failures must not lose their diagnostics (ADVICE r19)
        val first = errs.poll()
        var next = errs.poll()
        while (next != null) { first.addSuppressed(next); next = errs.poll() }
        throw first
      }
  }

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

  /** Data files currently backing a managed bucketed table (hidden/marker
    * files excluded) — the observability hook for compaction policy: after
    * N [[appendBucketed]] waves each bucket holds N small files, and the
    * exchange-free read degrades into a small-files scan.
    */
  def tableDataFileCount(spark: SparkSession, table: String): Int = {
    val loc = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath + "/" + table.toLowerCase)
    Option(loc.listFiles()).map(_.count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    ).getOrElse(0)
  }

  /** Compact a bucketed table back to ONE file per bucket, same
    * (key, numBuckets) spec — the lifecycle pass that keeps a
    * [[appendBucketed]]-grown index readable at one file-open per bucket
    * after a year of daily waves. Cost is O(index): one read + one write
    * of the table's own bytes, no recomputation of what they hold.
    *
    * Exactly-once by write-then-swap, the scratch table playing the epoch
    * marker's role (s12's ledger discipline): the rewrite first fully
    * commits under `table__compact` — a crash before that leaves the
    * original untouched and a rerun starts over. Only then does the
    * catalog swap run (DROP + RENAME, both metadata-only directory moves);
    * a crash between them leaves the committed scratch table as the
    * recovery marker, and the entry check below finishes the swap on the
    * next call instead of re-running the rewrite.
    *
    * The rewrite is EXCHANGE-FREE: forcing the bucketed scan (see
    * [[forceBucketedScan]]) makes the read one task per bucket, so each
    * write task holds exactly one bucket's rows → one file per bucket with
    * no shuffle — compaction is a per-bucket file merge, not a repartition
    * job. (A `repartition(n, key)` would NOT do this: the planner drops it
    * as already-satisfied against the bucketed scan's partitioning, and
    * AQE's DisableUnnecessaryBucketedScan then un-buckets the scan because
    * the v1 write sits outside the adaptive plan — leaving mixed-bucket
    * tasks and a file per (task, bucket) pair.)
    */
  def compactBucketed(
      spark: SparkSession,
      table: String,
      key: String,
      numBuckets: Int): Unit =
    rewriteBucketed(spark, table, key, numBuckets)(identity)

  /** Rewrite a bucketed table in place under the SAME (key, numBuckets)
    * spec through `transform` — the shared machinery behind compaction
    * (identity transform → one file per bucket) and index deletion (an
    * anti-join transform → the takedown pass). Exactly-once via
    * write-then-swap: the transformed copy commits fully into a scratch
    * table before the original is dropped, and a crash between DROP and
    * RENAME recovers on the next call (the committed scratch IS the data).
    *
    * The rewrite body runs in a FRESH child session (`newSession` — same
    * SparkContext and shared catalog, its own SQLConf), so the
    * [[forceBucketedScan]] toggle it needs is invisible to every other
    * thread: rewrites of INDEPENDENT tables are therefore safe to submit
    * through [[concurrently]] (guide §2.6) — the r19 reason to keep
    * compaction sequential (a session-global conf flip) is gone.
    */
  def rewriteBucketed(
      spark: SparkSession,
      table: String,
      key: String,
      numBuckets: Int)(transform: DataFrame => DataFrame): Unit = {
    val tmp = table + "__compact"
    if (spark.catalog.tableExists(tmp) && !spark.catalog.tableExists(table)) {
      // crash between DROP and RENAME: the committed scratch IS the data
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      return
    }
    val sub = spark.newSession()
    forceBucketedScan(sub) {
      writeBucketed(transform(sub.table(table)), tmp, key, numBuckets)
    }
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Run `body` with auto-bucketed-scan disablement OFF, so a bucketed
    * table read plans one task per bucket even when no join/agg demands
    * the clustering — the alignment [[compactBucketed]]'s one-file-per-
    * bucket rewrite depends on.
    */
  private def forceBucketedScan[T](spark: SparkSession)(body: => T): T = {
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, prev)
  }

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
