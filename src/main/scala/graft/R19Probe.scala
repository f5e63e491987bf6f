package graft

import org.apache.spark.sql.functions._

/** r19 optimization-round phase profiler (dev-only, not driver contract):
  * breaks the composite d14-lifecycle bench entries into their phases so
  * the optimization targets the phase that actually costs (guide §1).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.R19Probe [build|query|
  * rebuild|upsert|t22|shingles]"
  */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[r19] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    val what = args.headOption.getOrElse("build")
    for (round <- 1 to 3) {
      System.err.println(s"[r19] --- round $round: $what ---")
      what match {
        case "build" =>
          t("d14Build total")(analytics.Dedup.d14Build(spark, sfDir))
        case "query" =>
          analytics.Dedup.d14Build(spark, sfDir)
          GraftSession.releaseCaches(spark)
          t("d14Query total")(force(analytics.Dedup.d14Query(spark, sfDir)))
        case "rebuild" =>
          analytics.Dedup.d14Build(spark, sfDir)
          GraftSession.releaseCaches(spark)
          t("d14Rebuild r4")(analytics.Dedup.d14Rebuild(spark, sfDir, 4))
          t("d14Query @r4")(force(analytics.Dedup.d14Query(spark, sfDir)))
        case "upsert" =>
          t("build")(analytics.Dedup.d14Build(spark, sfDir))
          t("rebuild r4")(analytics.Dedup.d14Rebuild(spark, sfDir, 4))
          val w1 = t("wave1 query")(
            analytics.Dedup.d14Query(spark, sfDir, Seq("src0", "src1")))
          val acc = t("wave1 force+filter")(
            w1.filter(col("novel")).select(col("doc_id")).localCheckpoint(true))
          t("append")(analytics.Dedup.d14Append(spark, sfDir, acc))
          t("wave2 query")(force(
            analytics.Dedup.d14Query(spark, sfDir, Seq("src2", "src3", "src4"))))
        case "t22" =>
          analytics.Dedup.d14Build(spark, sfDir)
          GraftSession.releaseCaches(spark)
          t("t22 stream total")(force(
            analytics.Transport.t22IndexGrowStream(spark, sfDir)))
        case "shingles" =>
          t("d2 total")(force(
            SparkEntry.queries("d2_ngram_jaccard")(spark, sfDir)))
      }
      GraftSession.releaseCaches(spark)
      System.gc()
    }
    spark.stop()
  }
}
