package graft

/** Escalation-cost receipt harness (BENCH_SF1's re-band subsection; not
  * part of the driver contract): prices the knob turn itself — build the
  * d14 index at the default banding over SPARK_GRAFT_SF_DIR, then time
  * [[analytics.Dedup.d14Rebuild]] to the given r and the recurring query
  * against the escalated index. The claim under receipt: escalation is an
  * O(index) re-pack (unpack stored keys → re-band → write-then-swap),
  * NOT a corpus re-sign — so rebuild time must sit well under build time
  * at every scale. Usage: `runMain graft.RebandProbe <r>`.
  */
object RebandProbe {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft/sf10")
    val spark = GraftSession.get()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    val b0 = System.nanoTime()
    analytics.Dedup.d14Build(spark, sfDir)
    val buildDt = (System.nanoTime() - b0) / 1e9
    GraftSession.releaseCaches(spark); System.gc()

    val r0 = System.nanoTime()
    analytics.Dedup.d14Rebuild(spark, sfDir, r)
    val rebuildDt = (System.nanoTime() - r0) / 1e9
    GraftSession.releaseCaches(spark); System.gc()

    val q0 = System.nanoTime()
    val n = analytics.Dedup.d14Query(spark, sfDir)
      .queryExecution.toRdd.count()
    val queryDt = (System.nanoTime() - q0) / 1e9

    println(f"[reband] sf=$sfDir r=$r build=$buildDt%.2f s " +
      f"rebuild=$rebuildDt%.2f s queryAtR=$queryDt%.2f s rows=$n")
    spark.stop()
  }
}
