package graft

import org.apache.spark.sql.functions.col

/** Df-cap knob receipt harness (not part of the driver contract) — the
  * d10-banding-receipt discipline applied to the one remaining
  * superlinear family (VERDICT r11 ask #5): d13's sf10 growth rides
  * collision growth bounded by the shingle df-cap, so THIS family's knob
  * is the cap, not band size. Runs d13's containment dedup at two cap
  * settings over SPARK_GRAFT_SF_DIR and prints, per cap: runtime, the
  * co-occurring-pair stream size (the collision workload the cap bounds),
  * and output rows — then the EXACT output delta between the runs (pairs
  * present at cap A but lost at cap B, and vice versa: removing mid-df
  * shingles can move a pair's containment across the threshold in either
  * direction, so both deltas are measured, not assumed). Usage:
  * `runMain graft.DfCapProbe <capA> <capB>`.
  */
object DfCapProbe {
  def main(args: Array[String]): Unit = {
    val capA = args.headOption.map(_.toLong).getOrElse(256L)
    val capB = args.drop(1).headOption.map(_.toLong).getOrElse(128L)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft/sf10")
    val spark = GraftSession.get()
    // scan + JVM warmup, as in Bench
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(cap: Long): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val out = analytics.Dedup.d13With(spark, sfDir, cap)
        .localCheckpoint(true)
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = out.count()
      // the output PAIR-KEY set, collected before the cache release frees
      // the checkpoint blocks (output-sized — 52k rows at sf10, a probe-
      // only driver action)
      val keys = out.select(col("doc_inner"), col("doc_outer")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      GraftSession.releaseCaches(spark)
      System.gc()
      // the collision receipt, separately (re-derives the pair stage only —
      // its own cost is reported too so the run stays honest)
      val c0 = System.nanoTime()
      val nPairs = analytics.Dedup.d13PairCount(spark, sfDir, cap)
      val pairDt = (System.nanoTime() - c0) / 1e9
      GraftSession.releaseCaches(spark)
      System.gc()
      println(f"[dfcap] sf=$sfDir cap=$cap runtime=$dt%.2f s " +
        f"pairs=$nPairs pairStageOnly=$pairDt%.2f s outRows=$rows")
      keys
    }
    val keysA = run(capA)
    val keysB = run(capB)
    println(s"[dfcap] capA=$capA capB=$capB " +
      s"lostAtB=${(keysA -- keysB).size} gainedAtB=${(keysB -- keysA).size}")
    spark.stop()
  }
}
