package graft

import org.apache.spark.sql.functions._

/** Banding-knob receipt harness (not part of the driver contract): runs
  * d10's cross-corpus dedup at a given LSH band size r over
  * SPARK_GRAFT_SF_DIR and prints the numbers BENCH_SF1's banding
  * subsection commits — runtime, candidate-stream size (the collision
  * workload), and the matched-batch-doc set (recall vs the r=1 run is
  * |matched at r| / |matched at 1|; r=1's verify stage already filters by
  * exact Jaccard, so its match set IS the threshold truth for this
  * corpus). Usage: `runMain graft.BandingProbe <r>`.
  */
object BandingProbe {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft/sf10")
    val spark = GraftSession.get()
    // scan + JVM warmup, as in Bench
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    val t0 = System.nanoTime()
    val out = analytics.Dedup.d10With(spark, sfDir, r).localCheckpoint(true)
    val dt = (System.nanoTime() - t0) / 1e9
    val total = out.count()
    val matched = out.filter(!col("novel")).count()
    GraftSession.releaseCaches(spark)
    System.gc()

    // the collision receipt, separately (re-derives the candidate stage
    // only — its own cost is reported too so the run stays honest)
    val c0 = System.nanoTime()
    val nCand = analytics.Dedup.d10CandidateCount(spark, sfDir, r)
    val candDt = (System.nanoTime() - c0) / 1e9

    println(f"[banding] sf=$sfDir r=$r runtime=$dt%.2f s " +
      f"candidates=$nCand candStageOnly=$candDt%.2f s " +
      f"batchDocs=$total matched=$matched")
    spark.stop()
  }
}
