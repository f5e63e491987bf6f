package graft

import org.apache.spark.sql.functions._

/** Dev A/B harness: time named queries over 3 warm rounds (not part of the
  * driver contract — `graft.Bench` is the reported benchmark).
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = args.toSeq
    for (round <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseCaches(spark)
      System.gc()
      println(f"[scratch] round=$round $n%-24s $dt%7.2f s")
    }
    spark.stop()
  }
}
