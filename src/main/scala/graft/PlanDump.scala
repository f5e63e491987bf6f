package graft

/** Dev probe (not driver contract): write `.explain("formatted")` of named
  * declared queries to files — the plans/r19 before/after evidence.
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q> [q...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $q ($suffix)")
      GraftSession.releaseCaches(spark)
    }
    spark.stop()
  }
}
