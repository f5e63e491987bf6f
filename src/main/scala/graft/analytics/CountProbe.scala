package graft.analytics

/** Dev probe (not part of the driver contract): does `df.count()` on a
  * named query optimize away work that producing the full result would
  * do? Prints the node histogram of the count plan vs the full plan and
  * times both. Usage: `runMain graft.analytics.CountProbe <query> <dir>`.
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    def hist(plan: String): Map[String, Int] =
      "(ShuffledHashJoin|BroadcastHashJoin|SortMergeJoin|HashAggregate|ObjectHashAggregate|Scan)".r
        .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val countPlan = df.groupBy().count().queryExecution.executedPlan.toString
    val fullPlan = df.queryExecution.executedPlan.toString
    println(s"[count-plan] ${hist(countPlan)}")
    println(s"[full-plan]  ${hist(fullPlan)}")
    var t0 = System.nanoTime(); df.count()
    println(f"[count()]    ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.GraftSession.releaseCaches(spark)
    t0 = System.nanoTime(); df.queryExecution.toRdd.count()
    println(f"[toRdd]      ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
