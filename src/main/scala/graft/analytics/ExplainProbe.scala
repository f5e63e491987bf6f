package graft.analytics

/** Dev probe (not part of the driver contract): print the physical join
  * strategy histogram of a named query at one or more data dirs — the
  * quick way to see where an AQE/threshold flip (broadcast → sort-merge)
  * lands as data scales. Usage:
  * `runMain graft.analytics.ExplainProbe <query> <dir> [dir...]`.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainProbe <query> <dir> [dir...]")
    val spark = graft.GraftSession.get()
    for (dir <- args.drop(1)) {
      val plan = graft.SparkEntry.queries(args(0))(spark, dir)
        .queryExecution.executedPlan.toString
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct)".r
        .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      println(s"[probe] $dir -> $joins")
    }
    spark.stop()
  }
}
