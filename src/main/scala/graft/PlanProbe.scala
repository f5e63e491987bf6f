package graft

import org.apache.spark.sql.execution.FormattedMode

/** Temporary dev probe — dumps a query's formatted plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    println(SparkEntry.queries(args(0))(spark, dir)
      .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
