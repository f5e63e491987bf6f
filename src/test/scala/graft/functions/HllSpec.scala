package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("hll estimate within 5% of exact and stable across partitionings") {
    val n = 50000
    val df = spark.range(n).select(($"id" % 30000).as("v"))
    val exact = df.select(countDistinct($"v")).as[Long].head()
    val est1 = df.repartition(1).select(HllAggregator.hll($"v")).as[Long].head()
    val est32 = df.repartition(32).select(HllAggregator.hll($"v")).as[Long].head()
    assert(est1 == est32, "merge must be partition-order independent")
    assert(math.abs(est1 - exact).toDouble / exact < 0.05,
      s"estimate $est1 vs exact $exact")
  }

  test("hll works as a grouped aggregate") {
    val df = spark.range(10000)
      .select(($"id" % 4).as("g"), ($"id" % 1000).as("v"))
    // v ≡ g (mod 4) within each group → 250 distinct values per group
    val rows = df.groupBy("g").agg(HllAggregator.hll($"v").as("d"))
      .as[(Long, Long)].collect().toMap
    rows.values.foreach(d => assert(math.abs(d - 250) < 25, s"got $d"))
  }
}
