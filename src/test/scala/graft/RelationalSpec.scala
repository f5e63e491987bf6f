package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM per `sbt test` fork). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.builder("4")
    .appName("graft-test").getOrCreate()
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  for ((name, fn) <- analytics.Relational.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, TestSession.sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    assert(analytics.Relational.oracles.keySet ==
      analytics.Relational.queries.keySet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
