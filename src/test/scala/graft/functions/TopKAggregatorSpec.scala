package graft.functions

import graft.TestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // Deterministic pseudo-random rows with deliberate score ties (score
  // domain is small), spread over 7 partitions so partial merges happen.
  private def rows(n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val g = (i * 2654435761L) & 0x7fffffffL
      (g % 4, (g / 7) % 23, i.toLong) // (group, score, id)
    }

  test("topKLong equals the row_number window form, ties included") {
    val df = rows(2000).toDF("g", "score", "id").repartition(7)
    val got = df.groupBy("g")
      .agg(TopKAggregator.topKLong(5, -col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "x")))
      .select(col("g"), (-col("x._1")).as("score"), col("x._2").as("id"),
        (col("i") + 1).cast("long").as("rank"))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("g", "score", "id", "rank")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("topKDouble equals the window form; k larger than the group") {
    val df = rows(40).toDF("g", "s0", "id")
      .select(col("g"), (col("s0") / 7.0).as("score"), col("id"))
      .repartition(5)
    val got = df.groupBy("g")
      .agg(TopKAggregator.topKDouble(50,
        lit(0d) - col("score") + lit(0d), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "x")))
      .select(col("g"), (col("i") + 1).cast("long").as("rank"),
        col("x._2").as("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .select("g", "rank", "id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("result is partitioning-invariant and plans as ObjectHashAggregate") {
    val df = rows(500).toDF("g", "score", "id")
    val agg1 = df.repartition(1).groupBy("g")
      .agg(TopKAggregator.topKLong(3, -col("score"), col("id")).as("top"))
    val agg13 = df.repartition(13).groupBy("g")
      .agg(TopKAggregator.topKLong(3, -col("score"), col("id")).as("top"))
    assert(agg1.collect().toSeq.sortBy(_.getLong(0)).toString ==
      agg13.collect().toSeq.sortBy(_.getLong(0)).toString)
    val phys = agg13.queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate"),
      s"bounded top-k must plan as ObjectHashAggregate (partial+final):\n$phys")
    assert(!phys.contains("Window"), "no window sort on the top-k path")
  }

  test("negated-key recovery normalizes IEEE -0.0 (the ANN cosine round-trip)") {
    // the ANN queries rank by key = 0 - cosine + 0 and recover the output
    // score as 0 - key + 0; a ±0.0 cosine must come back as +0.0 on every
    // path or the oracle compare can hash-mismatch on the sign bit
    val df = Seq((0L, 0.5, 1L), (0L, -0.0, 2L), (0L, 0.0, 3L), (0L, -0.25, 4L))
      .toDF("g", "cosine", "id")
    val got = df.groupBy("g")
      .agg(TopKAggregator.topKDouble(4,
        lit(0d) - col("cosine") + lit(0d), col("id")).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "x")))
      .select((lit(0d) - col("x._1") + lit(0d)).as("cosine"), col("x._2").as("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == Seq((0.5, 1L), (0.0, 2L), (0.0, 3L), (-0.25, 4L)),
      s"order must be cosine DESC with ±0.0 equal, ids break ties: $got")
    got.filter(_._1 == 0.0).foreach { case (c, _) =>
      assert(java.lang.Double.doubleToRawLongBits(c) == 0L,
        "a zero cosine must surface as +0.0, never -0.0")
    }
  }
}
