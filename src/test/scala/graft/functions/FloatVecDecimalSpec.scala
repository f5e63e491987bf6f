package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-decimal vector expressions must replicate BIT-FOR-BIT the
  * interpreted SQL forms they replace on the similarity hot paths — the
  * DuckDB oracle pins those semantics, so any drift here is a correctness
  * break, not a perf detail.
  */
class FloatVecDecimalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val dotSql =
    """CAST(aggregate(
      |  zip_with(a, b, (x, y) ->
      |    CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,15))),
      |  CAST(0 AS DECIMAL(38,15)), (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin

  private val dist2Sql =
    """CAST(aggregate(
      |  zip_with(a, b, (x, y) ->
      |    CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
      |         (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(30,15))),
      |  CAST(0 AS DECIMAL(38,15)),
      |  (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin

  test("dot and dist2 match the interpreted decimal SQL forms bit-for-bit") {
    // deterministic pseudo-random 64-dim float pairs, including negatives,
    // tiny and large magnitudes — the shapes the similarity queries see
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = Array.fill(64)((rnd.nextFloat() - 0.5f) * rnd.nextInt(20))
      val b = Array.fill(64)((rnd.nextFloat() - 0.5f) * rnd.nextInt(20))
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      FloatVecDecimal.fdotExact($"a", $"b").as("fd"),
      expr(dotSql).as("sd"),
      FloatVecDecimal.fdist2Exact($"a", $"b").as("f2"),
      expr(dist2Sql).as("s2"))
      .as[(Double, Double, Double, Double)].collect()
    got.foreach { case (fd, sd, f2, s2) =>
      assert(fd == sd, "dot drifted from the decimal SQL form")
      assert(f2 == s2, "dist2 drifted from the decimal SQL form")
    }
  }

  test("norm form (dot of a vector with itself) matches the transform sum") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 50)
      .map(_ => Tuple1(Array.fill(64)(rnd.nextFloat() * 4 - 2f)))
      .toDF("a")
    val got = df.select(
      FloatVecDecimal.fdotExact($"a", $"a").as("fast"),
      expr("""CAST(aggregate(
             |  transform(a, x ->
             |    CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,15))),
             |  CAST(0 AS DECIMAL(38,15)),
             |  (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)""".stripMargin)
        .as("slow"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("null element, length mismatch and null input all yield null") {
    val df = Seq(
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f), Array[java.lang.Float](2.0f, 3.0f)),
      (Array[java.lang.Float](1.5f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),
      (Array.empty[java.lang.Float], Array.empty[java.lang.Float])
    ).toDF("a", "b")
      .select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
    val got = df.select(FloatVecDecimal.fdotExact($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // empty arrays fold to the initial decimal zero, like the SQL aggregate
    assert(got.toSeq == Seq(None, None, Some(12.5), Some(0.0)))
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(1, 2)
      .select(
        expr("transform(sequence(1, 2), i -> cast(i * id as float))").as("a"),
        expr("transform(sequence(3, 4), i -> cast(i as float))").as("b"))
      .select(FloatVecDecimal.fdotExact($"a", $"b").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"fdotExact fell out of codegen:\n$plan")
    assert(df.as[Double].head() == 11.0)
  }
}
