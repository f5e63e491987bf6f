package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FloatVecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("matches the interpreted aggregate/zip_with dot product exactly") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f), Array(-2.0f, 8.0f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val got = df.select(
      FloatVecDot.fdot($"a", $"b").as("fast"),
      expr("""aggregate(zip_with(a, b,
              |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("slow"))
      .as[(Double, Double)].collect()
    // identical left-to-right double accumulation: bit-equal, not approx
    got.foreach { case (fast, slow) => assert(fast == slow) }
    assert(got.head._1 == 32.0)
  }

  test("null elements and mismatched lengths yield null, like zip_with") {
    val df = Seq(
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f), Array[java.lang.Float](2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f))
    ).toDF("a", "b")
      .select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
    val got = df.select(FloatVecDot.fdot($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, None, Some(11.0)))
  }

  test("null inputs yield null; SQL registration works") {
    FloatVecDot.register(spark)
    val r = spark.sql(
      "SELECT sea_fdot(array(cast(1.0 as float)), CAST(NULL AS ARRAY<FLOAT>)) AS d")
      .collect().head
    assert(r.isNullAt(0))
    val v = spark.sql(
      "SELECT sea_fdot(array(cast(2.0 as float), cast(3.0 as float)), " +
        "array(cast(4.0 as float), cast(5.0 as float))) AS d")
      .as[Double].head()
    assert(v == 23.0)
  }

  test("participates in whole-stage codegen") {
    // a range source so ConvertToLocalRelation can't pre-evaluate the plan
    val df = spark.range(1, 2)
      .select(
        expr("transform(sequence(1, 2), i -> cast(i * id as float))").as("a"),
        expr("transform(sequence(3, 4), i -> cast(i as float))").as("b"))
      .select(FloatVecDot.fdot($"a", $"b").as("d"))
    // Spark 4 renders codegen spans as *(n) prefixes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"fdot fell out of codegen:\n$plan")
    assert(df.as[Double].head() == 1 * 3.0 + 2 * 4.0)
  }
}
