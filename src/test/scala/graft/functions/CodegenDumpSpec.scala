package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Forces janino compilation of the vector expressions' doGenCode output.
  *
  * Queries silently fall back to interpreted eval when generated code fails
  * to compile (results stay right, the hot path loses codegen — round 7's
  * bench ran FloatVecDecimal interpreted because a generated line BEGAN
  * with `||`: Spark's codegen plumbing applies its own stripMargin, which
  * ate the operator). GenerateMutableProjection.generate has no fallback,
  * so a compile regression fails HERE instead of as a log line nobody
  * reads. Rule of thumb it pins: never start a generated-code line with a
  * margin character.
  */
class CodegenDumpSpec extends AnyFunSuite {

  private val a = BoundReference(0, ArrayType(FloatType), nullable = false)
  private val b = BoundReference(1, ArrayType(FloatType), nullable = false)
  private val exprs = Seq(
    FloatVecDecimal(a, b, squaredDiff = false),
    FloatVecDecimal(a, b, squaredDiff = true),
    FloatVecDot(a, b))

  test("vector expressions compile under codegen and match interpreted eval") {
    val proj = GenerateMutableProjection.generate(exprs) // throws on janino error
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.5f, -2.25f, 3.0f)),
      ArrayData.toArrayData(Array(0.5f, 4.0f, -1.25f)))
    val out = proj(row)
    exprs.zipWithIndex.foreach { case (e, i) =>
      assert(out.getDouble(i) == e.eval(row).asInstanceOf[Double],
        s"codegen/interpreted divergence for $e")
    }
  }

  test("overflow guard NULLs identically in both modes") {
    val proj = GenerateMutableProjection.generate(exprs)
    val big = InternalRow(
      ArrayData.toArrayData(Array(1e9f, 1f)),
      ArrayData.toArrayData(Array(-1e9f, 1f)))
    val out = proj(big)
    // |dot term| = 1e18, dist2 term = (2e9)^2 = 4e18, both >= 1e15: the
    // decimal-overflow guard must null in codegen exactly as interpreted
    assert(out.isNullAt(0) && exprs.head.eval(big) == null)
    assert(out.isNullAt(1) && exprs(1).eval(big) == null)
    assert(!out.isNullAt(2), "plain double dot has no overflow guard")
  }
}
