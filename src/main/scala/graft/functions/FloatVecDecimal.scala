package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Decimal-EXACT dot product / squared L2 distance over two `ARRAY<FLOAT>`
  * columns, as a codegen'd expression. Replicates bit-for-bit the SQL form
  *
  * {{{
  * CAST(aggregate(
  *   zip_with(a, b, (x, y) -> CAST(f(x, y) AS DECIMAL(30,15))),
  *   CAST(0 AS DECIMAL(38,15)), (acc, v) -> CAST(acc + v AS DECIMAL(38,15))) AS DOUBLE)
  * }}}
  *
  * with f = x*y (dot) or (x-y)² (dist2): each double term goes through
  * Spark's double→decimal cast semantics (`BigDecimal.valueOf(d)` — the
  * `Double.toString` shortest form — rounded to scale 15 HALF_UP), and each
  * accumulation step replicates Spark's decimal `+`: DECIMAL(38,15) +
  * DECIMAL(30,15) overflows precision 38, so `adjustPrecisionScale` rounds
  * every intermediate sum to scale 14 (HALF_UP) — the per-row array order
  * is fixed, so the result is fully deterministic, and the oracle's
  * exact-sum form agrees after the queries' ROUND(..., 6). The final
  * decimal surfaces as DOUBLE.
  *
  * Why it exists: the zip_with/aggregate lambdas run INTERPRETED per row.
  * On the similarity hot paths (s1–s4, c1, d5, d7: 10⁴–10⁶ pairs × 64 dims)
  * the interpreted higher-order-function overhead dominates the actual
  * BigDecimal arithmetic; this generates the same arithmetic as a tight
  * Java loop inside whole-stage codegen.
  *
  * Null semantics match the SQL form exactly: length mismatch, a null
  * element, or a non-finite product (CAST(NaN AS DECIMAL) is NULL) make the
  * whole result NULL.
  */
case class FloatVecDecimal(left: Expression, right: Expression,
    squaredDiff: Boolean) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (squaredDiff) "sea_fdist2_exact" else "sea_fdot_exact"

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> on both sides, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      val prod = if (squaredDiff) (xv - yv) * (xv - yv) else xv * yv
      // mirror the SQL decimal form exactly: CAST(double AS DECIMAL(30,15))
      // NULLs when |prod| >= 1e15 (precision overflow), and the
      // DECIMAL(38,14) accumulator NULLs past 24 integral digits
      if (java.lang.Double.isNaN(prod) || java.lang.Double.isInfinite(prod) ||
          math.abs(prod) >= 1e15)
        return null
      acc = acc.add(java.math.BigDecimal.valueOf(prod)
        .setScale(15, java.math.RoundingMode.HALF_UP))
        .setScale(14, java.math.RoundingMode.HALF_UP)
      if (acc.precision() > 38) return null
      i += 1
    }
    acc.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val prod = ctx.freshName("prod")
      val prodExpr =
        if (squaredDiff) s"($xv - $yv) * ($xv - $yv)" else s"$xv * $yv"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    double $prod = $prodExpr;
         |    if (Double.isNaN($prod) || Double.isInfinite($prod) ||
         |        Math.abs($prod) >= 1e15) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc = $acc.add(java.math.BigDecimal.valueOf($prod)
         |      .setScale(15, java.math.RoundingMode.HALF_UP))
         |      .setScale(14, java.math.RoundingMode.HALF_UP);
         |    if ($acc.precision() > 38) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDecimal =
    copy(left = newLeft, right = newRight)
}

object FloatVecDecimal {
  /** Exact decimal dot product (DOUBLE). */
  def fdotExact(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDecimal(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      squaredDiff = false))

  /** Exact decimal squared L2 distance (DOUBLE). */
  def fdist2Exact(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDecimal(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      squaredDiff = true))
}
