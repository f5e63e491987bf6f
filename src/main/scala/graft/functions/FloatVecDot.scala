package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `ARRAY<FLOAT>` embeddings as a native codegen'd
  * expression: a tight double-accumulation loop over the Tungsten array
  * data, in place of `aggregate(zip_with(...))` whose lambda higher-order
  * functions run interpreted row-by-row. On ~10⁶ candidate pairs × 64 dims
  * (the d5 prefilter shape) the interpreted form IS the query cost; this is
  * the hot path a 100 TB similarity pass lives in.
  *
  * Left-to-right accumulation order is fixed (index 0..n-1), so the result
  * is deterministic for given inputs — used for PREFILTERING and ranking
  * only; oracle-compared exact scores still go through the
  * order-independent decimal sum.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sea_fdot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(FloatType, containsNull = false) ||
      left.dataType == ArrayType(FloatType, containsNull = true))
      if (right.dataType == left.dataType ||
        right.dataType.isInstanceOf[ArrayType] &&
          right.dataType.asInstanceOf[ArrayType].elementType == FloatType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> on both sides, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> on both sides, got ${left.dataType.simpleString}")

  // SQL semantics match the aggregate(zip_with(...)) this replaces:
  // mismatched lengths or a null element make the whole result NULL
  // (zip_with pads with null, null * x = null, null + acc = null) — never a
  // silently truncated or zero-padded dot product.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column form. */
  def fdot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `sea_fdot` for SQL use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sea_fdot", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"sea_fdot requires exactly 2 arguments, got ${exprs.length}")
        FloatVecDot(exprs.head, exprs(1))
      }, "built-in")
}
