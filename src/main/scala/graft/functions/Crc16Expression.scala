package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

import graft.ss.Crc16Cdma2000

/** CRC-16/CDMA2000 as a native Catalyst expression — whole-stage codegen
  * emits a direct call to the table-driven implementation (no UDF
  * serialization on the hot path). This is the `.ss` frame checksum exposed
  * at the SQL surface as `sea_crc16(binary)`.
  */
case class Crc16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sea_crc16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Crc16Cdma2000(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ss.Crc16Cdma2000$$.MODULE$$.apply($c);")

  override protected def withNewChildInternal(newChild: Expression): Crc16 =
    copy(child = newChild)
}

object Crc16 {
  /** Column form. */
  def crc16(c: Column): Column =
    ColumnBridge.column(Crc16(ColumnBridge.expression(c)))

  /** Register `sea_crc16` for SQL use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sea_crc16", exprs => Crc16(exprs.head), "built-in")
}
