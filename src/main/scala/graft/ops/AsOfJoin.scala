package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` per key — the time-series join Spark lacks as a
  * builtin (brief §custom operators, preference (a): composed from existing
  * ops).
  *
  * Implementation is a union + fill-forward window, NOT a per-row range
  * subquery: one shuffle on (key), one sort within partitions — linear and
  * skew-tolerant at any scale, and the right side is pre-deduplicated to one
  * row per (key, time) so results are deterministic.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (columns get `prefix`)
    * @param key        equality key column name (both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param prefix     prefix for right-side value columns in the output
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      prefix: String = "asof_"): DataFrame = {
    val rightCols = right.columns.filterNot(c => c == key || c == rightTime)
    // one row per (key, time): keep the lexicographically-last value tuple
    val rightUnique = right
      .groupBy(col(key), col(rightTime).as("__t"))
      .agg(max(struct(rightCols.map(col).toIndexedSeq: _*)).as("__rv"))
    // carry the FULL left row through the union as a struct — no re-join on
    // a synthetic id (monotonically_increasing_id is nondeterministic across
    // recomputations and must never be a join key)
    val leftCols = left.columns
    val taggedRight = rightUnique.select(
      col(key), col("__t"), lit(0).as("__side"), col("__rv"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__lv"))
    val taggedLeft = left.select(
      col(key), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(taggedRight.schema("__rv").dataType).as("__rv"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("__lv"))

    // right rows sort before left rows at equal time (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = taggedRight.unionByName(taggedLeft)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__lastT",
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val expanded = leftCols.foldLeft(filled) {
      case (df, c) => df.withColumn(c, col(s"__lv.$c"))
    }
    rightCols.foldLeft(expanded.withColumn(s"${prefix}time", col("__lastT"))) {
      case (df, c) => df.withColumn(s"$prefix$c", col(s"__last.$c"))
    }.select((leftCols.map(col) ++
      Seq(col(s"${prefix}time")) ++
      rightCols.map(c => col(s"$prefix$c"))).toIndexedSeq: _*)
  }
}
