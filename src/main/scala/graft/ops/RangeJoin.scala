package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerance range join: pairs (left, right) sharing `key` with
  * `|leftTime - rightTime| <= tolerance`.
  *
  * A naive theta-join on the inequality makes Catalyst fall back to a
  * broadcast-nested-loop; instead each side is bucketed by
  * `floor(time / tolerance)` and the left probes its own bucket ±1 — an
  * equi-join on (key, bucket) that covers every in-tolerance pair exactly
  * once, then the exact predicate filters. Linear shuffle volume, codegen'd
  * hash join, survives any scale the key distribution does.
  */
object RangeJoin {

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    // exact floor-division via decimal: `/` on longs is double division and
    // rounds times beyond 2^53 (e.g. nanosecond epochs), which could place a
    // pair 2 buckets apart and silently drop it from the ±1 probe
    def bucketOf(c: String): Column =
      floor(col(c).cast("decimal(38,0)") / tolerance).cast("long")
    val lb = left.withColumn("__bucket", bucketOf(leftTime))
    val probes = lb.withColumn("__probe",
      explode(array(col("__bucket") - 1, col("__bucket"), col("__bucket") + 1)))
    val rb = right.withColumn("__probe", bucketOf(rightTime))
    probes.join(rb, Seq(key, "__probe"))
      .filter(abs(col(leftTime) - col(rightTime)) <= tolerance)
      .drop("__bucket", "__probe")
  }
}
