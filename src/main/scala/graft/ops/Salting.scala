package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (big) side's key into
  * `saltFactor` sub-keys and explode the small side once per salt value, so
  * a single hot key spreads over `saltFactor` shuffle partitions. AQE's
  * skew-join handles moderate skew automatically; this is the explicit tool
  * for the pathological keys AQE can't split (e.g. one key > a whole
  * executor's memory).
  *
  * Salt is derived from deterministic row content (xxhash64 of all columns),
  * not rand(), so retries and replays are idempotent — same policy as
  * [[Sharders.pseudoRandom]].
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    *
    * Only join types whose unmatched-row semantics survive the small-side
    * explosion are allowed: a right/full outer join would emit an unmatched
    * small row once per salt replica.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "leftouter",
      "semi", "leftsemi", "anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support '$joinType' (unmatched small-side rows " +
        "would be duplicated per salt); use inner/left/semi/anti")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(
        sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
