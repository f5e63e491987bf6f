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

  /** Inner equi-join of two CORPUS-SIZED sides on `key`, decomposed into
    * `blocks²` shuffle keys per join key — the tool for hot-key self-join
    * shapes ([[saltedJoin]] cannot help there: it explodes the "small" side
    * per salt, which is quadratic when both sides are big).
    *
    * A key held by k_left × k_right rows puts that whole product on ONE
    * shuffle partition (an LSH bucket of clustered embeddings, a hot
    * SemDeDup cluster). Blocking assigns each left row a content-derived
    * block i and replicates it once per j, each right row a block j
    * replicated once per i; the pair (i, j) then meets exactly once on
    * shuffle key (key, i, j). Work per partition drops to
    * (k_left/blocks)×(k_right/blocks) at the cost of writing each side
    * `blocks`× — the standard balanced-self-join trade, worth it exactly
    * when a single key's product dwarfs the replication.
    *
    * Pure plumbing: the result equals the unsalted inner join (the oracle
    * gate on d5/d7 proves it). Block ids are xxhash64 of row content, not
    * rand(), so task retries replay identically. Shuffle-hinted: both
    * sides are unbounded at corpus scale, a local broadcast would hide the
    * shape this exists for.
    */
  def blockedPairJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      blocks: Int): DataFrame = {
    require(blocks > 0, s"blocks must be positive, got $blocks")
    val l = left
      .withColumn("__bi",
        pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*),
          lit(blocks.toLong)))
      .withColumn("__bj", explode(sequence(lit(0L), lit(blocks.toLong - 1))))
    val r = right
      .withColumn("__bj",
        pmod(xxhash64(right.columns.map(col).toIndexedSeq: _*),
          lit(blocks.toLong)))
      .withColumn("__bi", explode(sequence(lit(0L), lit(blocks.toLong - 1))))
    l.join(r.hint("shuffle_hash"), Seq(key, "__bi", "__bj"), "inner")
      .drop("__bi", "__bj")
  }
}
