package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's native Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime-filter join pruning, not registered as public SQL
  * functions). A Bloom filter is the scale tool for membership prefilters
  * whose reference set outgrows a broadcast hash set: the filter's size is
  * fixed by (items, bits) regardless of the set's payload, false positives
  * are bounded, false negatives impossible — so `probe → exact confirm`
  * returns exactly the unfiltered result while the corpus-side scan stays
  * shuffle-free.
  */
object BloomFunctions {

  /** Aggregate an XXH64-hashed LONG column into a Bloom filter (BINARY). */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of an XXH64-hashed LONG against [[bloomAgg]]'s blob. */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))
}
