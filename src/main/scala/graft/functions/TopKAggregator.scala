package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: the per-group state is AT MOST `4k` entries at
  * any moment (insert, then sort-and-trim when the scratch fills), so a
  * top-20-per-query over a corpus-sized candidate stream aggregates with
  * O(k) memory per group and map-side partial merging — the shape a
  * `row_number().over(Window.partitionBy(qid))` rank-then-filter can never
  * have: the window sort-shuffles EVERY candidate into one task per query
  * (at 10^9 candidates per query that is the whole corpus through ≤
  * |queries| tasks). Plans as ObjectHashAggregate (typed Aggregator →
  * TypedImperativeAggregate), partial + final, same two-level merge as any
  * hash agg.
  *
  * Ordering is ASCENDING by the (key, id) tuple with the natural tuple
  * comparator — callers wanting "largest score first" pass the negated
  * score as `key` (ties then break on the smaller id, matching
  * `ORDER BY score DESC, id` exactly, boundary ties included). The result
  * is the sorted prefix, smallest tuple first; element i is rank i+1.
  *
  * Determinism: the kept set and its order depend only on the multiset of
  * inputs (sort-merge is associative/commutative over tuples), never on
  * partitioning or arrival order — the same bit-stability law the decimal
  * sums and [[HllAggregator]] follow.
  */
private[graft] sealed abstract class TopKAggBase[K: Ordering]
    extends Aggregator[(K, Long), ArrayBuffer[(K, Long)], Seq[(K, Long)]] {

  protected def k: Int
  private def scratch = math.max(4 * k, 64)

  private def trim(buf: ArrayBuffer[(K, Long)], to: Int): ArrayBuffer[(K, Long)] =
    if (buf.length <= to) buf
    else { val s = buf.sortInPlace(); s.takeInPlace(to); s }

  override def zero: ArrayBuffer[(K, Long)] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[(K, Long)], v: (K, Long)): ArrayBuffer[(K, Long)] = {
    buf += v
    if (buf.length >= scratch) trim(buf, k) else buf
  }

  override def merge(a: ArrayBuffer[(K, Long)], b: ArrayBuffer[(K, Long)]): ArrayBuffer[(K, Long)] =
    trim(a ++= b, k)

  override def finish(buf: ArrayBuffer[(K, Long)]): Seq[(K, Long)] =
    trim(buf, k).sorted.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(K, Long)]] =
    Encoders.kryo[ArrayBuffer[(K, Long)]]
}

/** Top-k for exact integer scores (key = negated score for descending). */
case class TopKLongAgg(k: Int) extends TopKAggBase[Long] {
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Top-k for double scores (key = negated score for descending). */
case class TopKDoubleAgg(k: Int) extends TopKAggBase[Double] {
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** `array<struct<_1: key, _2: id>>`, ascending — rank i+1 at element i. */
  def topKLong(k: Int, key: Column, id: Column): Column =
    org.apache.spark.sql.functions.udaf(TopKLongAgg(k)).apply(key, id)

  def topKDouble(k: Int, key: Column, id: Column): Column =
    org.apache.spark.sql.functions.udaf(TopKDoubleAgg(k)).apply(key, id)
}
