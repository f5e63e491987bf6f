package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** t21_stream_query_serve laws (the s13_mmr_indexed→t21 batch ≡ streaming
  * pair): serving the query stream per micro-batch off the persisted IVF
  * index must equal the batch serve bit-for-bit after end-of-log, the
  * streaming stage must carry ZERO state (each request's answer is final
  * within its own batch — MMR is per-qid independent), requests must
  * cross ≥2 genuine micro-batch boundaries, and every per-batch serve
  * plan must keep the s7 DPP partition pruning on the index scan (the
  * reason t21 serves through `foreachBatch`: a stream-static join
  * cannot prune partitions; a per-batch BATCH plan can).
  */
class StreamQueryServeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("t21 streaming serve == s13 batch serve, zero state, multi-batch, " +
      "DPP kept per batch") {
    Similarity.s7Layout(spark, dir)
    var batches = 0
    var stateRows = -1L
    val servePlans = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = Transport.t21QueryServeStream(spark, dir,
      inspect = q => {
        batches = q.recentProgress.count(_.numInputRows > 0)
        stateRows = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
      },
      inspectServe = (df: DataFrame) =>
        servePlans += df.queryExecution.explainString(FormattedMode))
    val streamRows = out.orderBy("qid", "mmr_rank")
      .collect().map(_.toSeq).toSeq
    val batchRows = Similarity.s13IndexedServe(spark, dir)
      .orderBy("qid", "mmr_rank").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t21 served no rows")
    assert(streamRows == batchRows,
      "streaming query serve diverged from the batch s13 indexed serve")
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    assert(stateRows == 0L,
      s"the stateless serve stage held $stateRows state rows")
    assert(servePlans.nonEmpty)
    servePlans.foreach { p =>
      assert(p.contains("dynamicpruning"),
        "a per-batch serve lost the DPP filter on the index scan")
      // the probe-selection cross is batch × BROADCAST centroids
      // (BroadcastNestedLoopJoin, K rows) — never a shuffled cartesian
      assert(!p.contains("CartesianProduct"),
        "the serve plan regressed to a cartesian product")
    }
  }
}
