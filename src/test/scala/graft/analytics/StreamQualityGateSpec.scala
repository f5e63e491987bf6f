package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** t23_stream_quality_gate laws (the p23→t23 batch≡streaming pair): the
  * classifier's verdicts at ingest must equal the batch classifier
  * bit-for-bit after end-of-log, across genuine micro-batch boundaries,
  * with ZERO streaming state (a doc's tokens ride its own payload row),
  * and the model must reach the gate as a TABLE (the vocabulary is
  * corpus-vocabulary-sized — a literal/broadcast blob would cap the
  * model at driver memory; only the 3-long stats row rides as literals).
  */
class StreamQualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("t23 ingest scoring == p23 batch classifier, multi-batch, " +
      "zero state, model served from the parquet artifact") {
    var batches = 0
    var stateRows = -1L
    val out = Transport.t23QualityGateStream(spark, dir, q => {
      batches = q.recentProgress.count(_.numInputRows > 0)
      stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    })
    val streamRows = out.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batchRows = Pipeline.queries("p23_quality_classifier")(spark, dir)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t23 returned no rows")
    assert(streamRows == batchRows,
      "ingest-time scoring diverged from the batch classifier")
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    assert(stateRows == 0L,
      s"the stateless scoring stage held $stateRows state rows")
    // the model artifact is a real table the gate reads back — not a
    // captured in-memory frame
    val model = Transport.scratch(dir, "t23model")
    val vocab = spark.read.parquet(model)
    assert(vocab.columns.toSet == Set("w", "cp", "cn"))
    assert(vocab.count() > 0, "the persisted model is empty")
  }
}
