package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** t30_stream_decontam laws (the p26→t30 batch ≡ streaming pair): the
  * seen-gram verdict gate at ingest must equal the batch decontamination
  * pass bit-for-bit after end-of-log, the documents must cross genuine
  * micro-batch boundaries, and the streaming state must be bounded by
  * the CONTAMINATED sliver (one count row per contaminated doc — the
  * clean majority dies at the bloom with no state at all).
  */
class StreamDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("t30 ingest verdicts == p26 batch verdicts, multi-batch, state " +
      "bounded by the contaminated sliver") {
    var batches = 0
    var stateRows = -1L
    val inspecting = Transport.queries("t30_stream_decontam")
    // run through the registry entry, capturing progress via the sink's
    // own query listener hooks is overkill here — re-run the stream body
    // with the inspection closure instead
    val out = Transport.t30DecontamStream(spark, dir, q => {
      batches = q.recentProgress.count(_.numInputRows > 0)
      // foldLeft, not .max: recentProgress is a bounded buffer and can
      // hold zero entries with state operators — an empty .max would turn
      // a coverage gap into an UnsupportedOperationException instead of
      // this spec's own assertion message
      stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(stateRows)(math.max)
    })
    val streamRows = out.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batchRows = Pipeline.ngramDecontam(
      Tables(spark, dir).documents).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t30 returned no rows")
    assert(streamRows == batchRows,
      "ingest-time decontamination diverged from the batch pass")
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    val contaminated = batchRows.count(r => r(3).asInstanceOf[Long] > 0L)
    assert(contaminated > 0, "fixture must contain contaminated docs")
    assert(stateRows <= contaminated,
      s"state ($stateRows rows) exceeded the contaminated sliver " +
        s"($contaminated docs) — the bloom/confirm stopped bounding it")
    // silence the unused registry handle (the entry shares the body)
    assert(inspecting != null)
  }
}
