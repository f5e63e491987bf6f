package graft.analytics

import graft.{SparkEntry, TestSession}
import org.scalatest.funsuite.AnyFunSuite

/** t29_stream_kmeans laws (the c6→t29 batch≡streaming pair — the
  * training-at-ingest rung above t19's inference-at-ingest): after
  * end-of-log the streamed mini-batch k-means must equal c6's batch run
  * bit-for-bit; the model carried across triggers is exactly K rows at
  * every trigger (O(K×dims) state at ANY corpus size); and the equality
  * must have crossed real micro-batch boundaries (three waves, three
  * triggers — online learning, not a single-trigger replay).
  */
class StreamKmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("t29 streamed model update == c6 batch mini-batch run bit-for-bit," +
      " with a 16-row model at every trigger across >= 3 triggers") {
    var triggers = 0
    var modelSizes = List.empty[Long]
    val stream = Transport.t29KmeansStream(spark, dir,
      inspectModel = { m =>
        triggers += 1
        modelSizes ::= m.count()
      })
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("c6_kmeans_minibatch")(spark, dir)
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty, "t29 returned no centroids")
    assert(stream == batch,
      "the streamed model update diverged from c6's batch run")
    assert(triggers >= 3,
      s"expected the three waves as three real triggers, saw $triggers")
    // EVERY trigger's model is exactly K rows — a max-only check would
    // let a shrinking model (e.g. the carry join dropping centers) pass
    assert(modelSizes.nonEmpty && modelSizes.forall(_ == 16L),
      s"the cross-trigger model must stay exactly K rows, saw $modelSizes")
  }
}
