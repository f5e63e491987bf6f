package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class TransportLshSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("streamLshDupIds flags colliders across micro-batch boundaries") {
    import spark.implicits._
    // cap=2 → batches [1,2] [3,4] [5,6] [7,8]:
    //   doc 4 = doc 1's text  → dup via CROSS-batch bucket state
    //   doc 5 = doc 2's text  → dup via cross-batch state
    //   doc 6 = doc 2's text  → dup via cross-batch AND in-batch (doc 5)
    //   docs 7/8 identical but under 3 tokens → no signatures, both survive
    val a = "alpha beta gamma delta epsilon"
    val b = "one two three four five six"
    val docs = Seq(
      (1L, a), (2L, b),
      (3L, "unrelated words entirely different here"), (4L, a),
      (5L, b), (6L, b),
      (7L, "xy zz"), (8L, "xy zz")
    ).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("t14spec").toString
    val dups = Transport.streamLshDupIds(docs, out, cap = 2L,
      sinkName = "t14_spec_sink")
      .collect().map(_.getLong(0)).toSet
    assert(dups == Set(4L, 5L, 6L))
  }
}
