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

  test("keeper law is arrival-order independent (keeper arrives last)") {
    import spark.implicits._
    // single shard, but the hash-scrambled write order means batch splits
    // at cap=2 deliver colliders BEFORE their keepers for some buckets;
    // the dethroned-keeper emission must converge to the same dup set a
    // doc-ordered ingest yields. Cross-check: run the same docs at every
    // cap (different batch splits) — the set never changes.
    val a = "alpha beta gamma delta epsilon"
    val b = "one two three four five six"
    val docs = Seq(
      (1L, a), (2L, b),
      (3L, "unrelated words entirely different here"), (4L, a),
      (5L, b), (6L, b),
      (7L, "xy zz"), (8L, "xy zz")
    ).toDF("doc_id", "text")
    for ((cap, i) <- Seq(1L, 2L, 3L, 8L).zipWithIndex) {
      val out = java.nio.file.Files.createTempDirectory(s"t14order$i").toString
      val dups = Transport.streamLshDupIds(docs, out, cap = cap,
        sinkName = s"t14_order_sink_$i", shards = 1)
        .collect().map(_.getLong(0)).toSet
      assert(dups == Set(4L, 5L, 6L), s"cap=$cap")
    }
  }

  test("4 ingest shards with interleaved batches yield the same dup set") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon"
    val b = "one two three four five six"
    // keepers and their dups deliberately land on DIFFERENT shards
    // (doc_id % 4): 1→s1, 4→s0, 5→s1, 2→s2, 6→s2
    val docs = Seq(
      (1L, a), (2L, b),
      (3L, "unrelated words entirely different here"), (4L, a),
      (5L, b), (6L, b),
      (7L, "xy zz"), (8L, "xy zz")
    ).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("t14shards").toString
    val dups = Transport.streamLshDupIds(docs, out, cap = 2L,
      sinkName = "t14_shards_sink", shards = 4)
      .collect().map(_.getLong(0)).toSet
    assert(dups == Set(4L, 5L, 6L))
  }
}
