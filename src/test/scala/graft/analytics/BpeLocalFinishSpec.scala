package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** The BPE local-finish law: the driver-local merge loop and the
  * distributed fallback must train IDENTICAL merge tables and final
  * segmentations — same pair cap, same (count desc, x, y) argmax, same
  * canonical leftmost non-overlapping merge fold. The oracle replays
  * whichever path ran, so any divergence between them would make
  * correctness depend on vocab size.
  */
class BpeLocalFinishSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("local finish trains the same merges and vocab as the distributed rounds") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown cat naps under the warm sun",
      "pack my box with five dozen liquor jugs",
      "the five boxing wizards jump quickly",
      "a a an ana anan banana bandana",
      "Mixed CASE and punct! are filtered out entirely",
      "repeat repeat repeat repeat repeat"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t.toLowerCase
      .replaceAll("[^a-z ]", "")) }.toDF("doc_id", "text")
    val (localMerges, localVocab) =
      Pipeline.bpeTrain(docs, rounds = 8) // default cap → local finish
    val (distMerges, distVocab) =
      Pipeline.bpeTrain(docs, rounds = 8, localCap = -1L) // force distributed
    assert(localMerges == distMerges)
    val l = localVocab.orderBy("word").as[(String, Long, String)].collect()
    val d = distVocab.orderBy("word").as[(String, Long, String)].collect()
    assert(l.toSeq == d.toSeq)
    // sanity: training actually merged something frequency-weighted
    assert(localMerges.length == 8 && localMerges.head._4 >= 2L)
  }

  test("merge application is canonical leftmost non-overlapping") {
    import Pipeline.mergeCanonical
    // alternating run: every occurrence merges in one round (the old
    // literal replace skipped alternate ones — the declared divergence
    // this fold closed)
    assert(mergeCanonical(" a n a n a ", "a", "n") == " an an a ")
    // same-symbol run: leftmost-greedy pairs, trailing odd symbol stays
    assert(mergeCanonical(" a a a a a ", "a", "a") == " aa aa a ")
    // a just-merged xy never re-matches as x (non-overlap)
    assert(mergeCanonical(" a b b ", "a", "b") == " ab b ")
    // the space guard: a symbol merely ENDING in x is not x
    assert(mergeCanonical(" ca b ", "a", "b") == " ca b ")
    // and the distributed aggregate() fold implements the identical rule
    // on EVERY edge case, each with the merge pair that exercises it —
    // the SQL CASE is the path that runs at scale, so every guard
    // (non-overlap, space boundary, same-symbol run) must be pinned there
    val spark2 = TestSession.spark
    import spark2.implicits._
    val cases = Seq(
      (" a n a n a ", "a", "n"),
      (" a a a a a ", "a", "a"),
      (" a b b ", "a", "b"),
      (" ca b ", "a", "b"))
    cases.foreach { case (seg, x, y) =>
      val sql = Seq(seg).toDF("s").selectExpr(
          s"concat(aggregate(split(trim(s), ' '), '', (acc, t) -> " +
            s"CASE WHEN t = '$y' AND endswith(acc, ' $x') " +
            s"THEN concat(acc, t) ELSE concat(acc, ' ', t) END), ' ') AS m")
        .as[String].head()
      assert(sql == mergeCanonical(seg, x, y),
        s"SQL fold diverges from mergeCanonical on '$seg' with ($x,$y)")
    }
  }

  test("ties break by (x, y) identically on both paths") {
    import spark.implicits._
    // every pair occurs exactly once per word → all counts tie; the argmax
    // must pick the lexicographically smallest (x, y) on both paths
    val docs = Seq((0L, "zy xw vu ts")).toDF("doc_id", "text")
    val (lm, _) = Pipeline.bpeTrain(docs, rounds = 3)
    val (dm, _) = Pipeline.bpeTrain(docs, rounds = 3, localCap = -1L)
    assert(lm == dm)
    assert(lm.map(m => (m._2, m._3)) == Seq(("t", "s"), ("v", "u"), ("x", "w")))
  }
}
