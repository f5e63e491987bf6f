package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the folded greedy-MMR selection (VERDICT r12 #3): mmrGreedy
  * collapses the former three unrolled join-rounds into one local pass
  * over the bounded pool, and must reproduce their semantics EXACTLY —
  * including the inner-join edge cases the unrolled form encoded
  * implicitly. The oracle gate (s13's SQL replays the unrolled rounds)
  * pins the real-corpus math; this spec pins the shape-edge behavior a
  * corpus fixture may never exercise.
  */
class MmrFoldSpec extends AnyFunSuite {

  /** Straight-line reference: the unrolled rounds' semantics re-stated
    * independently (argmax by (score desc, cid asc); round r scores
    * cosine − 0.5·max sim-to-selected; candidates without a sim row to
    * any selected member drop — the inner join).
    */
  private def reference(items: Seq[(Long, Double)],
      sims: Seq[(Long, Long, Double)], k: Int)
      : Seq[(Long, Double, Double, Long)] = {
    var selected = List.empty[(Long, Double, Double, Long)]
    for (rank <- 1 to k) {
      val cands: Seq[(Long, Double, Double)] =
        if (rank == 1) items.map { case (c, cos) => (c, cos, cos) }
        else {
          val sel = selected.map(_._1).toSet
          items.filterNot(i => sel.contains(i._1)).flatMap { case (c, cos) =>
            val ss = sims.collect {
              case (ca, cb, s) if ca == c && sel.contains(cb) => s }
            if (ss.isEmpty) None else Some((c, cos, cos - 0.5 * ss.max))
          }
        }
      if (cands.nonEmpty && selected.length == rank - 1) {
        val best = cands.minBy { case (c, _, sc) => (-sc, c) }
        selected = selected :+ ((best._1, best._2, best._3, rank.toLong))
      }
    }
    selected
  }

  test("fold equals the unrolled-round reference on randomized pools") {
    val rng = new scala.util.Random(20260815L)
    for (trial <- 0 until 200) {
      val n = 1 + rng.nextInt(12)
      val items = (0 until n)
        .map(i => (i.toLong, math.rint(rng.nextDouble() * 1e6) / 1e6))
      // full pairwise sims (the real pool shape), occasionally sparse to
      // exercise the inner-join drop
      val dense = rng.nextBoolean()
      val sims = for {
        (a, _) <- items; (b, _) <- items if a != b
        if dense || rng.nextInt(3) > 0
      } yield (a, b, math.rint(rng.nextDouble() * 1e6) / 1e6)
      val got = Similarity.mmrGreedy(items, sims)
      val want = reference(items, sims, 3)
      assert(got == want, s"trial $trial: fold $got != reference $want")
    }
  }

  test("singleton pool selects once; empty pool selects nothing") {
    assert(Similarity.mmrGreedy(Seq((7L, 0.9)), Nil) ==
      Seq((7L, 0.9, 0.9, 1L)))
    assert(Similarity.mmrGreedy(Nil, Nil).isEmpty)
  }

  test("ties break toward the smaller cid at every round") {
    // two identical cosines: round 1 must take the smaller cid
    val items = Seq((5L, 0.8), (2L, 0.8), (9L, 0.1))
    val sims = for ((a, _) <- items; (b, _) <- items if a != b)
      yield (a, b, 0.0)
    val got = Similarity.mmrGreedy(items, sims)
    assert(got.head._1 == 2L)
    assert(got(1)._1 == 5L) // equal scores again (sims all zero)
    assert(got(2)._1 == 9L)
  }

  test("selection diversifies: a redundant second-best loses to a less " +
      "redundant third") {
    // c1 wins round 1; c2 has higher cosine than c3 but sim 1.0 to c1
    // (score 0.9-0.5=0.4) while c3 is orthogonal (score 0.5-0=0.5)
    val items = Seq((1L, 1.0), (2L, 0.9), (3L, 0.5))
    val sims = Seq(
      (2L, 1L, 1.0), (1L, 2L, 1.0), (3L, 1L, 0.0), (1L, 3L, 0.0),
      (2L, 3L, 0.0), (3L, 2L, 0.0))
    val got = Similarity.mmrGreedy(items, sims)
    assert(got.map(_._1) == Seq(1L, 3L, 2L))
  }
}
