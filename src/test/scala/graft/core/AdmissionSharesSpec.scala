package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Laws of the proportional admission split shared by the iggy and kafka
  * micro-batch streams.
  */
class AdmissionSharesSpec extends AnyFunSuite {

  private def lags(xs: (String, Long)*): Map[String, Long] = xs.toMap

  test("whole backlog within budget passes through unchanged") {
    val l = lags("a" -> 3, "b" -> 7)
    assert(AdmissionShares.proportional(l, 10) == l)
    assert(AdmissionShares.proportional(l, 100) == l)
  }

  test("shares are proportional, never exceed the budget, never a lag") {
    val l = lags("a" -> 1000, "b" -> 100, "c" -> 10)
    val s = AdmissionShares.proportional(l, 100)
    assert(s.values.sum <= 100)
    assert(s.forall { case (k, v) => v <= l(k) })
    assert(s("a") > s("b") && s("b") >= s("c"))
  }

  test("zero-share partitions get bumped before hot siblings take all") {
    // 50 tiny partitions + one monster; budget 10: flooring gives the
    // monster ~9 and every tiny partition 0 — the bumps must serve tinies
    val l = (1 to 50).map(i => s"p$i" -> 1L).toMap + ("hot" -> 10000L)
    val s = AdmissionShares.proportional(l, 10)
    assert(s.values.sum <= 10)
    assert(s.count { case (k, v) => k != "hot" && v > 0 } > 0,
      "small partitions starved")
  }

  test("the flooring remainder is not silently dropped (ADVICE fix)") {
    // lags where remainder > zero-share count: total=10, budget=9 →
    // floored = 9*6/10=5, 9*4/10=3 (sum 8), no zeros, rem=1 → one bump
    val l = lags("a" -> 6, "b" -> 4)
    val s = AdmissionShares.proportional(l, 9)
    assert(s.values.sum == 9, s"budget undershoot: $s")
    assert(s.forall { case (k, v) => v <= l(k) })
  }

  test("no share ever exceeds its partition's lag") {
    val l = lags("a" -> 1, "b" -> 9)
    val s = AdmissionShares.proportional(l, 5)
    assert(s.values.sum <= 5 && s("a") <= 1L && s("b") <= 9L)
  }
}
