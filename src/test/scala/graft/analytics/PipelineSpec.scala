package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("bpeMerges learns frequency-weighted merges with deterministic ties") {
    import spark.implicits._
    // "banana" x3 + "bandana" x1 + "ab" x2; non-[a-z] words contribute no
    // symbols. The repeated-pair word pins the merge rule: the literal
    // replace consumes the separator, so in ' b a n a n a ' only the FIRST
    // ' a n ' merges per scan (greedy non-overlapping — the exact rule the
    // DuckDB oracle replays).
    val docs = Seq(
      "banana banana banana bandana",
      "ab ab Zz 7x"
    ).toDF("text")
    val got = Pipeline.bpeMerges(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 1: (a,n) = 2x3 (banana) + 2 (bandana) = 8; beats (n,a) = 7.
    assert(got(0) == (1L, "a", "n", 8L))
    // banana -> ' b an a n a ', bandana -> ' b an d an a '.
    // round 2: (an,a) = 3+1 ties (b,an) = 3+1; 'an' < 'b' -> (an,a) wins.
    assert(got(1) == (2L, "an", "a", 4L))
    // banana -> ' b ana n a ', bandana -> ' b an d ana '.
    // round 3: (ana,n) = 3 ties (b,ana) = 3 and (n,a) = 3; 'ana' smallest.
    assert(got(2) == (3L, "ana", "n", 3L))
  }
}
