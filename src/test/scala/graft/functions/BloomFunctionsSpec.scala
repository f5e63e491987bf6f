package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The law p13 rests on: a Bloom filter NEVER false-negatives, so
  * probe-then-exact-confirm returns exactly the unfiltered result.
  */
class BloomFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("every member passes the probe; most non-members are pruned") {
    val members = (0 until 1000).map(i => s"member_$i").toDF("s")
    val blob = members
      .agg(BloomFunctions.bloomAgg(xxhash64($"s"), 1000L, 16000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // zero false negatives — the correctness half
    val passed = members
      .filter(BloomFunctions.mightContain(lit(blob), xxhash64($"s"))).count()
    assert(passed == 1000L)
    // false positives bounded — the efficiency half (16 bits/item keeps the
    // rate well under 1%; assert a loose 5% so the test is not flaky-tight)
    val others = (0 until 10000).map(i => s"other_$i").toDF("s")
    val fp = others
      .filter(BloomFunctions.mightContain(lit(blob), xxhash64($"s"))).count()
    assert(fp < 500L, s"false-positive rate too high: $fp / 10000")
  }
}
