package graft.analytics

import graft.TestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Self-oracle for the r1–r6 redis CORRECTNESS queries at sf0.001: each
  * query's result must equal the same aggregate computed directly from the
  * parquet events table — the in-Spark twin of the driver's DuckDB
  * hash-compare, so a wire-path bug fails here before the round gate.
  */
class RedisOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def assertSame(name: String, expected: DataFrame): Unit = {
    val got = RedisTransport.queries(name)(spark, dir)
    assert(got.columns.sorted.toSeq == expected.columns.sorted.toSeq,
      s"$name schema")
    assert(canon(got) == canon(expected), s"$name values")
  }

  private def t = Tables(spark, dir)

  private def direct(withDistinct: Boolean): DataFrame =
    Transport.aggregate(Transport.envelopeOf(t), withDistinct)

  test("r1 roundtrip equals the direct events aggregate") {
    assertSame("r1_redis_roundtrip", direct(withDistinct = true))
  }

  test("r2 latest-anchoring delivers exactly one post-anchor copy") {
    assertSame("r2_redis_latest", direct(withDistinct = false))
  }

  test("r3 round-robin sharding lands event i on shard i % 3") {
    val expected = t.events.groupBy(pmod(col("event_id"), lit(3)).as("shard_id"))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_event_id"),
        lit(0L).as("misrouted"))
    assertSame("r3_redis_sharding", expected)
  }

  test("r4 seek delivers exactly timestamp > midpoint, pushed into XRANGE") {
    val bounds = t.events
      .agg(min(unix_millis(col("ts"))).as("lo"),
        max(unix_millis(col("ts"))).as("hi")).head()
    val cutoff = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val expected = Transport.aggregate(
      Transport.envelopeOf(t).filter(unix_millis(col("timestamp")) > cutoff),
      withDistinct = false)
    assertSame("r4_redis_seek", expected)
  }

  test("r5 capped drain loses and duplicates nothing across batch seams") {
    assertSame("r5_redis_admission", direct(withDistinct = false))
  }

  test("r6 group recovery re-delivers the dead consumer's slice") {
    assertSame("r6_redis_group_recovery", direct(withDistinct = false))
  }

  test("r7 ss->redis relay preserves the envelope across the hop") {
    assertSame("r7_relay", direct(withDistinct = true))
  }
}
