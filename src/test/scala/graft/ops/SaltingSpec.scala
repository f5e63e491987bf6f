package graft.ops

import graft.TestSession
import graft.functions.Crc16
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key carrying 90% of rows
    val big = (0 until 10000).map { i =>
      (if (i % 10 == 0) i.toLong else 42L, i.toLong)
    }.toDF("k", "v")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum($"v")).first()
    val salted = Salting.saltedJoin(big, small, "k", 8)
      .agg(count(lit(1)), sum($"v")).first()
    assert(plain == salted)
    // left join keeps unmatched big rows exactly once
    val plainL = big.join(small, Seq("k"), "left").count()
    val saltedL = Salting.saltedJoin(big, small, "k", 8, "left").count()
    assert(plainL == saltedL)
  }

  test("blockedPairJoin equals the plain join and splits the hot key") {
    // an LSH-bucket shape: one hot bucket with 200 members (19900 pairs on
    // ONE shuffle key unsalted), a few cold buckets
    val left = ((0 until 200).map(i => (i.toLong, 7L)) ++
      (200 until 230).map(i => (i.toLong, i.toLong % 3))).toDF("id_a", "bucket")
    val right = left.toDF("id_b", "bucket")
    val plain = left.join(right, Seq("bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Salting.blockedPairJoin(left, right, "bucket", 4)
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == plain)
    assert(plain.size >= 19900)
    // the split is real: the join keys carry the block ids, so the hot
    // bucket's work lands on blocks² shuffle keys instead of one
    val planned = Salting.blockedPairJoin(left, right, "bucket", 4)
      .queryExecution.executedPlan.toString
    assert(planned.contains("__bi") && planned.contains("__bj"),
      "block ids must be join keys")
    // block ids are content-derived (retry-stable), spread across [0, 4)
    val leftBlocks = left
      .withColumn("__bi", pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(4L)))
      .filter($"bucket" === 7L)
      .select(countDistinct($"__bi")).as[Long].head()
    assert(leftBlocks == 4L, "200 hot rows must cover all 4 blocks")
  }

  test("native crc16 expression matches goldens and registers for SQL") {
    val df = Seq("123456789", "hello, world").toDF("s")
      .withColumn("crc", Crc16.crc16($"s".cast("binary")))
    assert(df.select("crc").as[Int].collect().toSeq == Seq(0x4C06, 0x8028))
    Crc16.register(spark)
    val viaSql = spark.sql(
      "SELECT sea_crc16(CAST('123456789' AS BINARY)) AS c").as[Int].head()
    assert(viaSql == 0x4C06)
    // type guard
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT sea_crc16(1)").collect())
  }
}
