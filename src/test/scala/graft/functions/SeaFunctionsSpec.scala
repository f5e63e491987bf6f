package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeaFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("redis seqno packing law (ts<<16)|seq roundtrips") {
    // law from sea-streamer-redis/src/message.rs:27-88
    val df = Seq((1700000000123L, 7L), (0L, 0L), (1L, 65535L))
      .toDF("ts_ms", "sub")
      .withColumn("packed", SeaFunctions.redisSeqNo($"ts_ms", $"sub"))
      .withColumn("ts_back", SeaFunctions.redisTimestampMs($"packed"))
      .withColumn("sub_back", SeaFunctions.redisSubSeq($"packed"))
      .withColumn("id", SeaFunctions.redisStreamId($"packed"))
    val rows = df.as[(Long, Long, Long, Long, Long, String)].collect()
    rows.foreach { case (ts, sub, packed, tsBack, subBack, id) =>
      assert(packed == ((ts << 16) | (sub & 0xFFFF)))
      assert(tsBack == ts && subBack == sub)
      assert(id == s"$ts-$sub")
    }
  }

  test("wide-seq-no (u128 as DECIMAL(38,0)) packs past LONG and roundtrips") {
    // nanosecond timestamps × 2^16 exceed 64 bits (stream.rs:29-32 u128);
    // 2262-04-11T23:47 ns ≈ Long.MaxValue is the inverse's ceiling
    val df = Seq(
      (1700000000123456789L, 7L),      // a real ns timestamp
      (Long.MaxValue, 65535L),          // the extreme: packed ≈ 6.05e23
      (0L, 0L))
      .toDF("ts_ns", "sub")
      .withColumn("packed", SeaFunctions.redisWideSeqNo($"ts_ns", $"sub"))
      .withColumn("ts_back", SeaFunctions.redisWideTimestampNanos($"packed"))
      .withColumn("sub_back", SeaFunctions.redisWideSubSeq($"packed"))
      .withColumn("id", SeaFunctions.redisWideStreamId($"packed"))
    val rows = df.select($"ts_ns", $"sub", $"packed".cast("string"),
      $"ts_back", $"sub_back", $"id")
      .as[(Long, Long, String, Long, Long, String)].collect()
    rows.foreach { case (ts, sub, packed, tsBack, subBack, id) =>
      assert(tsBack == ts && subBack == sub, s"roundtrip ($ts, $sub)")
      assert(BigDecimal(packed) == BigDecimal(ts) * 65536 + sub)
      assert(id == s"$ts-$sub")
    }
    // the packed value genuinely exceeds LONG for ns timestamps
    assert(BigDecimal(rows(0)._3) > BigDecimal(Long.MaxValue))
    // order preservation: decimal comparison sorts like (ts, sub)
    val ordered = df.orderBy($"packed")
      .select($"ts_ns", $"sub").as[(Long, Long)].collect().toSeq
    assert(ordered == Seq((0L, 0L), (1700000000123456789L, 7L),
      (Long.MaxValue, 65535L)))
  }

  test("canonical timestamp format roundtrips") {
    val df = Seq("2022-01-02T03:04:05.678").toDF("s")
      .withColumn("ts", SeaFunctions.parseTimestamp($"s"))
      .withColumn("back", SeaFunctions.formatTimestamp($"ts"))
    assert(df.select("back").as[String].head() == "2022-01-02T03:04:05.678")
  }

  test("stream key validity column") {
    val df = Seq("ok-key.1", "bad key", "", "a" * 250).toDF("k")
      .withColumn("v", SeaFunctions.isValidStreamKey($"k"))
    assert(df.select("v").as[Boolean].collect().toSeq ==
      Seq(true, false, false, false))
  }

  test("crc16 column matches codec goldens") {
    val df = Seq("123456789", "hello, world").toDF("s")
      .withColumn("crc", SeaFunctions.crc16($"s".cast("binary")))
    assert(df.select("crc").as[Int].collect().toSeq == Seq(0x4C06, 0x8028))
  }

  test("payload json projection") {
    val df = Seq("""{"a": 1, "b": "x"}""").toDF("p")
      .withColumn("j", SeaFunctions.payloadJson($"p".cast("binary"), "a LONG, b STRING"))
    assert(df.select($"j.a", $"j.b").as[(Long, String)].head() == ((1L, "x")))
  }
}
