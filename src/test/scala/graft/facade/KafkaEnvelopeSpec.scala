package graft.facade

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka envelope laws, broker-free: the consumer mapping is a pure
  * rename of Kafka's source schema and the producer mapping its inverse
  * (consumer.rs:591-618, producer.rs:100-135) — testable on hand-built
  * frames shaped exactly like the kafka source/sink contract.
  */
class KafkaEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("kafka source schema maps onto the envelope losslessly") {
    val kafkaShaped = Seq(
      ("orders", 3, 17L, new java.sql.Timestamp(1000L), "p1".getBytes, "k1".getBytes),
      ("orders", 0, 2L, new java.sql.Timestamp(2000L), "p2".getBytes, "k2".getBytes)
    ).toDF("topic", "partition", "offset", "timestamp", "value", "key")
    val env = SeaStreamer.kafkaToEnvelope(kafkaShaped)
    assert(env.columns.toSeq ==
      Seq("stream_key", "shard_id", "sequence", "timestamp", "payload"))
    val r = env.orderBy("sequence").as[(String, Long, Long, java.sql.Timestamp, Array[Byte])]
      .collect()
    assert(r(0)._1 == "orders" && r(0)._2 == 0L && r(0)._3 == 2L)
    assert(new String(r(1)._5) == "p1" && r(1)._2 == 3L)
  }

  test("producer mapping is the inverse: envelope -> kafka sink columns") {
    val env = Seq(("orders", 1L, 42L, new java.sql.Timestamp(1000L), "pay".getBytes))
      .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
    val k = SeaStreamer.envelopeToKafka(env)
    assert(k.columns.toSeq == Seq("topic", "value", "key"))
    val row = k.collect().head
    assert(row.getString(0) == "orders")
    assert(new String(row.getAs[Array[Byte]]("value")) == "pay")
    // record key = sequence as utf8 bytes (stable identity for compaction)
    assert(new String(row.getAs[Array[Byte]]("key")) == "42")
  }

  test("roundtrip: envelope -> kafka -> envelope preserves key fields") {
    val env = Seq(("s", 0L, 7L, new java.sql.Timestamp(1000L), "x".getBytes))
      .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
    val back = SeaStreamer.kafkaToEnvelope(
      SeaStreamer.envelopeToKafka(env)
        .withColumn("partition", lit(0))
        .withColumn("offset", lit(7L))
        .withColumn("timestamp", lit(new java.sql.Timestamp(1000L)))
        .withColumnRenamed("topic", "topic"))
    val r = back.collect().head
    assert(r.getString(0) == "s" && r.getLong(2) == 7L &&
      new String(r.getAs[Array[Byte]]("payload")) == "x")
  }
}
