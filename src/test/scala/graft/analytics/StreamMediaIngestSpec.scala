package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** t24_stream_media_ingest laws (the m1→t24 batch≡streaming pair): media
  * bytes ride the envelope's binary payload, each micro-batch decodes
  * with the real codecs, and the end-of-log aggregate equals the batch
  * decode bit-for-bit — across genuine micro-batch boundaries with zero
  * streaming state. The gate half: a corrupt object fails the decode
  * LOUDLY at ingest (typed error through the streaming query), never a
  * silent skip into a training shard.
  */
class StreamMediaIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("t24 ingest decode == m1 batch decode, multi-batch, zero state") {
    var batches = 0
    var stateRows = -1L
    val out = Transport.t24MediaIngestStream(spark, dir, q => {
      batches = q.recentProgress.count(_.numInputRows > 0)
      stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    })
    val streamRows = out.orderBy("kind").collect().map(_.toSeq).toSeq
    val batchRows = Multimodal.queries("m1_media_decode")(spark, dir)
      .orderBy("kind").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t24 returned no rows")
    assert(streamRows == batchRows,
      "ingest-time decode diverged from the batch decode")
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    assert(stateRows == 0L,
      s"the stateless decode stage held $stateRows state rows")
  }

  test("a corrupt media object fails the ingest gate loudly, not silently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val log = java.nio.file.Files.createTempDirectory("t24corrupt").toString
    // one valid PNG and one corrupted copy (magic intact, body flipped —
    // the decoder must notice, not misparse)
    val good = Multimodal.synthesize(2L) // even id → PNG
    val bad = good.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x7f).toByte
    Seq((0L, good), (1L, bad))
      .toDF("sequence", "payload")
      .select(lit("media").as("stream_key"), lit(0L).as("shard_id"),
        col("sequence"), lit(new java.sql.Timestamp(0L)).as("timestamp"),
        col("payload"))
      .write.format("ss").mode("overwrite").save(log)
    val q = spark.readStream.format("ss").load(log)
      .select(col("sequence").as("doc_id"), col("payload"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: java.lang.Long) =>
        val media = b.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) => Multimodal.MediaRecord(id, bytes) }
        Multimodal.decodeBatch(media).toDF().count(): Unit
      }.start()
    val e = intercept[Exception] {
      q.processAllAvailable()
      // surface the terminated query's exception deterministically
      q.awaitTermination(10000)
    }
    q.stop()
    assert(e.getMessage != null)
  }
}
