package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, decoded/feature-extracted in distributed batches.
  *
  * The DECODE ITSELF IS A STUB — this container has no image/audio codecs, so
  * [[FakeDecoders]] derives deterministic pseudo-metadata from the bytes. The
  * Spark-side plumbing is real and what matters at 100 TB: binary columns
  * travel as Tungsten byte arrays; decode runs via `mapPartitions` on a typed
  * Dataset (one JVM call per partition, amortizing any native-codec init,
  * exactly where a JNI/FFI decoder would sit); output is a typed row, never a
  * driver-side collect.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      frames: Long,
      digest: String)

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build would replace `decodeImage` with the actual decode
    * (e.g. JNI to libjpeg / ffmpeg) without touching the plumbing.
    */
  object FakeDecoders {
    def decodeImage(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        width = n % 640 + 16,
        height = (n * 7) % 480 + 16,
        channels = 3,
        frames = n % 30 + 1,
        digest = md5Hex(bytes))
    }

    private def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"${b & 0xFF}%02x").mkString
  }

  /** The batch-decode operator: one decoder invocation pipeline per
    * partition (the shape a vectorized/native decoder needs).
    */
  def decodeBatch(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (codec contexts, model handles)
      batch.map(r => FakeDecoders.decodeImage(r.doc_id, r.media))
    }
  }

  val queries: Map[String, Relational.Q] = Map(
    // Binary-column pipeline: documents.text bytes stand in for media blobs;
    // decode via mapPartitions; aggregate the extracted metadata.
    "m1_media_decode" -> { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRecord]
      decodeBatch(media).toDF()
        .groupBy((col("n_bytes") % 10).as("bytes_mod"))
        .agg(count(lit(1)).as("n"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          max(col("frames")).as("max_frames"),
          countDistinct(col("digest")).as("n_digests"))
    })

  val oracles: Map[String, String] = Map(
    // Oracle reproduces the deterministic fake decode from the byte length
    // (text is ASCII here, so n_bytes == length(text)).
    "m1_media_decode" ->
      """WITH meta AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |    length(text) % 640 + 16 AS width,
        |    (length(text) * 7) % 480 + 16 AS height,
        |    length(text) % 30 + 1 AS frames,
        |    md5(text) AS digest
        |  FROM documents)
        |SELECT n_bytes % 10 AS bytes_mod, COUNT(*) AS n,
        |  CAST(SUM(width) AS BIGINT) AS sum_width,
        |  CAST(SUM(height) AS BIGINT) AS sum_height,
        |  CAST(MAX(frames) AS BIGINT) AS max_frames,
        |  COUNT(DISTINCT digest) AS n_digests
        |FROM meta GROUP BY 1""".stripMargin)
}
