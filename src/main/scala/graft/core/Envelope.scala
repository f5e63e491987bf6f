package graft.core

import org.apache.spark.sql.types._

/** The engine's single data abstraction: a keyed, sharded, sequenced message.
  *
  * Mirrors the reference envelope `MessageHeader {stream_key, shard_id,
  * sequence, timestamp}` + opaque payload
  * (sea-streamer-types/src/message.rs:41-48), deliberately congruent with
  * Spark's Kafka source schema so relational code treats transport rows
  * uniformly.
  */
final case class SeaMessage(
    stream_key: String,
    shard_id: Long,
    sequence: Long,
    timestamp: java.sql.Timestamp,
    payload: Array[Byte]) {

  /** (StreamKey, ShardId, SeqNo) uniquely identifies a message
    * (sea-streamer-types/src/message.rs:87-90).
    */
  def identifier: (String, Long, Long) = (stream_key, shard_id, sequence)

  def payloadUtf8: String = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
}

object Envelope {
  /** Fixed envelope schema for every source/sink DataFrame. */
  val schema: StructType = StructType(Seq(
    StructField("stream_key", StringType, nullable = false),
    StructField("shard_id", LongType, nullable = false),
    StructField("sequence", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Max stream-key length (sea-streamer-types/src/stream.rs:7). */
  val MaxStreamKeyLen = 249

  /** Reserved control stream (stream.rs:10). */
  val SeaStreamerInternal = "SEA_STREAMER_INTERNAL"

  /** Subscribe-all wildcard (sea-streamer-file/src/lib.rs:96-97). */
  val SeaStreamerWildcard = "*"

  /** Key validation `[a-zA-Z0-9._-]{0,249}` (stream.rs:89-97 — note the
    * reference accepts the empty string here; emptiness is checked at the
    * consumer API layer as StreamKeyEmpty).
    */
  def isValidStreamKey(s: String): Boolean =
    s.length <= MaxStreamKeyLen && s.forall(isValidStreamKeyChar)

  def isValidStreamKeyChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'

  def validateStreamKey(s: String): Either[SeaStreamErr, String] =
    if (isValidStreamKey(s)) Right(s)
    else Left(SeaStreamErr.InvalidStreamKey(s))

  /** Stream position (stream.rs:34-40). */
  sealed trait SeqPos
  object SeqPos {
    case object Beginning extends SeqPos
    case object End extends SeqPos
    final case class At(seqNo: Long) extends SeqPos
  }
}
