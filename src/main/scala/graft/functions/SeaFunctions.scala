package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar/utility functions of the engine (SURVEY §2.7) as codegen-friendly
  * column expressions — no UDFs on the hot path.
  */
object SeaFunctions {

  /** Redis entry-id packing: one SeqNo = `(timestamp_ms << 16) | sub_seq`
    * (sea-streamer-redis/src/message.rs:7-11,27-88 — replicated exactly;
    * sub_seq saturates at 16 bits by construction in Redis).
    */
  def redisSeqNo(timestampMs: Column, subSeq: Column): Column =
    shiftleft(timestampMs, 16).bitwiseOR(subSeq.bitwiseAND(lit(0xFFFFL)))

  /** Inverse: (timestamp_ms, sub_seq) from a packed SeqNo. */
  def redisTimestampMs(seqNo: Column): Column = shiftright(seqNo, 16)
  def redisSubSeq(seqNo: Column): Column = seqNo.bitwiseAND(lit(0xFFFFL))

  /** Redis entry-id string `"<ms>-<seq>"` from the packed SeqNo. */
  def redisStreamId(seqNo: Column): Column =
    concat(redisTimestampMs(seqNo).cast("string"), lit("-"),
      redisSubSeq(seqNo).cast("string"))

  /** The `wide-seq-no` (u128) packing (sea-streamer-types/src/stream.rs:
    * 29-32): with nanosecond timestamps the redis packing
    * `(ts << 16) | sub_seq` (message.rs:27-60) needs ~76 bits, past LONG.
    * Spark's mapping is DECIMAL(38,0) — 38 digits cover u128's 39-digit
    * range up to 10^38, far beyond the reference's own 2554-07-21 ceiling
    * (ns ts < 2^64), and the packing stays ORDER-PRESERVING under decimal
    * comparison, which is what seek/rewind laws sort by.
    */
  def redisWideSeqNo(timestampNanos: Column, subSeq: Column): Column =
    (timestampNanos.cast("decimal(38,0)") * lit(65536L) +
      subSeq.bitwiseAND(lit(0xFFFFL))).cast("decimal(38,0)")

  /** Inverse: nanosecond timestamp (LONG — i64 nanos reach 2262, Spark's
    * own TimestampType ceiling is µs of the same order) and sub-seq.
    */
  def redisWideTimestampNanos(wideSeqNo: Column): Column =
    floor(wideSeqNo / lit(65536L)).cast("long")
  def redisWideSubSeq(wideSeqNo: Column): Column =
    pmod(wideSeqNo, lit(65536L)).cast("long")

  /** Redis entry-id string for the wide packing (`"<ns>-<seq>"`). */
  def redisWideStreamId(wideSeqNo: Column): Column =
    concat(redisWideTimestampNanos(wideSeqNo).cast("string"), lit("-"),
      redisWideSubSeq(wideSeqNo).cast("string"))

  /** Canonical timestamp display format
    * `[year]-[month]-[day]T[hour]:[minute]:[second].[subsecond]`
    * (sea-streamer-types/src/stream.rs:13-14).
    */
  def formatTimestamp(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** Parse the canonical format back to a timestamp. */
  def parseTimestamp(s: Column): Column =
    to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** Stream-key validity `[a-zA-Z0-9._-]{1,249}` (stream.rs:89-97). */
  def isValidStreamKey(key: Column): Column =
    key.rlike("^[a-zA-Z0-9._-]{1,249}$")

  /** Payload JSON projection (message.rs:323-328 → `from_json`). */
  def payloadJson(payload: Column, ddlSchema: String): Column =
    from_json(payload.cast("string"),
      org.apache.spark.sql.types.StructType.fromDDL(ddlSchema))

  /** Payload as validated UTF-8 (BytesOrStr law, message.rs:254-259). */
  def payloadUtf8(payload: Column): Column = payload.cast("string")

  /** CRC16/CDMA2000 of a binary column (the `.ss` checksum) — a native
    * codegen'd Catalyst expression, see [[Crc16]].
    */
  def crc16(payload: Column): Column = Crc16.crc16(payload)
}
