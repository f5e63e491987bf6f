package graft.ops

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Envelope

/** Parser for the stdio transport's meta-prefixed lines
  * (`[ts | key | seq | shard] payload`), grammar pinned by the reference's
  * tests (sea-streamer-stdio/src/parser.rs:31-110,112-249):
  *
  *   - no `[...]` prefix → whole line is payload, timestamp defaults to now;
  *   - parts are position-flexible: a timestamp may only be first; a stream
  *     key may follow; seq then shard only after a key;
  *   - unparseable part → error (`Unknown`), `[ ]` included.
  */
object StdioParser {

  final case class PartialHeader(
      timestamp: Option[java.sql.Timestamp],
      streamKey: Option[String],
      sequence: Option[Long],
      shardId: Option[Long])

  sealed trait ParseErr
  object ParseErr {
    case object Empty extends ParseErr
    final case class Unknown(part: String) extends ParseErr
  }

  // [year]-[month]-[day]T[hour]:[minute]:[second] with optional subseconds
  private val SubsecFormat: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendPattern("uuuu-MM-dd'T'HH:mm:ss")
    .appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true)
    .toFormatter
  private val PlainFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss")

  private def parseTimestamp(s: String): Option[java.sql.Timestamp] =
    Try(LocalDateTime.parse(s, SubsecFormat))
      .orElse(Try(LocalDateTime.parse(s, PlainFormat)))
      .toOption
      .map(dt => new java.sql.Timestamp(dt.toInstant(ZoneOffset.UTC).toEpochMilli))

  private def isStreamKey(s: String): Boolean =
    s.nonEmpty && s.length <= Envelope.MaxStreamKeyLen &&
      s.forall(Envelope.isValidStreamKeyChar)

  /** Returns (header, payload) or an error. `now` is injected for
    * determinism (the reference stamps `Timestamp::now_utc()`).
    */
  def parseMeta(
      input: String,
      now: () => java.sql.Timestamp = () =>
        new java.sql.Timestamp(System.currentTimeMillis())
  ): Either[ParseErr, (PartialHeader, String)] = {
    val empty = PartialHeader(None, None, None, None)
    if (!input.startsWith("[")) return Right((empty.copy(timestamp = Some(now())), input))
    val close = input.indexOf(']')
    if (close <= 1) {
      // nom's is_not("]") needs >= 1 char inside; '[]' or no ']' → raw line
      return Right((empty.copy(timestamp = Some(now())), input))
    }
    val raw = input.substring(1, close)
    val payload = input.substring(close + 1).trim
    var meta = empty
    for (part <- raw.split('|').map(_.trim)) {
      var parsed = false
      if (meta == empty) {
        parseTimestamp(part) match {
          case Some(ts) => meta = meta.copy(timestamp = Some(ts)); parsed = true
          case None => ()
        }
      }
      if (!parsed && meta.streamKey.isEmpty && isStreamKey(part)) {
        meta = meta.copy(streamKey = Some(part)); parsed = true
      }
      if (!parsed && meta.streamKey.isDefined && meta.sequence.isEmpty &&
        meta.shardId.isEmpty && Try(part.toLong).isSuccess) {
        meta = meta.copy(sequence = Some(part.toLong)); parsed = true
      }
      if (!parsed && meta.streamKey.isDefined && meta.sequence.isDefined &&
        meta.shardId.isEmpty && Try(part.toLong).isSuccess) {
        meta = meta.copy(shardId = Some(part.toLong)); parsed = true
      }
      if (!parsed) return Left(ParseErr.Unknown(part))
    }
    if (meta == empty) Left(ParseErr.Empty)
    else Right((meta, payload))
  }

  /** Formats an envelope row the way the stdio producer prints
    * (`[ts | stream | seq] payload`, sea-streamer-stdio/src/producer.rs).
    */
  def formatLine(ts: java.sql.Timestamp, key: String, seq: Long, payload: String): String =
    s"[${formatTimestamp(ts)} | $key | $seq] $payload"

  /** Canonical `TIMESTAMP_FORMAT` rendering (sea-streamer-types/src/stream.rs:13-14):
    * `[year]-[month]-[day]T[hour]:[minute]:[second].[subsecond]` with
    * minimal subsecond digits (at least one) — `53.001`, `53.1`, `53.0`.
    * Shared by the stdio producer lines and the `ss-decode` utility.
    */
  def formatTimestamp(ts: java.sql.Timestamp): String = {
    // ofInstant handles pre-epoch times (a truncating div/mod would produce
    // a negative nano-of-second and throw)
    val dt = LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts.getTime), ZoneOffset.UTC)
    dt.format(SubsecFormat)
  }

  /** DataFrame form: text lines (column `value`) → envelope columns.
    * Defaults mirror the stdio consumer: absent ts → now, absent key →
    * the literal `broadcast` stream, absent shard → 0. Absent seq is filled per key in
    * (timestamp, payload-hash) order — a CONTENT-derived key, NOT arrival
    * order: a DataFrame has no stable row order, and the
    * monotonically_increasing_id that would approximate arrival differs
    * across stage retries, assigning different sequences on a replayed task
    * than parts other tasks already committed. Lines that share a
    * timestamp (or carry none) therefore order by payload hash; byte-equal
    * duplicate lines tie and their relative order is unspecified.
    * Parsing is a scala closure (string-heavy, not worth a codegen
    * Expression).
    */
  def toEnvelope(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val parsed = lines.select(col("value")).as[String].map { line =>
      parseMeta(line) match {
        case Right((h, payload)) =>
          (h.timestamp, h.streamKey, h.sequence, h.shardId, payload, true)
        case Left(_) =>
          (None: Option[java.sql.Timestamp], None: Option[String],
            None: Option[Long], None: Option[Long], line, false)
      }
    }.toDF("ts", "key", "seq", "shard", "payload", "ok")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("arrival"))
    parsed
      .filter(col("ok"))
      .withColumn("arrival",
        struct(col("ts"), xxhash64(col("payload"))))
      .select(
        // keyless lines are the literal `broadcast` stream (lib.rs:60) —
        // same envelope the live stdio-lines source emits, so a line file
        // parses identically whether tailed or replayed
        coalesce(col("key"), lit("broadcast")).as("stream_key"),
        coalesce(col("shard"), lit(0L)).as("shard_id"),
        coalesce(col("seq"),
          (row_number().over(w) - 1).cast("long")).as("sequence"),
        coalesce(col("ts"), current_timestamp()).as("timestamp"),
        col("payload").cast("binary").as("payload"))
  }
}
