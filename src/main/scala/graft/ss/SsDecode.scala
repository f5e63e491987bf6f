package graft.ss

import java.io.PrintStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.charset.{CharacterCodingException, CodingErrorAction}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}

import graft.ops.StdioParser
import graft.ss.SsFormat.{Beacon, Marker, SsHeader}

/** `ss-decode` parity utility: dump a binary `.ss` container as plain text,
  * in the reference's two documented formats (README.md "Decoder" section;
  * sea-streamer-file/src/bin/decoder.rs).
  *
  * `log` format:
  * {{{
  * # {"file_name":"hello","created_at":"2023-06-05T13:55:00.0","beacon_interval":1024}
  * [2023-06-05T13:55:53.001 | hello | 1 | 0] message-1
  * # [{"header":{...},"running_checksum":41954}]
  * }}}
  *
  * `ndjson` format:
  * {{{
  * /* {"file_name":...} */
  * {"header":{"stream_key":"hello","shard_id":0,"sequence":1,"timestamp":"2023-06-05T13:55:53.001"},"payload":"message-1"}
  * /* [{"header":{...},"running_checksum":41954}] */
  * }}}
  *
  * Field shapes mirror the reference's serde output: the message header
  * serializes as `{stream_key, shard_id, sequence, timestamp}` with the
  * canonical `TIMESTAMP_FORMAT` string (sea-streamer-types/src/message.rs:361-386),
  * the file header as `{file_name, created_at, beacon_interval}`
  * (sea-streamer-file/src/format.rs:72-79), a beacon as the array of its
  * markers `{header, running_checksum}` with the checksum as a bare number
  * (format.rs:109-123, `Checksum` is a serde newtype). A UTF-8 payload that
  * parses as JSON embeds verbatim, a non-JSON string embeds as a JSON
  * string, binary embeds as a byte-number array; `--header-only` renders
  * `"payload":null` (decoder.rs:96-119). Internal control frames — the
  * terminating EOS included — print like any other message (decoder.rs:66).
  *
  * Like the reference, this is a sequential single-file inspection tool for
  * operators (pipe to `less`); the distributed scan path is the `ss` Spark
  * data source. Beacon parity note: when ONE frame spans several beacon
  * intervals, only the LAST crossed beacon prints — deliberate, because the
  * reference's `MessageSource` keeps a single most-recent beacon too
  * ("cleared rather than carry-over on each Beacon point",
  * sea-streamer-file/src/messages.rs:346-357) and its decoder checks it
  * once per message.
  */
object SsDecode {

  private val mapper = new ObjectMapper()
    .enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var format = "log"
    var headerOnly = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--file" if i + 1 < args.length => file = Some(args(i + 1)); i += 2
        case "--format" if i + 1 < args.length => format = args(i + 1); i += 2
        case "--header-only" => headerOnly = true; i += 1
        case flag @ ("--file" | "--format") =>
          System.err.println(s"missing value for $flag")
          System.err.println("usage: ss-decode --file <file> [--format log|ndjson] [--header-only]")
          sys.exit(2)
        case other =>
          System.err.println(s"unknown argument: $other")
          System.err.println("usage: ss-decode --file <file> [--format log|ndjson] [--header-only]")
          sys.exit(2)
      }
    }
    if (file.isEmpty) {
      System.err.println("usage: ss-decode --file <file> [--format log|ndjson] [--header-only]")
      sys.exit(2)
    }
    if (format != "log" && format != "ndjson") {
      System.err.println(s"Invalid Format: $format"); sys.exit(2)
    }
    decode(file.get, format, headerOnly, System.out)
  }

  /** Stream the decoded lines to `out`; testable seam for the golden spec. */
  def decode(path: String, format: String, headerOnly: Boolean,
      out: PrintStream): Unit = {
    val ndjson = format == "ndjson"
    def comment(json: String): Unit =
      out.println(if (ndjson) s"/* $json */" else s"# $json")

    val rdr = SsReader.open(path, surfaceInternal = true)
    try {
      comment(headerJson(rdr.header))
      var lastBeacon: AnyRef = null
      var done = false
      while (!done) rdr.next() match {
        case Some(rec) =>
          if (ndjson) out.println(messageNdjson(rec, headerOnly))
          else out.println(messageLog(rec, headerOnly))
          // a beacon consumed while decoding this frame prints after it,
          // exactly like the reference's per-message beacon check
          // (decoder.rs:121-137); object identity tracks "new beacon"
          val b = rdr.lastBeacon.orNull
          if ((b ne lastBeacon) && b != null) {
            lastBeacon = b
            comment(beaconJson(b))
          }
        case None =>
          if (rdr.isTruncated)
            System.err.println("The file might have been truncated.")
          done = true
      }
    } finally rdr.close()
  }

  // ---- line renderers ----------------------------------------------------

  private[ss] def messageLog(rec: SsRecord, headerOnly: Boolean): String = {
    val m = rec.message
    val head = s"[${StdioParser.formatTimestamp(m.timestamp)} | ${m.stream_key}" +
      s" | ${m.sequence} | ${m.shard_id}]"
    if (headerOnly) head
    else utf8(m.payload) match {
      case Some(s) => s"$head $s"
      case None => s"$head <BINARY BLOB>"
    }
  }

  private[ss] def messageNdjson(rec: SsRecord, headerOnly: Boolean): String = {
    val m = rec.message
    val payload =
      if (headerOnly) "null"
      else utf8(m.payload) match {
        case Some(s) =>
          // embed verbatim iff the payload is one complete JSON value,
          // else as a JSON string (decoder.rs:103-110). readTree of an
          // empty/whitespace-only input returns a MissingNode (which
          // would render as the literal `null`) instead of throwing —
          // those must take the string fallback like the reference's
          // failed serde parse
          try {
            val node = mapper.readTree(s)
            if (node == null || node.isMissingNode) jsonStr(s)
            else mapper.writeValueAsString(node)
          } catch { case _: Exception => jsonStr(s) }
        case None =>
          m.payload.map(b => (b & 0xFF).toString).mkString("[", ",", "]")
      }
    s"""{"header":${headerJson(m)},"payload":$payload}"""
  }

  private def headerJson(m: graft.core.SeaMessage): String =
    s"""{"stream_key":${jsonStr(m.stream_key)},"shard_id":${m.shard_id},""" +
      s""""sequence":${m.sequence},"timestamp":${jsonStr(
        StdioParser.formatTimestamp(m.timestamp))}}"""

  private[ss] def headerJson(h: SsHeader): String =
    s"""{"file_name":${jsonStr(h.fileName)},"created_at":${jsonStr(
      StdioParser.formatTimestamp(new java.sql.Timestamp(h.createdAtMillis)))},""" +
      s""""beacon_interval":${h.beaconInterval}}"""

  private[ss] def beaconJson(b: Beacon): String =
    b.items.map(markerJson).mkString("[", ",", "]")

  /** A beacon marker carries the per-(stream, shard) max header so far; the
    * reference serializes it as a full `MessageHeader` (format.rs:109-114).
    */
  private def markerJson(m: Marker): String =
    s"""{"header":{"stream_key":${jsonStr(m.streamKey)},"shard_id":${m.shardId},""" +
      s""""sequence":${m.maxSeqNo},"timestamp":${jsonStr(StdioParser.formatTimestamp(
        new java.sql.Timestamp(m.maxTimestampMillis)))}},""" +
      s""""running_checksum":${m.runningChecksum}}"""

  /** Strict UTF-8 decode (malformed bytes ⇒ None), mirroring the
    * reference's `as_str()` fallibility (message.rs:254-259).
    */
  private def utf8(bytes: Array[Byte]): Option[String] = {
    if (bytes == null) return Some("")
    val dec = UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  private def jsonStr(s: String): String = graft.core.JsonText.quote(s)
}
