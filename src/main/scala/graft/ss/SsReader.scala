package graft.ss

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.ByteBuffer
import java.nio.channels.{Channels, FileChannel}
import java.nio.file.{Paths, StandardOpenOption}

import graft.core.{Envelope, SeaMessage}
import graft.ss.SsFormat._

/** One decoded frame plus its byte extent in the file. */
final case class SsRecord(
    message: SeaMessage,
    checksum: Int,
    startOffset: Long,
    endOffset: Long)

/** Demuxing `.ss` reader: yields message frames, transparently consuming the
  * Beacon interleaved at every `beaconInterval` boundary — including beacons
  * that land mid-frame (spliced messages, format.rs:34-37).
  *
  * Can start either at the header or at the N-th beacon boundary
  * ([[SsReader.openAt]]); in the latter case the partial spliced message
  * under the beacon is skipped exactly like the reference's rewind
  * (sea-streamer-file/src/messages.rs:144-173) — this is what makes the file
  * SPLITTABLE for parallel scan: split k reads messages whose frame *starts*
  * in [beacon_k, beacon_k+stride).
  */
final class SsReader private[ss] (
    in: InputStream,
    val header: SsHeader,
    startOffset: Long,
    verifyChecksum: Boolean,
    /** Skip payload bytes (frames only carry header/extent) — for offset
      * walks. Incompatible with checksum verification.
      */
    skimPayload: Boolean = false,
    /** Surface `SEA_STREAMER_INTERNAL` control frames instead of hiding
      * them — the decoder utility prints every frame including the
      * terminating EOS, like the reference's ss-decode
      * (sea-streamer-file/src/bin/decoder.rs:66-137). EOS still ends the
      * scan: the frame is returned once, then `next()` yields None.
      */
    surfaceInternal: Boolean = false) extends AutoCloseable {

  private val interval: Long = header.beaconInterval.toLong
  private var offset: Long = startOffset
  private var eosSeen = false
  private var truncated = false
  private var lastBeaconVar: Option[Beacon] = None

  /** Raw reader: advances offset, no boundary interception (beacon bodies). */
  private val raw: ByteReader = new ByteReader {
    def readByte(): Int = {
      val b = in.read()
      if (b < 0) throw new EOFException
      offset += 1
      b
    }
  }

  /** Boundary-aware reader: consumes any beacon sitting at an interval
    * boundary before handing out the next message byte.
    */
  private val demux: ByteReader = new ByteReader {
    def readByte(): Int = {
      if (offset > 0 && offset % interval == 0) consumeBeacon()
      raw.readByte()
    }

    /** Bulk skip that still consumes beacons at interval boundaries. */
    override def skipFully(n: Int): Unit = {
      var remaining = n.toLong
      while (remaining > 0) {
        if (offset > 0 && offset % interval == 0) consumeBeacon()
        val chunk = math.min(remaining, interval - (offset % interval))
        var done = 0L
        while (done < chunk) {
          val s = in.skip(chunk - done)
          if (s > 0) { offset += s; done += s }
          else { raw.readByte(); done += 1 } // advances offset; EOF throws
        }
        remaining -= chunk
      }
    }
  }

  private def consumeBeacon(): Unit =
    lastBeaconVar = Some(decodeBeacon(raw))

  // Split start: drop the partial message spliced under the starting beacon.
  // Loop because a long frame can fully bridge an interval (rewind law,
  // messages.rs:144-173: skip min(remaining, interval - beaconSize)).
  locally {
    while (offset > 0 && offset % interval == 0 && !truncated) {
      try {
        val beacon = decodeBeacon(raw)
        lastBeaconVar = Some(beacon)
        val skip = math.min(
          beacon.remainingMessagesBytes.toLong,
          interval - beacon.size)
        raw.readFully(skip.toInt)
      } catch { case _: EOFException => truncated = true }
    }
  }

  def currentOffset: Long = offset
  def lastBeacon: Option[Beacon] = lastBeaconVar
  def isEos: Boolean = eosSeen
  def isTruncated: Boolean = truncated

  /** Next message frame, or None at EOF / EOS / truncated tail.
    * Internal control messages (EOS) terminate; other `SEA_STREAMER_INTERNAL`
    * messages are skipped (file/src consumers never surface them).
    */
  @annotation.tailrec
  def next(): Option[SsRecord] = {
    if (eosSeen || truncated) return None
    val start = offset
    val decoded =
      try {
        val (msg, storedCrc) = decodeMessage(demux, skimPayload)
        if (verifyChecksum && !skimPayload) {
          val computed = Crc16Cdma2000(
            if (msg.payload == null) Array.emptyByteArray else msg.payload)
          if (computed != storedCrc)
            throw ChecksumException(storedCrc, computed)
        }
        Some(SsRecord(msg, storedCrc, start, offset))
      } catch {
        case _: EOFException =>
          // clean EOF at frame start, or a truncated in-flight tail — both
          // end the scan (the tail becomes visible on the next micro-batch)
          truncated = offset != start
          None
      }
    decoded match {
      case Some(r) if r.message.stream_key == Envelope.SeaStreamerInternal =>
        if (r.message.payloadUtf8 == EosPayload) {
          eosSeen = true; eosStartVar = Some(r.startOffset)
          if (surfaceInternal) decoded else None
        } else if (surfaceInternal) decoded
        else next()
      case other => other
    }
  }

  private var eosStartVar: Option[Long] = None

  /** Byte offset where the terminating EOS frame starts (for append-mode
    * EOS truncation, messages.rs:420-515).
    */
  def eosStart: Option[Long] = eosStartVar

  def iterator: Iterator[SsRecord] =
    Iterator.continually(next()).takeWhile(_.isDefined).map(_.get)

  def close(): Unit = in.close()
}

object SsReader {

  /** Decode the beacon sitting at an exact interval boundary (split-pruning
    * support: the beacon's markers carry prefix-max seq/ts per stream).
    */
  def readBeaconAt(path: String, offset: Long): Option[Beacon] = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      if (offset >= ch.size()) return None
      ch.position(offset)
      val in = new BufferedInputStream(Channels.newInputStream(ch), 1 << 14)
      val r = new ByteReader {
        def readByte(): Int = {
          val b = in.read()
          if (b < 0) throw new EOFException
          b
        }
      }
      try Some(decodeBeacon(r))
      catch { case _: EOFException => None }
    } finally ch.close()
  }

  def readHeader(path: String): SsHeader = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(HeaderSize)
      var n = 0
      while (n < HeaderSize) {
        val r = ch.read(buf)
        if (r < 0) throw new EOFException(s"File shorter than header: $path")
        n += r
      }
      decodeHeader(buf.array())
    } finally ch.close()
  }

  /** Sequential read from the start of the data. */
  def open(path: String, verifyChecksum: Boolean = true, skim: Boolean = false,
      surfaceInternal: Boolean = false): SsReader =
    openAt(path, 0, verifyChecksum, skim, surfaceInternal)

  /** Positioned read from an exact byte offset that is known to be either a
    * frame start or a beacon boundary (used by the micro-batch stream's
    * frame-exact offsets). Offsets <= HeaderSize mean "from the header".
    */
  def openAtOffset(path: String, byteOffset: Long, verifyChecksum: Boolean = true,
      skim: Boolean = false): SsReader = {
    if (byteOffset <= HeaderSize) return open(path, verifyChecksum, skim)
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val buf = ByteBuffer.allocate(HeaderSize)
    var n = 0
    while (n < HeaderSize) {
      val r = ch.read(buf)
      if (r < 0) { ch.close(); throw new EOFException(s"File shorter than header: $path") }
      n += r
    }
    val header = decodeHeader(buf.array())
    ch.position(byteOffset)
    new SsReader(
      new BufferedInputStream(Channels.newInputStream(ch), 1 << 16),
      header, byteOffset, verifyChecksum, skim)
  }

  /** Positioned read from the N-th beacon boundary (0 = right after header). */
  def openAt(path: String, nthBeacon: Long, verifyChecksum: Boolean = true,
      skim: Boolean = false, surfaceInternal: Boolean = false): SsReader = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val buf = ByteBuffer.allocate(HeaderSize)
    var n = 0
    while (n < HeaderSize) {
      val r = ch.read(buf)
      if (r < 0) { ch.close(); throw new EOFException(s"File shorter than header: $path") }
      n += r
    }
    val header = decodeHeader(buf.array())
    val start =
      if (nthBeacon <= 0) HeaderSize.toLong
      else nthBeacon * header.beaconInterval.toLong
    ch.position(start)
    new SsReader(
      new BufferedInputStream(Channels.newInputStream(ch), 1 << 16),
      header, start, verifyChecksum, skim, surfaceInternal)
  }
}
