package graft.ss

import java.io.OutputStream

import scala.collection.mutable

import graft.core.{Envelope, SeaMessage}
import graft.ss.SsFormat._

/** Muxing `.ss` sink: writes message frames, inserting a Beacon at every
  * `beaconInterval` boundary; frames that would cross the boundary are spliced
  * (behavior of sea-streamer-file/src/messages.rs:556-604).
  *
  * Beacon items carry, per (stream, shard): max seq, max ts, and the running
  * checksum of message checksums. When more streams exist than markers fit,
  * markers round-robin across beacons (messages.rs:580-604). Stream state
  * iterates in (key, shard) order — the reference's BTreeMap order — so files
  * are byte-reproducible.
  */
final class SsWriter(
    out: OutputStream,
    fileName: String,
    beaconInterval: Int = SsFormat.DefaultBeaconInterval,
    createdAtMillis: Long = System.currentTimeMillis()) {

  require(beaconInterval >= HeaderSize,
    s"beaconInterval must be >= $HeaderSize")

  private final case class StreamState(
      var maxSeqNo: Long, var maxTsMillis: Long, checksum: RunningChecksum)

  private val states = mutable.TreeMap.empty[(String, Long), StreamState]
  private var beaconCount: Long = 0
  private var offsetBytes: Long = 0
  private var messages: Long = 0

  locally {
    val header = encodeHeader(SsHeader(fileName, createdAtMillis, beaconInterval))
    out.write(header)
    offsetBytes = header.length.toLong
    if (offsetBytes == beaconInterval.toLong) {
      // header fills exactly one interval: an empty beacon goes right after
      val b = encodeBeacon(Beacon(0, Nil))
      out.write(b)
      offsetBytes += b.length
    }
  }

  def offset: Long = offsetBytes
  def messageCount: Long = messages

  /** Writes one message; returns its payload checksum. */
  def write(msg: SeaMessage): Int = {
    val (frame, checksum) = encodeMessage(msg)
    val st = states.getOrElseUpdate((msg.stream_key, msg.shard_id),
      StreamState(msg.sequence, msg.timestamp.getTime, RunningChecksum()))
    st.maxSeqNo = math.max(st.maxSeqNo, msg.sequence)
    st.maxTsMillis = math.max(st.maxTsMillis, msg.timestamp.getTime)
    st.checksum.update(checksum)

    var pos = 0
    while (pos < frame.length) {
      val untilBoundary =
        (beaconInterval - (offsetBytes % beaconInterval)).toInt
      val n = math.min(untilBoundary, frame.length - pos)
      out.write(frame, pos, n)
      pos += n
      offsetBytes += n
      if (offsetBytes % beaconInterval == 0) writeBeacon(frame.length - pos)
    }
    messages += 1
    checksum
  }

  private def writeBeacon(remainingMessageBytes: Int): Unit = {
    val budget = numMarkers(beaconInterval)
    val all = states.iterator.toIndexedSeq
    val take = math.min(all.length, budget)
    val skip = if (all.isEmpty) 0 else (beaconCount % all.length).toInt
    val chosen = (0 until take).map { i =>
      val ((key, shard), st) = all((skip + i) % all.length)
      Marker(key, shard, st.maxSeqNo, st.maxTsMillis, st.checksum.value)
    }
    val bytes = encodeBeacon(Beacon(remainingMessageBytes, chosen))
    out.write(bytes)
    offsetBytes += bytes.length
    beaconCount += chosen.length
  }

  /** Terminates the stream with an EOS control message
    * (messages.rs:16-17,678-691).
    */
  def endOfStream(): Unit = {
    write(SeaMessage(Envelope.SeaStreamerInternal, 0, 0,
      new java.sql.Timestamp(System.currentTimeMillis()),
      EosPayload.getBytes("UTF-8")))
  }

  def flush(): Unit = out.flush()
  def close(): Unit = { out.flush(); out.close() }
}
