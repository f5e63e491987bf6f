package graft.iggy

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Wire layer for the iggy backend: length-prefixed little-endian TCP
  * framing with u32 command codes, modeled on iggy's public TCP transport
  * (`request = [len][code][payload]`, `response = [status][len][payload]`)
  * and the command surface the reference adapter drives through the iggy
  * SDK (sea-streamer-iggy/src/streamer.rs:33-258: login, get/create
  * stream+topic, poll_messages, send_messages, consumer offsets, consumer
  * groups). Payload layouts are THIS library's own compact encodings —
  * wire interop with a live iggy server is not claimed (offline sandbox);
  * the parity target is the adapter's SEMANTICS, which the embedded broker
  * ([[EmbeddedIggy]]) implements and the oracle queries pin.
  */
object IggyWire {

  /** Command codes follow iggy's public command numbering. */
  object Cmd {
    val Ping = 1
    val LoginUser = 38
    val PollMessages = 100
    val SendMessages = 101
    val GetConsumerOffset = 120
    val StoreConsumerOffset = 121
    val GetStream = 200
    val CreateStream = 202
    val GetTopic = 300
    val CreateTopic = 302
    val CreateConsumerGroup = 602
    val JoinConsumerGroup = 604
  }

  /** Response status codes (0 = OK; the rest are this library's own). */
  object Status {
    val Ok = 0
    val Error = 1
    val AlreadyExists = 2
    val NotFound = 3
    val Unauthenticated = 4
  }

  /** Where to start polling (sea-streamer-iggy/src/options.rs:69-82). */
  sealed trait PollStrategy { def kind: Byte; def value: Long }
  object PollStrategy {
    /** From a specific per-partition offset (inclusive). */
    final case class AtOffset(offset: Long) extends PollStrategy {
      val kind = 0: Byte; def value: Long = offset
    }
    /** From the first message with `ts_ms >= value` (µs in the reference;
      * ms here — the envelope's resolution).
      */
    final case class AtTimestamp(ms: Long) extends PollStrategy {
      val kind = 1: Byte; def value: Long = ms
    }
    /** From the first message in the partition. */
    case object First extends PollStrategy { val kind = 2: Byte; val value = 0L }
    /** The LAST `count` messages of the partition. */
    case object Last extends PollStrategy { val kind = 3: Byte; val value = 0L }
    /** Continue from the stored consumer/group offset. */
    case object Next extends PollStrategy { val kind = 4: Byte; val value = 0L }

    def apply(kind: Byte, value: Long): PollStrategy = kind match {
      case 0 => AtOffset(value)
      case 1 => AtTimestamp(value)
      case 2 => First
      case 3 => Last
      case 4 => Next
      case other => throw new IllegalArgumentException(s"bad strategy kind $other")
    }
  }

  /** How sent messages are spread across a topic's partitions
    * (sea-streamer-iggy/src/options.rs:295-304).
    */
  sealed trait Partitioning
  object Partitioning {
    /** Server round-robins across partitions. */
    case object Balanced extends Partitioning
    /** All messages to one explicit partition. */
    final case class PartitionId(id: Int) extends Partitioning
    /** Partition = hash(key) % partitions. */
    final case class MessageKey(key: Array[Byte]) extends Partitioning
  }

  /** One polled message: per-partition dense offset + event-time ms. */
  final case class PolledMessage(offset: Long, tsMs: Long, payload: Array[Byte])

  // ---- primitive codecs (little-endian, like iggy's binary protocol) ----

  final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Writer = { buf.write(v & 0xff); this }
    def u32(v: Int): Writer = {
      buf.write(v & 0xff); buf.write((v >>> 8) & 0xff)
      buf.write((v >>> 16) & 0xff); buf.write((v >>> 24) & 0xff); this
    }
    def u64(v: Long): Writer = { u32(v.toInt); u32((v >>> 32).toInt); this }
    def str(s: String): Writer = {
      val b = s.getBytes(UTF_8)
      require(b.length <= 255, s"name too long: $s")
      u8(b.length); buf.write(b); this
    }
    def bytes(b: Array[Byte]): Writer = { u32(b.length); buf.write(b); this }
    def raw(b: Array[Byte]): Writer = { buf.write(b); this }
    def result(): Array[Byte] = buf.toByteArray
  }

  final class Reader(payload: Array[Byte]) {
    private var pos = 0
    def remaining: Int = payload.length - pos
    def u8(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
    def u32(): Int = {
      val v = (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8) |
        ((payload(pos + 2) & 0xff) << 16) | ((payload(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def u64(): Long = {
      val lo = u32() & 0xffffffffL
      val hi = u32() & 0xffffffffL
      (hi << 32) | lo
    }
    def str(): String = {
      val n = u8()
      val s = new String(payload, pos, n, UTF_8); pos += n; s
    }
    def bytes(): Array[Byte] = {
      val n = u32()
      val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b
    }
  }

  // ---- framing ----

  /** `[u32 len][u32 code][payload]`, len = 4 + payload.length. */
  def writeRequest(out: OutputStream, code: Int, payload: Array[Byte]): Unit = {
    val w = new Writer
    w.u32(payload.length + 4).u32(code).raw(payload)
    out.write(w.result())
  }

  /** `[u32 status][u32 len][payload]`. */
  def writeResponse(out: OutputStream, status: Int, payload: Array[Byte]): Unit = {
    val w = new Writer
    w.u32(status).u32(payload.length).raw(payload)
    out.write(w.result())
  }

  def readRequest(in: InputStream): Option[(Int, Array[Byte])] = {
    val head = readN(in, 4).getOrElse(return None)
    val len = new Reader(head).u32()
    val body = readN(in, len).getOrElse(return None)
    val r = new Reader(body)
    val code = r.u32()
    Some((code, java.util.Arrays.copyOfRange(body, 4, body.length)))
  }

  def readResponse(in: InputStream): (Int, Array[Byte]) = {
    val head = readN(in, 8).getOrElse(throw new EOFException("iggy: closed"))
    val r = new Reader(head)
    val status = r.u32()
    val len = r.u32()
    val body = readN(in, len).getOrElse(throw new EOFException("iggy: closed"))
    (status, body)
  }

  private def readN(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val read = in.read(buf, off, n - off)
      if (read < 0) return if (off == 0) None else throw new EOFException("iggy: truncated frame")
      off += read
    }
    Some(buf)
  }

  def buffered(in: InputStream): InputStream =
    new java.io.BufferedInputStream(in, 1 << 16)
  def buffered(out: OutputStream): OutputStream =
    new java.io.BufferedOutputStream(out, 1 << 16)
}
