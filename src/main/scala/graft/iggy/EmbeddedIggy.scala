package graft.iggy

import java.net.{InetAddress, ServerSocket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import IggyWire.{Cmd, PollStrategy, Status}

/** In-process iggy-model broker speaking [[IggyWire]] over real sockets —
  * streams contain topics, topics contain partitions, each partition an
  * append-only log with dense u64 offsets; consumer/group offset storage;
  * balanced (round-robin) / partition-id / message-key partitioning;
  * offset / timestamp / first / last / next polling. Multi-connection (one
  * thread per accept) because every Spark task opens its own connection.
  *
  * Mirrors the server model the reference adapter drives through the iggy
  * SDK (sea-streamer-iggy/src/streamer.rs:74-258). Lives in main (not test)
  * because the DuckDB-oracle correctness queries (analytics.IggyTransport)
  * round-trip the `events` table through it, putting the whole backend
  * under the hash-compare gate. It is an embedded verification backend,
  * not a production store.
  */
final class EmbeddedIggy extends AutoCloseable {
  import EmbeddedIggy.Msg

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = "127.0.0.1"

  /** Fault tap: close the connection INSTEAD of serving the next N
    * PollMessages — nothing delivered, no offset advanced.
    */
  val dropPolls = new java.util.concurrent.atomic.AtomicInteger(0)
  /** COUNTDOWN tap: the Nth next SendMessages is dropped — connection cut
    * BEFORE anything is appended, so a session retry of the same request
    * is exactly-once (the deterministic stand-in for a refused produce).
    */
  val dropSendCountdown = new java.util.concurrent.atomic.AtomicInteger(0)
  /** COUNTDOWN tap: the Nth message-bearing PollMessages reply has one
    * payload byte flipped AFTER its checksum was computed — the wire-level
    * bit-rot the polled-message CRC exists to catch. For explicit-cursor
    * polls (AtOffset/First — every Spark-source page and pagedPoll past
    * page one) nothing server-side advances, so the reconnect re-fetches
    * the same offsets clean; a group-Next poll with autoCommit has already
    * committed when the reply corrupts — the documented at-most-once edge
    * of commit-on-poll (IggySource.pagedPoll's scaladoc), NOT exactly-once.
    */
  val corruptPollCountdown = new java.util.concurrent.atomic.AtomicInteger(0)
  private def takeFault(tap: java.util.concurrent.atomic.AtomicInteger): Boolean =
    tap.getAndUpdate(n => math.max(0, n - 1)) > 0
  /** Single-atomic-op countdown: fires exactly on the Nth command even under
    * concurrent connections — a get/decrement pair could misfire. */
  private[iggy] def takeCountdown(tap: java.util.concurrent.atomic.AtomicInteger): Boolean =
    tap.getAndUpdate(n => math.max(0, n - 1)) == 1
  private object DropConn extends RuntimeException
    with scala.util.control.NoStackTrace

  private final class Topic(val partitions: Array[mutable.ArrayBuffer[Msg]]) {
    val balanced = new AtomicLong(0L)
  }

  /** stream -> topic -> Topic */
  private val streams =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Topic]]()
  /** "kind/name/stream/topic/partition" -> stored offset */
  private val offsets = new ConcurrentHashMap[String, java.lang.Long]()
  /** "stream/topic/group" -> ordered member names */
  private val groups = new ConcurrentHashMap[String, mutable.LinkedHashSet[String]]()
  @volatile private var closed = false

  def topicPartitionCount(stream: String, topic: String): Int =
    Option(streams.get(stream)).flatMap(s => Option(s.get(topic)))
      .map(_.partitions.length).getOrElse(0)

  def messages(stream: String, topic: String, partition: Int): Seq[(Long, Array[Byte])] =
    Option(streams.get(stream)).flatMap(s => Option(s.get(topic))) match {
      case Some(t) if partition < t.partitions.length =>
        val buf = t.partitions(partition)
        buf.synchronized { buf.toSeq.map(m => (m.tsMs, m.payload)) }
      case _ => Seq.empty
    }

  def storedOffset(kind: Int, name: String, stream: String, topic: String,
      partition: Int): Option[Long] =
    Option(offsets.get(s"$kind/$name/$stream/$topic/$partition")).map(_.longValue)

  private val acceptor = new Thread(() => {
    try while (!closed) {
      val s = server.accept()
      new Thread(() => serve(s)).start()
    } catch { case _: Throwable => () }
  }, "embedded-iggy-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(socket: java.net.Socket): Unit = {
    val in = IggyWire.buffered(socket.getInputStream)
    val out = IggyWire.buffered(socket.getOutputStream)
    var authed = false
    try while (!closed) {
      IggyWire.readRequest(in) match {
        case None => return
        case Some((code, payload)) =>
          val (status, reply) =
            if (!authed && code != Cmd.Ping && code != Cmd.LoginUser)
              (Status.Unauthenticated, Array.emptyByteArray)
            else handle(code, payload)
          if (code == Cmd.LoginUser && status == Status.Ok) authed = true
          IggyWire.writeResponse(out, status, reply)
          // flush when the client's pipeline drained — one syscall per
          // batch, not per command (same shape as EmbeddedRedis)
          if (in.available() == 0) out.flush()
      }
    } catch {
      case DropConn => // injected fault: deliver buffered replies, then cut
        try out.flush() catch { case _: Throwable => () }
      case _: Throwable => ()
    } finally socket.close()
  }

  private def ok(payload: Array[Byte] = Array.emptyByteArray) =
    (Status.Ok, payload)

  private def handle(code: Int, payload: Array[Byte]): (Int, Array[Byte]) = {
    if (code == Cmd.PollMessages && takeFault(dropPolls)) throw DropConn
    if (code == Cmd.SendMessages && takeCountdown(dropSendCountdown)) throw DropConn
    val r = new IggyWire.Reader(payload)
    code match {
      case Cmd.Ping => ok()

      case Cmd.LoginUser =>
        val (_, _) = (r.str(), r.str()) // any credentials accepted
        val (_, _) = (r.lstr(), r.lstr()) // optional version/context
        ok(new IggyWire.Writer().u32(1).result())

      case Cmd.GetStream =>
        val name = r.identifierName()
        val existing = Option(streams.get(name))
        ok(new IggyWire.Writer()
          .u8(if (existing.isDefined) 1 else 0)
          .u32(existing.map(_.size).getOrElse(0)).result())

      case Cmd.CreateStream =>
        val _streamId = r.u32() // 0 = server-assigned (names key this broker)
        val name = r.str()
        if (streams.putIfAbsent(name,
          new ConcurrentHashMap[String, Topic]()) != null)
          (Status.AlreadyExists, Array.emptyByteArray)
        else ok()

      case Cmd.GetTopic =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        Option(streams.get(stream)).flatMap(s => Option(s.get(topic))) match {
          case None => ok(new IggyWire.Writer().u8(0).u32(0).result())
          case Some(t) =>
            val w = new IggyWire.Writer().u8(1).u32(t.partitions.length)
            t.partitions.foreach { buf =>
              w.u64(buf.synchronized(buf.length.toLong)) // tip = next offset
            }
            ok(w.result())
        }

      case Cmd.CreateTopic =>
        val stream = r.identifierName()
        val (topic, parts) = (r.str(), r.u32())
        Option(streams.get(stream)) match {
          case None => (Status.NotFound, Array.emptyByteArray)
          case Some(s) =>
            if (parts <= 0) (Status.Error, Array.emptyByteArray)
            else if (s.putIfAbsent(topic, new Topic(
              Array.fill(parts)(mutable.ArrayBuffer.empty[Msg]))) != null)
              (Status.AlreadyExists, Array.emptyByteArray)
            else ok()
        }

      case Cmd.SendMessages =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        // published Partitioning: [kind u8 (1-based)][length u8][value]
        val pKind = r.u8()
        val pVal = { val n = r.u8(); Array.fill(n)(r.u8().toByte) }
        val count = r.u32()
        Option(streams.get(stream)).flatMap(s => Option(s.get(topic))) match {
          case None => (Status.NotFound, Array.emptyByteArray)
          case Some(t) =>
            val nParts = t.partitions.length
            var i = 0
            while (i < count) {
              val (tsMs, bytes) = IggyWire.readSendMessage(r)
              val part = pKind match {
                case 1 => (t.balanced.getAndIncrement() % nParts).toInt
                case 2 => math.floorMod(new IggyWire.Reader(pVal).u32(), nParts)
                case 3 => math.floorMod(java.util.Arrays.hashCode(pVal), nParts)
                case _ =>
                  return (Status.Error, Array.emptyByteArray)
              }
              val buf = t.partitions(part)
              buf.synchronized { buf += Msg(tsMs, bytes) }
              i += 1
            }
            ok()
        }

      case Cmd.PollMessages =>
        val (kind, name) = r.consumer()
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val partition = r.u32()
        val strategy = PollStrategy(r.u8().toByte, r.u64())
        val count = r.u32()
        val autoCommit = r.u8() == 1
        Option(streams.get(stream)).flatMap(s => Option(s.get(topic))) match {
          case None => (Status.NotFound, Array.emptyByteArray)
          case Some(t) if partition >= t.partitions.length =>
            (Status.NotFound, Array.emptyByteArray)
          case Some(t) =>
            val buf = t.partitions(partition)
            val (tip, slice) = buf.synchronized {
              val len = buf.length.toLong
              val from: Long = strategy match {
                case PollStrategy.AtOffset(o) => o
                case PollStrategy.First => 0L
                case PollStrategy.Last => math.max(0L, len - count)
                case PollStrategy.Next =>
                  storedOffset(kind, name, stream, topic, partition)
                    .map(_ + 1).getOrElse(0L)
                case PollStrategy.AtTimestamp(ms) =>
                  // offsets are ts-ordered per partition (one writer each):
                  // binary search the first message with ts >= ms
                  var lo = 0; var hi = buf.length
                  while (lo < hi) {
                    val mid = (lo + hi) >>> 1
                    if (buf(mid).tsMs < ms) lo = mid + 1 else hi = mid
                  }
                  lo.toLong
              }
              val lo = math.min(math.max(0L, from), len).toInt
              val hi = math.min(len, lo.toLong + count).toInt
              (len, (lo until hi).map(i => (i.toLong, buf(i))))
            }
            if (autoCommit && slice.nonEmpty)
              offsets.put(s"$kind/$name/$stream/$topic/$partition",
                java.lang.Long.valueOf(slice.last._1))
            val w = new IggyWire.Writer()
              .u32(partition).u64(tip).u32(slice.length)
            slice.foreach { case (off, m) =>
              IggyWire.writePolledMessage(w, off, m.tsMs, m.payload)
            }
            val body = w.result()
            // flip the reply's LAST byte (inside the final message's
            // payload, after its CRC was computed) — deterministic bit-rot
            if (slice.nonEmpty && slice.last._2.payload.nonEmpty &&
                takeCountdown(corruptPollCountdown))
              body(body.length - 1) = (body(body.length - 1) ^ 0x01).toByte
            ok(body)
        }

      case Cmd.StoreConsumerOffset =>
        val (kind, name) = r.consumer()
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val partition = r.u32(); val offset = r.u64()
        offsets.put(s"$kind/$name/$stream/$topic/$partition",
          java.lang.Long.valueOf(offset))
        ok()

      case Cmd.GetConsumerOffset =>
        val (kind, name) = r.consumer()
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val partition = r.u32()
        storedOffset(kind, name, stream, topic, partition) match {
          case Some(o) => ok(new IggyWire.Writer().u8(1).u64(o).result())
          case None => ok(new IggyWire.Writer().u8(0).u64(0L).result())
        }

      case Cmd.CreateConsumerGroup =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val _groupId = r.u32() // 0 = server-assigned (names key this broker)
        val group = r.str()
        val created = groups.putIfAbsent(s"$stream/$topic/$group",
          mutable.LinkedHashSet.empty[String]) == null
        if (created) ok() else (Status.AlreadyExists, Array.emptyByteArray)

      case Cmd.JoinConsumerGroup =>
        val (stream, topic, group) =
          (r.identifierName(), r.identifierName(), r.identifierName())
        val member = r.str()
        Option(groups.get(s"$stream/$topic/$group")) match {
          case None => (Status.NotFound, Array.emptyByteArray)
          case Some(members) =>
            val (n, idx) = members.synchronized {
              members += member
              (members.size, members.iterator.indexOf(member))
            }
            ok(new IggyWire.Writer().u32(n).u32(idx).result())
        }

      case _ => (Status.Error, Array.emptyByteArray)
    }
  }

  override def close(): Unit = { closed = true; server.close() }
}

object EmbeddedIggy {
  /** One message at rest. */
  final case class Msg(tsMs: Long, payload: Array[Byte])
}
