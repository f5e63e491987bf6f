package graft.iggy

import java.net.{InetAddress, ServerSocket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.mutable

import IggyWire.{Cmd, PollStrategy, Status}

/** In-process iggy-model broker speaking [[IggyWire]] over real sockets —
  * streams contain topics, topics contain partitions, each partition an
  * append-only log with dense u64 offsets; consumer/group offset storage;
  * balanced (round-robin) / partition-id / message-key partitioning;
  * offset / timestamp / first / last / next polling, plus the published
  * `partition_id = 0` form where the SERVER selects the partition (the
  * reference adapter's poll loop passes `None`, streamer.rs:216-225).
  * Replies carry the published response payloads ([[IggyWire]]'s response
  * codecs) and the published numeric status space; every connection is
  * assigned a client id at accept (iggy's session model — consumer-group
  * membership is keyed by it). Multi-connection (one thread per accept)
  * because every Spark task opens its own connection.
  *
  * Mirrors the server model the reference adapter drives through the iggy
  * SDK (sea-streamer-iggy/src/streamer.rs:74-258). Lives in main (not test)
  * because the DuckDB-oracle correctness queries (analytics.IggyTransport)
  * round-trip the `events` table through it, putting the whole backend
  * under the hash-compare gate. It is an embedded verification backend,
  * not a production store.
  */
final class EmbeddedIggy(
    /** The one root user this server accepts — iggy's bootstrap default
      * (`iggy`/`iggy`); wrong pairs are refused with the published
      * InvalidCredentials status (42), and every other command before a
      * successful login stays behind the Unauthenticated gate (40).
      */
    credentials: (String, String) = ("iggy", "iggy")) extends AutoCloseable {
  import EmbeddedIggy.Msg

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = "127.0.0.1"

  private def nowUs: Long = System.currentTimeMillis() * 1000L

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

  /** One partition's log. The instance is its own monitor for buf+bytes. */
  private final class Part {
    val createdAtUs: Long = nowUs
    val buf = mutable.ArrayBuffer.empty[Msg]
    var bytes = 0L
  }

  private final class Topic(val id: Int, val name: String, nParts: Int,
      val replicationFactor: Int) {
    val createdAtUs: Long = nowUs
    val partitions: Array[Part] = Array.fill(nParts)(new Part)
    val balanced = new AtomicLong(0L)
    /** Server-selected-partition rotation for `partition_id = 0` polls. */
    val pollRotation = new AtomicLong(0L)
    def messagesCount: Long =
      partitions.map(p => p.synchronized(p.buf.length.toLong)).sum
    def sizeBytes: Long = partitions.map(p => p.synchronized(p.bytes)).sum
    def base: IggyWire.TopicBase = IggyWire.TopicBase(id, createdAtUs,
      partitions.length, 0, 0L, replicationFactor, sizeBytes, messagesCount,
      name)
  }

  private final class StreamS(val id: Int, val name: String) {
    val createdAtUs: Long = nowUs
    val topics = new ConcurrentHashMap[String, Topic]()
    val topicSeq = new AtomicInteger(0)
    def base: IggyWire.StreamBase = {
      import scala.jdk.CollectionConverters._
      val ts = topics.values.asScala
      IggyWire.StreamBase(id, createdAtUs, topics.size,
        ts.map(_.sizeBytes).sum, ts.map(_.messagesCount).sum, name)
    }
  }

  private final class Group(val id: Int, val name: String) {
    /** Member CLIENT ids in join order (iggy's session-keyed membership). */
    val members = mutable.LinkedHashSet.empty[Long]
  }

  private val streams = new ConcurrentHashMap[String, StreamS]()
  private val streamSeq = new AtomicInteger(0)
  /** "kind/name/stream/topic/partitionIdx" -> stored offset */
  private val offsets = new ConcurrentHashMap[String, java.lang.Long]()
  /** "stream/topic/group" -> group */
  private val groups = new ConcurrentHashMap[String, Group]()
  private val groupSeq = new AtomicInteger(0)
  private val clientSeq = new AtomicLong(0L)
  @volatile private var closed = false

  def topicPartitionCount(stream: String, topic: String): Int =
    topicOf(stream, topic).map(_.partitions.length).getOrElse(0)

  def messages(stream: String, topic: String, partition: Int): Seq[(Long, Array[Byte])] =
    topicOf(stream, topic) match {
      case Some(t) if partition < t.partitions.length =>
        val p = t.partitions(partition)
        p.synchronized { p.buf.toSeq.map(m => (m.tsMs, m.payload)) }
      case _ => Seq.empty
    }

  def storedOffset(kind: Int, name: String, stream: String, topic: String,
      partition: Int): Option[Long] =
    Option(offsets.get(s"$kind/$name/$stream/$topic/$partition")).map(_.longValue)

  private def topicOf(stream: String, topic: String): Option[Topic] =
    Option(streams.get(stream)).flatMap(s => Option(s.topics.get(topic)))

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
    // iggy's session model: the server assigns a client id per connection.
    // ClientInfo/GroupMember ids are u32 ON THE WIRE (IggyWire
    // writeGroupDetails/writeClientInfo), so the generator is constrained
    // to u32 space here — an unconstrained Long would silently alias two
    // members after wire truncation and break joinGroup's clientId
    // membership lookup.
    val clientId = clientSeq.incrementAndGet() & 0xffffffffL
    val address = String.valueOf(socket.getRemoteSocketAddress)
    var authed = false
    try while (!closed) {
      IggyWire.readRequest(in) match {
        case None => return
        case Some((code, payload)) =>
          val (status, reply) =
            if (!authed && code != Cmd.Ping && code != Cmd.LoginUser)
              (Status.Unauthenticated, Array.emptyByteArray)
            else handle(clientId, address, code, payload)
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
  private def err(status: Int) = (status, Array.emptyByteArray)

  private def handle(clientId: Long, address: String, code: Int,
      payload: Array[Byte]): (Int, Array[Byte]) = {
    if (code == Cmd.PollMessages && takeFault(dropPolls)) throw DropConn
    if (code == Cmd.SendMessages && takeCountdown(dropSendCountdown)) throw DropConn
    val r = new IggyWire.Reader(payload)
    code match {
      case Cmd.Ping => ok()

      case Cmd.LoginUser =>
        val (user, pass) = (r.str(), r.str())
        val (_, _) = (r.lstr(), r.lstr()) // optional version/context
        if ((user, pass) != credentials)
          (Status.InvalidCredentials, Array.emptyByteArray)
        else
          // IdentityInfo: [user_id u32]
          ok(new IggyWire.Writer().u32(1).result())

      case Cmd.GetMe =>
        import scala.jdk.CollectionConverters._
        // joined groups as (stream id, topic id, group id) triples
        val joined = groups.asScala.toSeq.collect {
          case (key, g) if g.members.synchronized(g.members.contains(clientId)) =>
            val Array(sn, tn, _) = key.split("/", 3)
            (Option(streams.get(sn)).map(_.id).getOrElse(0),
              topicOf(sn, tn).map(_.id).getOrElse(0), g.id)
        }.sortBy(_._3)
        val w = new IggyWire.Writer()
        IggyWire.writeClientInfo(w, IggyWire.ClientInfo(
          clientId, 1L, 1, address, joined))
        ok(w.result())

      case Cmd.GetStream =>
        val name = r.identifierName()
        Option(streams.get(name)) match {
          case None => err(Status.StreamNameNotFound)
          case Some(s) =>
            import scala.jdk.CollectionConverters._
            val w = new IggyWire.Writer()
            IggyWire.writeStreamBase(w, s.base)
            s.topics.values.asScala.toSeq.sortBy(_.id)
              .foreach(t => IggyWire.writeTopicBase(w, t.base))
            ok(w.result())
        }

      case Cmd.CreateStream =>
        val _streamId = r.u32() // 0 = server-assigned (names key this broker)
        val name = r.str()
        if (streams.putIfAbsent(name,
          new StreamS(streamSeq.incrementAndGet(), name)) != null)
          err(Status.StreamNameAlreadyExists)
        else ok()

      case Cmd.GetTopic =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        topicOf(stream, topic) match {
          case None => err(Status.TopicNameNotFound)
          case Some(t) =>
            val w = new IggyWire.Writer()
            IggyWire.writeTopicBase(w, t.base)
            t.partitions.zipWithIndex.foreach { case (p, i) =>
              val (n, sz) = p.synchronized((p.buf.length.toLong, p.bytes))
              IggyWire.writePartitionBlock(w, IggyWire.PartitionBlock(
                i + 1, p.createdAtUs, 1, math.max(0L, n - 1), sz, n))
            }
            ok(w.result())
        }

      case Cmd.CreateTopic =>
        val stream = r.identifierName()
        val _topicId = r.u32() // 0 = server-assigned
        val parts = r.u32()
        val _expiry = r.u32(); val _maxSize = r.u64()
        val replication = math.max(1, r.u8())
        val topic = r.str()
        Option(streams.get(stream)) match {
          case None => err(Status.StreamNameNotFound)
          case Some(s) =>
            if (parts <= 0) err(Status.Error)
            else if (s.topics.putIfAbsent(topic, new Topic(
              s.topicSeq.incrementAndGet(), topic, parts, replication)) != null)
              err(Status.TopicNameAlreadyExists)
            else ok()
        }

      case Cmd.SendMessages =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        // published Partitioning: [kind u8 (1-based)][length u8][value]
        val pKind = r.u8()
        val pVal = { val n = r.u8(); Array.fill(n)(r.u8().toByte) }
        val count = r.u32()
        topicOf(stream, topic) match {
          case None => err(Status.TopicNameNotFound)
          case Some(t) =>
            val nParts = t.partitions.length
            var i = 0
            while (i < count) {
              val (tsMs, bytes) = IggyWire.readSendMessage(r)
              val part = pKind match {
                case 1 => (t.balanced.getAndIncrement() % nParts).toInt
                case 2 => // explicit 1-based partition id
                  val id = new IggyWire.Reader(pVal).u32()
                  if (id < 1 || id > nParts)
                    return err(Status.PartitionNotFound)
                  id - 1
                case 3 => math.floorMod(java.util.Arrays.hashCode(pVal), nParts)
                case _ => return err(Status.Error)
              }
              val p = t.partitions(part)
              p.synchronized { p.buf += Msg(tsMs, bytes); p.bytes += bytes.length }
              i += 1
            }
            ok()
        }

      case Cmd.PollMessages =>
        val (kind, name) = r.consumer()
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val partitionId = r.u32() // 1-based; 0 = server selects
        val strategy = PollStrategy(r.u8().toByte, r.u64())
        val count = r.u32()
        val autoCommit = r.u8() == 1
        topicOf(stream, topic) match {
          case None => err(Status.TopicNameNotFound)
          case Some(t) if partitionId > t.partitions.length =>
            err(Status.PartitionNotFound)
          case Some(t) =>
            // partition 0: the server picks — round-robin rotation, the
            // reference adapter's `partition_id: None` poll loop
            val partition =
              if (partitionId == 0)
                (t.pollRotation.getAndIncrement() % t.partitions.length).toInt
              else partitionId - 1
            val p = t.partitions(partition)
            val (last, slice) = p.synchronized {
              val buf = p.buf
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
              (math.max(0L, len - 1), (lo until hi).map(i => (i.toLong, buf(i))))
            }
            if (autoCommit && slice.nonEmpty)
              offsets.put(s"$kind/$name/$stream/$topic/$partition",
                java.lang.Long.valueOf(slice.last._1))
            // published envelope: [partition_id][current_offset][count]
            val w = new IggyWire.Writer()
              .u32(partition + 1).u64(last).u32(slice.length)
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
        val partitionId = r.u32(); val offset = r.u64()
        offsets.put(s"$kind/$name/$stream/$topic/${partitionId - 1}",
          java.lang.Long.valueOf(offset))
        ok()

      case Cmd.GetConsumerOffset =>
        val (kind, name) = r.consumer()
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val partitionId = r.u32()
        val partition = partitionId - 1
        storedOffset(kind, name, stream, topic, partition) match {
          case Some(o) =>
            val current = topicOf(stream, topic)
              .filter(_.partitions.length > partition)
              .map { t =>
                val p = t.partitions(partition)
                math.max(0L, p.synchronized(p.buf.length.toLong) - 1)
              }.getOrElse(0L)
            val w = new IggyWire.Writer()
            IggyWire.writeConsumerOffsetInfo(w,
              IggyWire.ConsumerOffsetInfo(partitionId, current, o))
            ok(w.result())
          case None => err(Status.ResourceNotFound)
        }

      case Cmd.CreateConsumerGroup =>
        val (stream, topic) = (r.identifierName(), r.identifierName())
        val _groupId = r.u32() // 0 = server-assigned (names key this broker)
        val group = r.str()
        if (topicOf(stream, topic).isEmpty) err(Status.TopicNameNotFound)
        else if (groups.putIfAbsent(s"$stream/$topic/$group",
          new Group(groupSeq.incrementAndGet(), group)) != null)
          err(Status.ConsumerGroupNameAlreadyExists)
        else ok()

      case Cmd.GetConsumerGroup =>
        val (stream, topic, group) =
          (r.identifierName(), r.identifierName(), r.identifierName())
        (topicOf(stream, topic), Option(groups.get(s"$stream/$topic/$group"))) match {
          case (Some(t), Some(g)) =>
            val members = g.members.synchronized(g.members.toSeq)
            val n = math.max(1, members.size)
            // deterministic balanced assignment: member i owns the 1-based
            // partition ids p with (p - 1) % members == i
            val w = new IggyWire.Writer()
            IggyWire.writeGroupDetails(w, IggyWire.GroupDetails(
              g.id, t.partitions.length, g.name,
              members.zipWithIndex.map { case (cid, i) =>
                IggyWire.GroupMember(cid,
                  (1 to t.partitions.length).filter(p => (p - 1) % n == i))
              }))
            ok(w.result())
          case _ => err(Status.ConsumerGroupNameNotFound)
        }

      case Cmd.JoinConsumerGroup =>
        val (stream, topic, group) =
          (r.identifierName(), r.identifierName(), r.identifierName())
        Option(groups.get(s"$stream/$topic/$group")) match {
          case None => err(Status.ConsumerGroupNameNotFound)
          case Some(g) =>
            g.members.synchronized { g.members += clientId }
            ok()
        }

      case _ => err(Status.InvalidCommand)
    }
  }

  override def close(): Unit = { closed = true; server.close() }
}

object EmbeddedIggy {
  /** One message at rest. */
  final case class Msg(tsMs: Long, payload: Array[Byte])
}
