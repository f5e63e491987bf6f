package graft.iggy

import java.net.Socket

import IggyWire.{Cmd, PollStrategy, Partitioning, PolledMessage, Status}

/** Blocking iggy client over [[IggyWire]] — the executor-side handle every
  * Spark task opens (one connection per task, like [[graft.redis.RedisClient]]).
  * Connect performs the adapter's login handshake
  * (sea-streamer-iggy/src/streamer.rs:40-57: credentials from the options
  * when the URI carries none).
  */
final class IggyClient(host: String, port: Int,
    username: String = "iggy", password: String = "iggy") extends AutoCloseable {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = IggyWire.buffered(socket.getInputStream)
  private val out = IggyWire.buffered(socket.getOutputStream)

  login(username, password)

  final class IggyServerErr(val status: Int, msg: String)
    extends RuntimeException(msg)

  private def call(code: Int, payload: Array[Byte],
      acceptable: Set[Int] = Set(Status.Ok)): (Int, Array[Byte]) = {
    IggyWire.writeRequest(out, code, payload)
    out.flush()
    val (status, body) = IggyWire.readResponse(in)
    if (!acceptable.contains(status))
      throw new IggyServerErr(status, s"iggy command $code failed: status $status")
    (status, body)
  }

  /** Published LoginUser layout: u8-length credentials plus OPTIONAL
    * u32-length version/context strings (empty here — the adapter logs in
    * with bare credentials, streamer.rs:40-57).
    */
  private def login(user: String, pass: String): Unit =
    call(Cmd.LoginUser, new IggyWire.Writer()
      .str(user).str(pass).lstr("").lstr("").result())

  def ping(): Unit = call(Cmd.Ping, Array.emptyByteArray)

  /** True if the stream existed (create_stream_if_not_exists flow:
    * streamer.rs:86-95 does get-then-create; one idempotent call here).
    * Published create layout: `[stream_id u32 (0 = server-assigned)][name]`.
    */
  def createStreamIfAbsent(stream: String): Boolean =
    call(Cmd.CreateStream, new IggyWire.Writer().u32(0).str(stream).result(),
      Set(Status.Ok, Status.AlreadyExists))._1 == Status.AlreadyExists

  def streamExists(stream: String): Boolean = {
    val (_, body) = call(Cmd.GetStream,
      new IggyWire.Writer().identifier(stream).result())
    new IggyWire.Reader(body).u8() == 1
  }

  def createTopicIfAbsent(stream: String, topic: String, partitions: Int): Boolean =
    call(Cmd.CreateTopic, new IggyWire.Writer()
      .identifier(stream).str(topic).u32(partitions).result(),
      Set(Status.Ok, Status.AlreadyExists))._1 == Status.AlreadyExists

  /** Partition tips (next offset per partition); None if the topic is
    * missing. Drives offset planning in the Spark sources.
    */
  def topicTips(stream: String, topic: String): Option[Array[Long]] = {
    val (_, body) = call(Cmd.GetTopic,
      new IggyWire.Writer().identifier(stream).identifier(topic).result())
    val r = new IggyWire.Reader(body)
    if (r.u8() != 1) None
    else Some(Array.fill(r.u32())(r.u64()))
  }

  /** Batched send: one round-trip per batch (the adapter sends per message,
    * producer.rs:63-117; batching is the Spark-side pipelining).
    * Partitioning is the published `[kind u8][length u8][value]` with
    * 1-based kinds; messages are [[IggyWire.writeSendMessage]]'s layout.
    */
  def sendMessages(stream: String, topic: String, partitioning: Partitioning,
      messages: Seq[(Long, Array[Byte])]): Unit = {
    val w = new IggyWire.Writer().identifier(stream).identifier(topic)
    partitioning match {
      case Partitioning.Balanced => w.u8(1).u8(0)
      case Partitioning.PartitionId(id) => w.u8(2).u8(4).u32(id)
      case Partitioning.MessageKey(k) =>
        require(k.length <= 255, "partitioning key too long")
        w.u8(3).u8(k.length).raw(k)
    }
    w.u32(messages.length)
    messages.foreach { case (tsMs, bytes) =>
      IggyWire.writeSendMessage(w, tsMs, bytes)
    }
    call(Cmd.SendMessages, w.result())
    ()
  }

  /** One poll: (partition tip, messages). `consumer` is (kind, name) where
    * kind 0 = standalone consumer, 1 = consumer group (encoded as iggy's
    * 1-based Consumer kinds + Identifier).
    */
  def pollMessages(stream: String, topic: String, partition: Int,
      strategy: PollStrategy, count: Int,
      consumer: (Int, String) = (0, ""), autoCommit: Boolean = false): (Long, Seq[PolledMessage]) = {
    val w = new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition).u8(strategy.kind.toInt).u64(strategy.value)
      .u32(count).u8(if (autoCommit) 1 else 0)
    val (_, body) = call(Cmd.PollMessages, w.result())
    val r = new IggyWire.Reader(body)
    val _part = r.u32()
    val tip = r.u64()
    val msgs = Seq.fill(r.u32())(IggyWire.readPolledMessage(r))
    (tip, msgs)
  }

  def storeOffset(stream: String, topic: String, partition: Int,
      consumer: (Int, String), offset: Long): Unit = {
    call(Cmd.StoreConsumerOffset, new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition).u64(offset).result())
    ()
  }

  def getOffset(stream: String, topic: String, partition: Int,
      consumer: (Int, String)): Option[Long] = {
    val (_, body) = call(Cmd.GetConsumerOffset, new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition).result())
    val r = new IggyWire.Reader(body)
    if (r.u8() == 1) Some(r.u64()) else None
  }

  /** Published create layout: stream/topic references as Identifiers,
    * `[group_id u32 (0 = server-assigned)][name]`.
    */
  def createGroupIfAbsent(stream: String, topic: String, group: String): Unit = {
    call(Cmd.CreateConsumerGroup, new IggyWire.Writer()
      .identifier(stream).identifier(topic).u32(0).str(group).result(),
      Set(Status.Ok, Status.AlreadyExists))
    ()
  }

  /** Join; returns (member count, this member's index) — partition p is
    * owned by member `p % count` (deterministic balanced assignment; the
    * trailing member name is a graft extension — real iggy tracks
    * membership by session).
    */
  def joinGroup(stream: String, topic: String, group: String,
      member: String): (Int, Int) = {
    val (_, body) = call(Cmd.JoinConsumerGroup, new IggyWire.Writer()
      .identifier(stream).identifier(topic).identifier(group)
      .str(member).result())
    val r = new IggyWire.Reader(body)
    (r.u32(), r.u32())
  }

  override def close(): Unit = socket.close()
}

object IggyClient {
  /** Self-healing connection: reconnect (which re-runs the LOGIN
    * handshake — the constructor owns it) with bounded backoff on dropped
    * connections, typed [[graft.core.SeaStreamErr.Backend]] once the
    * budget is spent. Iggy's status space has no transient "try again"
    * codes (unlike redis TRYAGAIN / kafka NotLeader), so server errors
    * always surface — only wire failures retry. The twin of
    * [[graft.kafka.KafkaClient.Session]] / [[graft.redis.RedisClient.Session]].
    */
  final class Session(mkClient: () => IggyClient, maxRetries: Int = 5,
      backoffMs: Long = 20L) extends AutoCloseable {
    private var client: IggyClient = null

    def retrying[T](what: String)(f: IggyClient => T): T = {
      var attempt = 0
      while (true) {
        // Establishment runs INSIDE the try so a connect-time IOException
        // (server briefly down between drop and reconnect) consumes the same
        // retry budget and surfaces typed — mirrors RedisClient.Session.
        try {
          if (client == null) client = mkClient()
          return f(client)
        } catch {
          case e: java.io.IOException => // dropped / truncated connection
            if (client != null) {
              try client.close() catch { case _: Throwable => () }
              client = null
            }
            attempt += 1
            if (attempt > maxRetries)
              throw graft.core.SeaStreamErr.Backend(
                s"iggy $what: retries exhausted after $maxRetries reconnects", e)
            Thread.sleep(backoffMs * attempt)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    override def close(): Unit = {
      if (client != null) { client.close(); client = null }
    }
  }
}
