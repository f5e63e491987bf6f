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
      Set(Status.Ok, Status.StreamNameAlreadyExists))
      ._1 == Status.StreamNameAlreadyExists

  /** Existence by STATUS (the published protocol reports a missing stream
    * as StreamNameNotFound with an empty payload; found returns the
    * StreamDetails block).
    */
  def streamExists(stream: String): Boolean =
    call(Cmd.GetStream,
      new IggyWire.Writer().identifier(stream).result(),
      Set(Status.Ok, Status.StreamNameNotFound))._1 == Status.Ok

  /** Published create-option block: `[stream Identifier][topic_id u32
    * (0 = server-assigned)][partitions_count u32][message_expiry u32
    * (0 = server default)][max_topic_size u64 (0 = server default)]
    * [replication_factor u8 (0 = server default)][name]` — the defaults
    * the reference adapter passes (CompressionAlgorithm::None /
    * IggyExpiry::ServerDefault / MaxTopicSize::ServerDefault,
    * streamer.rs:119-129).
    */
  def createTopicIfAbsent(stream: String, topic: String, partitions: Int): Boolean =
    call(Cmd.CreateTopic, new IggyWire.Writer()
      .identifier(stream).u32(0).u32(partitions)
      .u32(0).u64(0L).u8(0).str(topic).result(),
      Set(Status.Ok, Status.TopicNameAlreadyExists))
      ._1 == Status.TopicNameAlreadyExists

  /** Partition tips (next offset per partition); None if the topic is
    * missing. Drives offset planning in the Spark sources. Decoded from
    * the published TopicDetails block — partition blocks carry the LAST
    * offset plus a message count ([[IggyWire.PartitionBlock.tip]] derives
    * the planning cursor), ordered by their 1-based partition ids.
    */
  def topicTips(stream: String, topic: String): Option[Array[Long]] = {
    val (status, body) = call(Cmd.GetTopic,
      new IggyWire.Writer().identifier(stream).identifier(topic).result(),
      Set(Status.Ok, Status.TopicNameNotFound))
    if (status != Status.Ok) None
    else {
      val r = new IggyWire.Reader(body)
      val base = IggyWire.readTopicBase(r)
      val tips = new Array[Long](base.partitionsCount)
      (0 until base.partitionsCount).foreach { _ =>
        val p = IggyWire.readPartitionBlock(r)
        tips(p.id - 1) = p.tip
      }
      Some(tips)
    }
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
      // explicit partition ids are 1-based on the wire
      case Partitioning.PartitionId(id) => w.u8(2).u8(4).u32(id + 1)
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

  /** One poll: (the partition's current/last offset, messages). `consumer`
    * is (kind, name) where kind 0 = standalone consumer, 1 = consumer
    * group (encoded as iggy's 1-based Consumer kinds + Identifier).
    * `partition` is this library's 0-based index, +1 on the wire (iggy
    * partition ids are 1-based; wire 0 = the server selects — pass
    * `partition = -1` for that published form, the reference poll loop's
    * `partition_id: None`).
    */
  def pollMessages(stream: String, topic: String, partition: Int,
      strategy: PollStrategy, count: Int,
      consumer: (Int, String) = (0, ""), autoCommit: Boolean = false): (Long, Seq[PolledMessage]) = {
    val w = new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition + 1).u8(strategy.kind.toInt).u64(strategy.value)
      .u32(count).u8(if (autoCommit) 1 else 0)
    val (_, body) = call(Cmd.PollMessages, w.result())
    val r = new IggyWire.Reader(body)
    val _part = r.u32()
    val current = r.u64()
    val msgs = Seq.fill(r.u32())(IggyWire.readPolledMessage(r))
    (current, msgs)
  }

  def storeOffset(stream: String, topic: String, partition: Int,
      consumer: (Int, String), offset: Long): Unit = {
    call(Cmd.StoreConsumerOffset, new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition + 1).u64(offset).result())
    ()
  }

  /** Stored offset, or None when never stored (the published protocol
    * reports that as an error status with an empty payload; found returns
    * the ConsumerOffsetInfo block).
    */
  def getOffset(stream: String, topic: String, partition: Int,
      consumer: (Int, String)): Option[Long] = {
    val (status, body) = call(Cmd.GetConsumerOffset, new IggyWire.Writer()
      .consumer(consumer._1, consumer._2)
      .identifier(stream).identifier(topic)
      .u32(partition + 1).result(),
      Set(Status.Ok, Status.ResourceNotFound))
    if (status != Status.Ok) None
    else Some(IggyWire.readConsumerOffsetInfo(
      new IggyWire.Reader(body)).storedOffset)
  }

  /** Published create layout: stream/topic references as Identifiers,
    * `[group_id u32 (0 = server-assigned)][name]`.
    */
  def createGroupIfAbsent(stream: String, topic: String, group: String): Unit = {
    call(Cmd.CreateConsumerGroup, new IggyWire.Writer()
      .identifier(stream).identifier(topic).u32(0).str(group).result(),
      Set(Status.Ok, Status.ConsumerGroupNameAlreadyExists))
    ()
  }

  /** This connection's server-assigned client id (GetMe → ClientInfo) —
    * consumer-group membership is keyed by it, iggy's session model.
    */
  lazy val clientId: Long = {
    val (_, body) = call(Cmd.GetMe, Array.emptyByteArray)
    IggyWire.readClientInfo(new IggyWire.Reader(body)).clientId
  }

  /** The group's published details block (members in join order, each
    * carrying its deterministic balanced 1-based partition assignment).
    */
  def getGroup(stream: String, topic: String,
      group: String): Option[IggyWire.GroupDetails] = {
    val (status, body) = call(Cmd.GetConsumerGroup, new IggyWire.Writer()
      .identifier(stream).identifier(topic).identifier(group).result(),
      Set(Status.Ok, Status.ConsumerGroupNameNotFound))
    if (status != Status.Ok) None
    else Some(IggyWire.readGroupDetails(new IggyWire.Reader(body)))
  }

  /** Join (published request: three Identifiers, empty reply — membership
    * is keyed by this connection's client id); returns (member count,
    * this member's index) read back from the group's details block.
    */
  def joinGroup(stream: String, topic: String, group: String): (Int, Int) = {
    call(Cmd.JoinConsumerGroup, new IggyWire.Writer()
      .identifier(stream).identifier(topic).identifier(group).result())
    val g = getGroup(stream, topic, group).getOrElse(
      throw new IggyServerErr(Status.ConsumerGroupNameNotFound,
        s"iggy: group $group vanished after join"))
    (g.members.size, g.members.indexWhere(_.clientId == clientId))
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
