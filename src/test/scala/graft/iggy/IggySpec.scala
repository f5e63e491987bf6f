package graft.iggy

import java.nio.charset.StandardCharsets.UTF_8

import graft.TestSession
import graft.iggy.IggyWire.{Partitioning, PollStrategy}
import org.scalatest.funsuite.AnyFunSuite

/** Wire + broker laws for the iggy backend, mirroring the semantics the
  * reference adapter drives through the iggy SDK
  * (sea-streamer-iggy/src/streamer.rs, options.rs).
  */
class IggySpec extends AnyFunSuite {

  private def withServer[T](f: (EmbeddedIggy, IggyClient) => T): T = {
    val srv = new EmbeddedIggy
    val c = new IggyClient(srv.host, srv.port)
    try f(srv, c) finally { c.close(); srv.close() }
  }

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("framing roundtrips requests and responses") {
    val out = new java.io.ByteArrayOutputStream()
    IggyWire.writeRequest(out, IggyWire.Cmd.PollMessages, bytes("payload"))
    val in = new java.io.ByteArrayInputStream(out.toByteArray)
    val (code, p) = IggyWire.readRequest(in).get
    assert(code == IggyWire.Cmd.PollMessages)
    assert(new String(p, UTF_8) == "payload")

    val out2 = new java.io.ByteArrayOutputStream()
    IggyWire.writeResponse(out2, IggyWire.Status.Ok, bytes("ok"))
    val (status, body) = IggyWire.readResponse(
      new java.io.ByteArrayInputStream(out2.toByteArray))
    assert(status == IggyWire.Status.Ok && new String(body, UTF_8) == "ok")
  }

  test("wire goldens pin the exact frame bytes (the COVERAGE.md divergence table's anchor)") {
    // request: [len u32 LE = 4+payload][code u32 LE][payload]
    val out = new java.io.ByteArrayOutputStream()
    IggyWire.writeRequest(out, IggyWire.Cmd.PollMessages, Array(0xAA.toByte))
    assert(out.toByteArray.toSeq.map(_ & 0xff) ==
      Seq(0x05, 0x00, 0x00, 0x00, 0x64, 0x00, 0x00, 0x00, 0xAA))
    // response: [status u32 LE][len u32 LE][payload]
    val out2 = new java.io.ByteArrayOutputStream()
    IggyWire.writeResponse(out2, IggyWire.Status.Ok, bytes("ok"))
    assert(out2.toByteArray.toSeq.map(_ & 0xff) ==
      Seq(0x00, 0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00, 'o'.toInt, 'k'.toInt))
    // login payload: two u8-length credentials + the published OPTIONAL
    // u32-length version/context strings (empty → u32 0)
    assert(new IggyWire.Writer().str("iggy").str("iggy").lstr("").lstr("")
      .result().toSeq.map(_ & 0xff) ==
      (Seq(4) ++ "iggy".getBytes(UTF_8).map(_ & 0xff) ++
        Seq(4) ++ "iggy".getBytes(UTF_8).map(_ & 0xff) ++
        Seq(0, 0, 0, 0, 0, 0, 0, 0)))
  }

  test("published-layout goldens: Identifier, Consumer, send + polled message") {
    // Identifier: [kind u8 (1=numeric, 2=string)][length u8][value]
    assert(new IggyWire.Writer().identifier("orders").result().toSeq
      .map(_ & 0xff) ==
      (Seq(2, 6) ++ "orders".getBytes(UTF_8).map(_ & 0xff)))
    assert(new IggyWire.Writer().identifierNum(7L).result().toSeq
      .map(_ & 0xff) == Seq(1, 4, 7, 0, 0, 0))
    // Consumer: [kind u8 (1=consumer, 2=group)][Identifier]; the default
    // standalone consumer is numeric id 0
    assert(new IggyWire.Writer().consumer(0, "").result().toSeq
      .map(_ & 0xff) == Seq(1, 1, 4, 0, 0, 0, 0))
    assert(new IggyWire.Writer().consumer(1, "g1").result().toSeq
      .map(_ & 0xff) == (Seq(2, 2, 2) ++ "g1".getBytes(UTF_8).map(_ & 0xff)))
    // both decode back to the internal (kind01, name) pair
    assert(new IggyWire.Reader(
      new IggyWire.Writer().consumer(1, "g1").result()).consumer() == ((1, "g1")))
    assert(new IggyWire.Reader(
      new IggyWire.Writer().consumer(0, "").result()).consumer() == ((0, "")))

    // send message: [id u128 = event-time µs][headers_len u32 = 0]
    // [length u32][payload] — no client timestamp field
    val sw = new IggyWire.Writer()
    IggyWire.writeSendMessage(sw, tsMs = 3L, "hi".getBytes(UTF_8))
    assert(sw.result().toSeq.map(_ & 0xff) ==
      (Seq(0xB8, 0x0B, 0, 0, 0, 0, 0, 0) ++ Seq.fill(8)(0) // id = 3000 µs
        ++ Seq(0, 0, 0, 0)                                 // headers_len
        ++ Seq(2, 0, 0, 0) ++ "hi".getBytes(UTF_8).map(_ & 0xff)))
    assert(IggyWire.readSendMessage(new IggyWire.Reader(sw.result()))
      ._1 == 3L)

    // polled message: [offset u64][state u8 = 1][timestamp u64 µs]
    // [id u128][checksum u32][headers_len u32][length u32][payload]
    val pw = new IggyWire.Writer()
    IggyWire.writePolledMessage(pw, offset = 9L, tsMs = 3L,
      "hi".getBytes(UTF_8))
    val crc = new java.util.zip.CRC32
    crc.update("hi".getBytes(UTF_8))
    val c = crc.getValue.toInt
    assert(pw.result().toSeq.map(_ & 0xff) ==
      (Seq(9, 0, 0, 0, 0, 0, 0, 0) ++ Seq(1)                // offset, state
        ++ Seq(0xB8, 0x0B, 0, 0, 0, 0, 0, 0)                // ts 3000 µs
        ++ Seq(0xB8, 0x0B, 0, 0, 0, 0, 0, 0) ++ Seq.fill(8)(0) // id u128
        ++ Seq(c & 0xff, (c >>> 8) & 0xff, (c >>> 16) & 0xff, (c >>> 24) & 0xff)
        ++ Seq(0, 0, 0, 0)                                  // headers_len
        ++ Seq(2, 0, 0, 0) ++ "hi".getBytes(UTF_8).map(_ & 0xff)))
    val pm = IggyWire.readPolledMessage(new IggyWire.Reader(pw.result()))
    assert(pm.offset == 9L && pm.tsMs == 3L &&
      new String(pm.payload, UTF_8) == "hi")

    // CRC-checked decode: a corrupted payload byte is a typed wire failure
    val corrupt = pw.result().clone()
    corrupt(corrupt.length - 1) = 'X'.toByte
    intercept[java.io.IOException] {
      IggyWire.readPolledMessage(new IggyWire.Reader(corrupt))
    }
  }

  test("response-direction goldens: published payload layouts and status space") {
    // the published numeric error-code space (iggy error discriminants)
    assert(IggyWire.Status.Unauthenticated == 40)
    assert(IggyWire.Status.InvalidCredentials == 42)
    assert(IggyWire.Status.ResourceNotFound == 20)
    assert(IggyWire.Status.StreamNameNotFound == 1010)
    assert(IggyWire.Status.StreamNameAlreadyExists == 1012)
    assert(IggyWire.Status.TopicNameNotFound == 2011)
    assert(IggyWire.Status.TopicNameAlreadyExists == 2013)
    assert(IggyWire.Status.PartitionNotFound == 3007)
    assert(IggyWire.Status.ConsumerGroupNameNotFound == 5002)
    assert(IggyWire.Status.ConsumerGroupNameAlreadyExists == 5003)

    // stream base: [id u32][created_at u64][topics u32][size u64]
    // [messages u64][name u8-str]
    val sw = new IggyWire.Writer()
    IggyWire.writeStreamBase(sw,
      IggyWire.StreamBase(2, 0x10L, 1, 0x20L, 3L, "s"))
    assert(sw.result().toSeq.map(_ & 0xff) ==
      (Seq(2, 0, 0, 0) ++ Seq(0x10, 0, 0, 0, 0, 0, 0, 0) ++ Seq(1, 0, 0, 0)
        ++ Seq(0x20, 0, 0, 0, 0, 0, 0, 0) ++ Seq(3, 0, 0, 0, 0, 0, 0, 0)
        ++ Seq(1, 's'.toInt)))
    assert(IggyWire.readStreamBase(new IggyWire.Reader(sw.result())) ==
      IggyWire.StreamBase(2, 0x10L, 1, 0x20L, 3L, "s"))

    // topic base: [id][created_at][partitions][expiry u32][max_size u64]
    // [replication u8][size u64][messages u64][name]
    val tb = IggyWire.TopicBase(7, 0x11L, 4, 0, 0L, 1, 0x30L, 9L, "t")
    val tw = new IggyWire.Writer()
    IggyWire.writeTopicBase(tw, tb)
    assert(tw.result().length == 4 + 8 + 4 + 4 + 8 + 1 + 8 + 8 + 2)
    assert(IggyWire.readTopicBase(new IggyWire.Reader(tw.result())) == tb)

    // partition block: [id 1-based][created_at][segments][current_offset]
    // [size][messages]; tip derives the planning cursor
    val pb = IggyWire.PartitionBlock(1, 0x12L, 1, 5L, 0x40L, 6L)
    val pw = new IggyWire.Writer()
    IggyWire.writePartitionBlock(pw, pb)
    assert(pw.result().length == 4 + 8 + 4 + 8 + 8 + 8)
    assert(IggyWire.readPartitionBlock(new IggyWire.Reader(pw.result())) == pb)
    assert(pb.tip == 6L)
    assert(IggyWire.PartitionBlock(1, 0L, 1, 0L, 0L, 0L).tip == 0L)
    assert(IggyWire.PartitionBlock(1, 0L, 1, 0L, 0L, 1L).tip == 1L)

    // consumer offset info: [partition u32][current u64][stored u64]
    val ow = new IggyWire.Writer()
    IggyWire.writeConsumerOffsetInfo(ow,
      IggyWire.ConsumerOffsetInfo(1, 9L, 3L))
    assert(ow.result().toSeq.map(_ & 0xff) ==
      (Seq(1, 0, 0, 0) ++ Seq(9, 0, 0, 0, 0, 0, 0, 0)
        ++ Seq(3, 0, 0, 0, 0, 0, 0, 0)))

    // group details: [id][partitions][members][name] + member blocks of
    // [client id u32][count u32][1-based partition ids]
    val gd = IggyWire.GroupDetails(1, 4, "g", Seq(
      IggyWire.GroupMember(10L, Seq(1, 3)), IggyWire.GroupMember(11L, Seq(2, 4))))
    val gw = new IggyWire.Writer()
    IggyWire.writeGroupDetails(gw, gd)
    assert(IggyWire.readGroupDetails(new IggyWire.Reader(gw.result())) == gd)

    // client info: [client u32][user u32][transport u8][address u32-str]
    // [groups u32] + [stream][topic][group] triples
    val ci = IggyWire.ClientInfo(5L, 1L, 1, "127.0.0.1:1", Seq((1, 2, 3)))
    val cw = new IggyWire.Writer()
    IggyWire.writeClientInfo(cw, ci)
    assert(IggyWire.readClientInfo(new IggyWire.Reader(cw.result())) == ci)
  }

  test("writer/reader primitives are little-endian and roundtrip") {
    val w = new IggyWire.Writer()
      .u8(7).u32(0x01020304).u64(0x0102030405060708L).str("topic")
      .bytes(bytes("xyz"))
    val raw = w.result()
    // u32 LE: low byte first
    assert((raw(1) & 0xff) == 0x04 && (raw(4) & 0xff) == 0x01)
    val r = new IggyWire.Reader(raw)
    assert(r.u8() == 7)
    assert(r.u32() == 0x01020304)
    assert(r.u64() == 0x0102030405060708L)
    assert(r.str() == "topic")
    assert(new String(r.bytes(), UTF_8) == "xyz")
  }

  test("unauthenticated commands are rejected; login opens the session") {
    val srv = new EmbeddedIggy
    try {
      // IggyClient logs in inside the constructor; a raw socket must be
      // rejected before login (the adapter's credential handshake,
      // streamer.rs:44-57)
      val s = new java.net.Socket(srv.host, srv.port)
      try {
        val out = s.getOutputStream
        IggyWire.writeRequest(out, IggyWire.Cmd.GetStream,
          new IggyWire.Writer().str("x").result())
        out.flush()
        val (status, _) = IggyWire.readResponse(s.getInputStream)
        assert(status == IggyWire.Status.Unauthenticated)
      } finally s.close()
      val c = new IggyClient(srv.host, srv.port)
      try c.ping() finally c.close()
    } finally srv.close()
  }

  test("credentials are VERIFIED: wrong pair fails typed with status 42, " +
      "a failed login does not open the session, non-default creds work") {
    val srv = new EmbeddedIggy(credentials = ("alice", "s3cret"))
    try {
      // wrong password: the constructor's LoginUser surfaces the
      // published InvalidCredentials status — no half-authenticated
      // client escapes
      val e = intercept[Exception] {
        new IggyClient(srv.host, srv.port,
          username = "alice", password = "wrong")
      }
      assert(e.getMessage.contains("42"), e.getMessage)
      // a failed login must not flip the session to authenticated: the
      // next command on the same socket is still gated
      val s = new java.net.Socket(srv.host, srv.port)
      try {
        val out = s.getOutputStream
        IggyWire.writeRequest(out, IggyWire.Cmd.LoginUser,
          new IggyWire.Writer().str("alice").str("wrong")
            .lstr("").lstr("").result())
        out.flush()
        val (st1, _) = IggyWire.readResponse(s.getInputStream)
        assert(st1 == IggyWire.Status.InvalidCredentials)
        IggyWire.writeRequest(out, IggyWire.Cmd.GetStream,
          new IggyWire.Writer().str("x").result())
        out.flush()
        val (st2, _) = IggyWire.readResponse(s.getInputStream)
        assert(st2 == IggyWire.Status.Unauthenticated)
      } finally s.close()
      // the right pair opens the full surface
      val c = new IggyClient(srv.host, srv.port,
        username = "alice", password = "s3cret")
      try { c.ping(); c.createStreamIfAbsent("s") } finally c.close()
      // the default iggy/iggy pair is WRONG on this server
      val e2 = intercept[Exception](new IggyClient(srv.host, srv.port))
      assert(e2.getMessage.contains("42"))
    } finally srv.close()
  }

  test("facade iggy.username/iggy.password options carry the login " +
      "end-to-end; stray security options are refused at connect") {
    import graft.facade.SeaStreamer
    val spark = graft.TestSession.spark
    import spark.implicits._
    val srv = new EmbeddedIggy(credentials = ("alice", "s3cret"))
    try {
      val conn = SeaStreamer.connect(s"iggy://${srv.host}:${srv.port}",
        spark, Map("iggy.username" -> "alice", "iggy.password" -> "s3cret"))
      val env = (0 until 8).map { i =>
        ("s0", 0L, i.toLong,
          new java.sql.Timestamp(1700000000000L + i * 1000L),
          s"p$i".getBytes("UTF-8"))
      }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
      conn.createGenericProducer().send(env)
      val replay = conn.createConsumer(Seq("s0"),
        SeaStreamer.ConsumerOptions(live = false,
          autoStreamReset = SeaStreamer.AutoStreamReset.Earliest))
      assert(replay.count() == 8)
      // wrong credentials surface typed from the read path, not a hang
      intercept[Exception] {
        SeaStreamer.connect(s"iggy://${srv.host}:${srv.port}", spark)
          .createConsumer(Seq("s0"),
            SeaStreamer.ConsumerOptions(live = false)).count()
      }
      intercept[graft.core.SeaStreamErr.Unsupported] {
        SeaStreamer.connect(s"iggy://${srv.host}:${srv.port}", spark,
          Map("iggy.ssl" -> "true"))
      }
    } finally srv.close()
  }

  test("create stream/topic are idempotent through the IfAbsent helpers") {
    withServer { (_, c) =>
      assert(!c.createStreamIfAbsent("s"))
      assert(c.createStreamIfAbsent("s")) // second call: already existed
      assert(!c.createTopicIfAbsent("s", "t", 3))
      assert(c.createTopicIfAbsent("s", "t", 3))
      assert(c.topicTips("s", "t").get.toSeq == Seq(0L, 0L, 0L))
      assert(c.topicTips("s", "missing").isEmpty)
    }
  }

  test("partitioning: PartitionId pins, Balanced round-robins, MessageKey hashes") {
    withServer { (srv, c) =>
      c.createStreamIfAbsent("s")
      c.createTopicIfAbsent("s", "t", 4)
      c.sendMessages("s", "t", Partitioning.PartitionId(2),
        Seq((1L, bytes("a")), (2L, bytes("b"))))
      assert(srv.messages("s", "t", 2).map(m => new String(m._2, UTF_8)) ==
        Seq("a", "b"))
      // balanced: 8 messages spread 2 per partition, in order
      c.createTopicIfAbsent("s", "rr", 4)
      c.sendMessages("s", "rr", Partitioning.Balanced,
        (0 until 8).map(i => (i.toLong, bytes(s"m$i"))))
      (0 until 4).foreach { p =>
        assert(srv.messages("s", "rr", p).size == 2)
      }
      // message key: all to one (hash-stable) partition
      c.createTopicIfAbsent("s", "mk", 4)
      c.sendMessages("s", "mk", Partitioning.MessageKey(bytes("user-1")),
        (0 until 5).map(i => (i.toLong, bytes(s"k$i"))))
      assert((0 until 4).map(p => srv.messages("s", "mk", p).size).max == 5)
    }
  }

  test("polling strategies: First/Offset/Last/Timestamp windows") {
    withServer { (_, c) =>
      c.createStreamIfAbsent("s")
      c.createTopicIfAbsent("s", "t", 1)
      c.sendMessages("s", "t", Partitioning.PartitionId(0),
        (0 until 10).map(i => (100L * i, bytes(s"m$i"))))
      val (current, first) = c.pollMessages("s", "t", 0, PollStrategy.First, 3)
      // published envelope carries the partition's LAST offset
      assert(current == 9L)
      assert(first.map(_.offset) == Seq(0L, 1L, 2L))
      val (_, at) = c.pollMessages("s", "t", 0, PollStrategy.AtOffset(7), 100)
      assert(at.map(_.offset) == Seq(7L, 8L, 9L))
      val (_, last) = c.pollMessages("s", "t", 0, PollStrategy.Last, 4)
      assert(last.map(_.offset) == Seq(6L, 7L, 8L, 9L))
      // timestamp: first message with ts >= 450 is offset 5 (ts 500)
      val (_, ts) = c.pollMessages("s", "t", 0, PollStrategy.AtTimestamp(450L), 100)
      assert(ts.map(_.offset) == Seq(5L, 6L, 7L, 8L, 9L))
    }
  }

  test("Next strategy resumes from the stored offset; AfterPolling commits") {
    withServer { (_, c) =>
      c.createStreamIfAbsent("s")
      c.createTopicIfAbsent("s", "t", 1)
      c.sendMessages("s", "t", Partitioning.PartitionId(0),
        (0 until 10).map(i => (i.toLong, bytes(s"m$i"))))
      val consumer = (0, "alice")
      // nothing stored: Next = from the beginning
      val (_, p1) = c.pollMessages("s", "t", 0, PollStrategy.Next, 4,
        consumer, autoCommit = true)
      assert(p1.map(_.offset) == Seq(0L, 1L, 2L, 3L))
      // second poll resumes AFTER the last auto-committed offset
      val (_, p2) = c.pollMessages("s", "t", 0, PollStrategy.Next, 4,
        consumer, autoCommit = true)
      assert(p2.map(_.offset) == Seq(4L, 5L, 6L, 7L))
      // manual store rewinds the cursor (StoreConsumerOffset)
      c.storeOffset("s", "t", 0, consumer, 1L)
      assert(c.getOffset("s", "t", 0, consumer).contains(1L))
      val (_, p3) = c.pollMessages("s", "t", 0, PollStrategy.Next, 3, consumer)
      assert(p3.map(_.offset) == Seq(2L, 3L, 4L))
      // a different consumer name has its own cursor
      val (_, q1) = c.pollMessages("s", "t", 0, PollStrategy.Next, 2,
        (0, "bob"))
      assert(q1.map(_.offset) == Seq(0L, 1L))
    }
  }

  test("wire partition 0 lets the server select (the adapter's None poll)") {
    withServer { (_, c) =>
      c.createStreamIfAbsent("s")
      c.createTopicIfAbsent("s", "t", 2)
      c.sendMessages("s", "t", Partitioning.PartitionId(0), Seq((1L, bytes("a"))))
      c.sendMessages("s", "t", Partitioning.PartitionId(1), Seq((2L, bytes("b"))))
      // client partition -1 → wire partition_id 0 → the broker rotates
      // round-robin, exactly the reference poll loop's `partition_id: None`
      // (streamer.rs:216-225)
      val got = (0 until 2).flatMap {
        _ => c.pollMessages("s", "t", -1, PollStrategy.First, 10)._2
          .map(m => new String(m.payload, UTF_8))
      }
      assert(got.toSet == Set("a", "b"))
    }
  }

  test("consumer groups: join hands out deterministic member indices") {
    withServer { (srv, c) =>
      c.createStreamIfAbsent("s")
      c.createTopicIfAbsent("s", "t", 4)
      c.createGroupIfAbsent("s", "t", "g")
      c.createGroupIfAbsent("s", "t", "g") // idempotent
      // membership is keyed by the CONNECTION's client id (iggy's session
      // model) — each member is its own client connection
      val m1 = new IggyClient(srv.host, srv.port)
      try {
        assert(c.joinGroup("s", "t", "g") == ((1, 0)))
        assert(m1.joinGroup("s", "t", "g") == ((2, 1)))
        // rejoin from the same connection is stable
        assert(c.joinGroup("s", "t", "g") == ((2, 0)))
        // the details block carries each member's balanced 1-based
        // partition assignment
        val g = c.getGroup("s", "t", "g").get
        assert(g.partitionsCount == 4 && g.name == "g")
        assert(g.members.map(_.partitionIds) == Seq(Seq(1, 3), Seq(2, 4)))
        assert(g.members.map(_.clientId) == Seq(c.clientId, m1.clientId))
      } finally m1.close()
      // group offsets are shared across members (kind 1)
      c.sendMessages("s", "t", Partitioning.PartitionId(0),
        (0 until 6).map(i => (i.toLong, bytes(s"m$i"))))
      val (_, g1) = c.pollMessages("s", "t", 0, PollStrategy.Next, 3,
        (1, "g"), autoCommit = true)
      assert(g1.map(_.offset) == Seq(0L, 1L, 2L))
      val (_, g2) = c.pollMessages("s", "t", 0, PollStrategy.Next, 3,
        (1, "g"), autoCommit = true)
      assert(g2.map(_.offset) == Seq(3L, 4L, 5L))
    }
  }
}

/** Spark-side laws: bounded read / write round-trip, seek pushdown, the
  * live micro-batch source with admission control, and the facade arm.
  */
class IggySparkSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def withServer[T](f: EmbeddedIggy => T): T = {
    val srv = new EmbeddedIggy
    try f(srv) finally srv.close()
  }

  private def envelope(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (if (i % 2 == 0) "click" else "view", (i % 3).toLong, -1L,
        new java.sql.Timestamp(1000000L + i * 100L),
        s"p$i".getBytes(UTF_8))
    }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
  }

  test("write/boundedRead round-trips the envelope with shard fidelity") {
    withServer { srv =>
      IggySource.write(envelope(60), srv.host, srv.port, partitions = 3)
      val back = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view")).collect()
      assert(back.length == 60)
      // topic = stream key, partition = shard % 3, offsets dense per part
      val parts = back.map(r => (r.getString(0), r.getLong(1))).distinct
      assert(parts.toSet.subsetOf(
        (for (t <- Seq("click", "view"); p <- 0 until 3) yield (t, p.toLong)).toSet))
      // per-partition offsets are ts-monotone (one writer per partition)
      back.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
        val byOffset = rs.sortBy(_.getLong(2))
        assert(byOffset.map(_.getTimestamp(3).getTime).toSeq ==
          byOffset.map(_.getTimestamp(3).getTime).toSeq.sorted)
      }
    }
  }

  test("boundedRead assign prunes the poll plan to the pinned partitions") {
    withServer { srv =>
      IggySource.write(envelope(60), srv.host, srv.port, partitions = 3)
      val pinned = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"),
        assign = Some(Seq(("click", 0L), ("view", 2L))))
      // result law: exactly the assigned (topic, partition) slices...
      assert(pinned.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSet == Set(("click", 0L), ("view", 2L)))
      // ...and plan law: one task per ASSIGNED partition (6 unpinned)
      assert(pinned.rdd.getNumPartitions == 2)
      assert(IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view")).rdd.getNumPartitions == 6)
    }
  }

  test("boundedRead pushes seek into the Timestamp strategy (ts > T exactly)") {
    withServer { srv =>
      IggySource.write(envelope(60), srv.host, srv.port, partitions = 3)
      val cutoff = 1000000L + 29 * 100L
      val sought = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), afterMs = Some(cutoff)).collect()
      assert(sought.length == 30)
      assert(sought.forall(_.getTimestamp(3).getTime > cutoff))
    }
  }

  test("boundedRead pushes rewind into the AtOffset start (sequence >= n)") {
    withServer { srv =>
      IggySource.write(envelope(60), srv.host, srv.port, partitions = 3)
      val rewound = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), fromOffset = Some(5L)).collect()
      assert(rewound.forall(_.getLong(2) >= 5L))
      // every partition kept its tail past offset 5
      assert(rewound.nonEmpty)
      val viaFacade = graft.facade.SeaStreamer.connect(
        s"iggy://${srv.host}:${srv.port}", spark)
        .createConsumer(Seq("click", "view"),
          graft.facade.SeaStreamer.ConsumerOptions(live = false,
            rewindSeqNo = Some(5L)))
      assert(viaFacade.count() == rewound.length)
    }
  }

  test("group boundedRead resumes from the stored group offset (Next law)") {
    withServer { srv =>
      IggySource.write(envelope(40), srv.host, srv.port, partitions = 2)
      val first = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), group = Some("g1")).collect()
      assert(first.length == 40)
      // same group again: everything was committed, nothing re-delivered
      val again = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), group = Some("g1")).collect()
      assert(again.isEmpty)
      // a fresh group sees the full stream
      val fresh = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), group = Some("g2")).collect()
      assert(fresh.length == 40)
    }
  }

  test("live source: earliest replays, admission cap bounds each batch") {
    withServer { srv =>
      IggySource.write(envelope(100), srv.host, srv.port, partitions = 2)
      val q = spark.readStream.format("iggy-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("topics", "click,view")
        .option("startingOffsets", "earliest")
        .option("maxMessagesPerTrigger", "30")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("iggy_admission_sink").start()
      try {
        q.processAllAvailable()
        val got = spark.table("iggy_admission_sink")
        assert(got.count() == 100)
        assert(got.select("stream_key", "shard_id", "sequence")
          .distinct().count() == 100)
        // the cap held per micro-batch
        val batches = q.recentProgress
        assert(batches.forall(_.numInputRows <= 30))
        assert(batches.count(_.numInputRows > 0) >= 4)
      } finally q.stop()
    }
  }

  test("admission cap holds even when backlogged partitions outnumber it") {
    withServer { srv =>
      // 2 topics x 2 partitions = 4 backlogged partitions, budget 3: a
      // per-partition floor of 1 would read 4 per trigger, over the cap
      // (equal lags floor every proportional share to 0, so the
      // largest-lag-gets-1 progress guarantee is what drains the stream)
      IggySource.write(envelope(12), srv.host, srv.port, partitions = 2)
      val q = spark.readStream.format("iggy-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("topics", "click,view")
        .option("startingOffsets", "earliest")
        .option("maxMessagesPerTrigger", "3")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("iggy_tight_cap_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("iggy_tight_cap_sink").count() == 12)
        assert(q.recentProgress.forall(_.numInputRows <= 3),
          q.recentProgress.map(_.numInputRows).mkString(","))
      } finally q.stop()
    }
  }

  test("live source: latest anchors at the tip; only post-anchor rows flow") {
    withServer { srv =>
      IggySource.write(envelope(40), srv.host, srv.port, partitions = 2)
      val q = spark.readStream.format("iggy-stream")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("topics", "click,view")
        .option("startingOffsets", "latest")
        .load()
        .writeStream.outputMode("append")
        .format("memory").queryName("iggy_latest_sink").start()
      try {
        q.processAllAvailable()
        assert(spark.table("iggy_latest_sink").count() == 0)
        val s = spark
        import s.implicits._
        val late = (0 until 10).map { i =>
          ("click", 0L, -1L, new java.sql.Timestamp(9000000L + i), s"late$i".getBytes(UTF_8))
        }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")
        IggySource.write(late, srv.host, srv.port, partitions = 2)
        q.processAllAvailable()
        assert(spark.table("iggy_latest_sink").count() == 10)
      } finally q.stop()
    }
  }

  test("facade: iggy scheme dispatches replay/live and validates modes") {
    withServer { srv =>
      IggySource.write(envelope(30), srv.host, srv.port, partitions = 2)
      val conn = graft.facade.SeaStreamer.connect(
        s"iggy://${srv.host}:${srv.port}", spark)
      val replay = conn.createConsumer(Seq("click", "view"),
        graft.facade.SeaStreamer.ConsumerOptions(live = false))
      assert(replay.count() == 30)
      // seek law via the facade (pushed, no residual filter for iggy)
      val cutoff = new java.sql.Timestamp(1000000L + 14 * 100L)
      val sought = conn.createConsumer(Seq("click", "view"),
        graft.facade.SeaStreamer.ConsumerOptions(live = false,
          seekTimestamp = Some(cutoff)))
      assert(sought.count() == 15)
      assert(!sought.queryExecution.optimizedPlan.toString.contains("Filter"))
      // group split on shard_id (partition-granular balancing); members
      // are disjoint and cover the stream
      val members = conn.createGroupConsumers(Seq("click", "view"),
        "grp", 2, graft.facade.SeaStreamer.ConsumerOptions(live = false,
          mode = graft.facade.SeaStreamer.ConsumerMode.LoadBalanced,
          group = Some("grp")))
      assert(members.map(_.count()).sum == 30)
      // Resumable mode CONSUMES the stored group cursor: a second read of
      // the same group sees nothing new
      val r1 = conn.createConsumer(Seq("click", "view"),
        graft.facade.SeaStreamer.ConsumerOptions(live = false,
          mode = graft.facade.SeaStreamer.ConsumerMode.Resumable,
          group = Some("resume-g")))
      assert(r1.count() == 30)
      val r2 = conn.createConsumer(Seq("click", "view"),
        graft.facade.SeaStreamer.ConsumerOptions(live = false,
          mode = graft.facade.SeaStreamer.ConsumerMode.Resumable,
          group = Some("resume-g")))
      assert(r2.count() == 0)
      // RealTime with a group is invalid (ConsumerGroupIsSet law)
      intercept[graft.core.SeaStreamErr.ConsumerGroupIsSet.type] {
        conn.createConsumer(Seq("click"),
          graft.facade.SeaStreamer.ConsumerOptions(
            mode = graft.facade.SeaStreamer.ConsumerMode.RealTime,
            group = Some("g"), live = false))
      }
    }
  }

  test("facade: iggy producer writes topics with create-if-not-exists") {
    withServer { srv =>
      val conn = graft.facade.SeaStreamer.connect(
        s"iggy://${srv.host}:${srv.port}", spark)
      val producer = conn.createGenericProducer(iggyPartitions = 2)
      producer.send(envelope(20))
      assert(srv.topicPartitionCount("graft", "click") == 2)
      val back = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view")).collect()
      assert(back.length == 20)
    }
  }

  test("checkpointed restart resumes at the committed offset: no loss, bounded replay") {
    withServer { srv =>
      IggySource.write(envelope(2000), srv.host, srv.port, partitions = 2)
      val ckpt = java.nio.file.Files.createTempDirectory("iggy_ckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
      def run(drain: Boolean): Unit = {
        val q = spark.readStream.format("iggy-stream")
          .option("host", srv.host).option("port", srv.port.toString)
          .option("topics", "click,view")
          .option("startingOffsets", "earliest")
          .option("maxMessagesPerTrigger", "400")
          .load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select("stream_key", "shard_id", "sequence").collect()
              .foreach(r => seen.add((r.getString(0), r.getLong(1), r.getLong(2))))
            ()
          }.start()
        try {
          if (drain) q.processAllAvailable()
          else {
            // stop mid-drain: wait for at least two committed batches
            val deadline = System.nanoTime() + 30L * 1000000000L
            while (q.recentProgress.count(_.numInputRows > 0) < 2 &&
              System.nanoTime() < deadline) Thread.sleep(20)
          }
        } finally q.stop()
      }
      run(drain = false)
      run(drain = true)
      val all = {
        val b = Seq.newBuilder[(String, Long, Long)]
        seen.forEach(x => b += x)
        b.result()
      }
      assert(all.toSet.size == 2000, "restart lost messages")
      // at-least-once: only the uncommitted tail may replay, never the
      // committed prefix
      assert(all.size - 2000 <= 800,
        s"replayed ${all.size - 2000} rows — restart planned behind the checkpoint")
    }
  }

  test("facade: producer iggyStream matches the consumer's namespace option") {
    withServer { srv =>
      val conn = graft.facade.SeaStreamer.connect(
        s"iggy://${srv.host}:${srv.port}", spark)
      // a producer pinned to a non-default namespace stream must land where
      // a consumer with the matching ConsumerOptions.iggyStream reads
      conn.createGenericProducer(iggyStream = "ns2").send(envelope(10))
      val inNs2 = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view"), stream = "ns2").collect()
      assert(inNs2.length == 10)
      val inDefault = IggySource.boundedRead(spark, srv.host, srv.port,
        Seq("click", "view")).collect()
      assert(inDefault.isEmpty, "non-default namespace leaked into 'graft'")
      val opts = graft.facade.SeaStreamer.ConsumerOptions(
        live = false, iggyStream = "ns2")
      assert(conn.createConsumer(Seq("click", "view"), opts).count() == 10)
    }
  }
}
