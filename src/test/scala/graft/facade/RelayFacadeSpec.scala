package graft.facade

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SeaStreamErr
import graft.kafka.{EmbeddedKafka, KafkaClient}
import graft.redis.{EmbeddedRedis, RedisClient, RedisStreams, Resp}

/** Laws of the facade's unified exactly-once relay surface: one
  * `relayExactlyOnce(source, destination)` over the four-engine matrix,
  * scheme-pair dispatched like the reference's socket crate — plus the
  * typed-error contract for pairs the matrix cannot anchor.
  */
class RelayFacadeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSession.spark

  private def seedRedis(rc: RedisClient, stream: String, n: Int): Unit = {
    val key = RedisStreams.shardedKey(stream, 0L, sharded = true)
    (0 until n).foreach(i => rc.command(RedisStreams.xadd(
      key, 4000L + i, s"v$i".getBytes("UTF-8")): _*))
  }

  test("all four corners drain through the one facade surface and " +
      "resume idempotently off their anchors") {
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis
    val r2 = new EmbeddedRedis
    val kc = new KafkaClient(k.host, k.port)
    val rc = new RedisClient(r.host, r.port)
    try {
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark)
      val r2conn = SeaStreamer.connect(s"redis://${r2.host}:${r2.port}", spark)
      // kafka→kafka (same cluster, renamed)
      kc.metadata(Seq("fk"))
      (0 until 5).foreach(i => kc.produce("fk", 0,
        Seq((100L + i, null, s"k$i".getBytes("UTF-8")))))
      assert(SeaStreamer.relayExactlyOnce(kconn, kconn, Seq("fk"),
        anchor = "fa1", rename = _ + "_out") == 5L)
      assert(SeaStreamer.relayExactlyOnce(kconn, kconn, Seq("fk"),
        anchor = "fa1", rename = _ + "_out") == 0L, "anchor must resume")
      assert(kc.fetchIso("fk_out", 0, 0L, readCommitted = true)._3
        .map(x => new String(x.value, "UTF-8")) == (0 until 5).map("k" + _))
      // kafka→redis
      assert(SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("fk"),
        anchor = "fa2") == 5L)
      assert(SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("fk"),
        anchor = "fa2") == 0L)
      assert(r.entries(RedisStreams.shardedKey("fk", 0L, true)).length == 5)
      // redis→kafka
      seedRedis(rc, "fr", 4)
      assert(SeaStreamer.relayExactlyOnce(rconn, kconn, Seq("fr"),
        anchor = "fa3") == 4L)
      assert(SeaStreamer.relayExactlyOnce(rconn, kconn, Seq("fr"),
        anchor = "fa3") == 0L)
      assert(kc.fetchIso("fr", 0, 0L, readCommitted = true)._3
        .map(x => new String(x.value, "UTF-8")) == (0 until 4).map("v" + _))
      // redis→redis (cross-server, same name allowed)
      assert(SeaStreamer.relayExactlyOnce(rconn, r2conn, Seq("fr"),
        anchor = "fa4") == 4L)
      assert(SeaStreamer.relayExactlyOnce(rconn, r2conn, Seq("fr"),
        anchor = "fa4") == 0L)
      assert(r2.entries(RedisStreams.shardedKey("fr", 0L, true)).length == 4)
      // a FRESH anchor restarts from the beginning (the resume point is
      // the anchor's, not the stream's)
      assert(SeaStreamer.relayExactlyOnce(rconn, r2conn, Seq("fr"),
        anchor = "fa5", rename = _ + "_again") == 4L)
    } finally { kc.close(); rc.close(); k.close(); r.close(); r2.close() }
  }

  test("relayLag: kafka pending counts positions (aborted slots included, " +
      "kafka's own lag semantics) capped at the LSO (open txns never " +
      "read as lag); redis pending is the backlog's ms span; a drained " +
      "relay reads zero everywhere") {
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis
    val kc = new KafkaClient(k.host, k.port)
    val rc = new RedisClient(r.host, r.port)
    try {
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark)
      // kafka source: 7 plain records, an ABORTED-complete transaction
      // (5 records + marker — these occupy offsets 7..12 and COUNT as
      // pending positions, exactly kafka's own lag semantics), then an
      // OPEN transaction (5 records) — the tip must stop at the LSO, so
      // the open data never reads as lag
      kc.metadata(Seq("lg"))
      (0 until 7).foreach(i => kc.produce("lg", 0,
        Seq((100L + i, null, s"l$i".getBytes("UTF-8")))))
      val poison = new graft.kafka.KafkaTxnProducer(kc, "lg-poison")
        .initTransactions()
      poison.begin()
      poison.send("lg", 0, (0 until 5).map(i =>
        (900L + i, null, s"poison$i".getBytes("UTF-8"))))
      poison.abort()
      val open = new graft.kafka.KafkaTxnProducer(kc, "lg-open")
        .initTransactions()
      open.begin()
      open.send("lg", 0, (0 until 5).map(i =>
        (950L + i, null, s"open$i".getBytes("UTF-8"))))
      val before = SeaStreamer.relayLag(kconn, rconn, Seq("lg"), "lga")
      assert(before(("lg", 0L)).behindRecords.contains(13L),
        "pending = 13 offsets (7 plain + 5 aborted + marker), LSO-capped " +
          s"before the open txn: ${before(("lg", 0L))}")
      assert(!before(("lg", 0L)).drained)
      assert(before(("lg", 1L)).drained, "an empty partition reads drained")
      SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("lg"), anchor = "lga")
      val after = SeaStreamer.relayLag(kconn, rconn, Seq("lg"), "lga")
      assert(after.values.forall(l =>
        l.drained && l.behindRecords.forall(_ == 0L)),
        s"a drained relay must read zero lag: $after")
      open.abort() // release the LSO so nothing holds the broker open
      // redis source: entries spanning ms 5000..5040 on shard 0; lag is
      // the backlog's time span (newest minus oldest PENDING), records
      // deliberately absent (ids are sparse)
      val key = RedisStreams.shardedKey("lr", 0L, sharded = true)
      Seq(5000L, 5025L, 5040L).foreach(ms => rc.command(
        RedisStreams.xadd(key, ms, s"m$ms".getBytes("UTF-8")): _*))
      val rb = SeaStreamer.relayLag(rconn, kconn, Seq("lr"), "lrg",
        redisShards = 1)
      assert(rb(("lr", 0L)).behindMs.contains(40L) &&
        rb(("lr", 0L)).behindRecords.isEmpty,
        s"redis lag must be the 40 ms backlog span: ${rb(("lr", 0L))}")
      kc.metadata(Seq("lr"))
      SeaStreamer.relayExactlyOnce(rconn, kconn, Seq("lr"), anchor = "lrg",
        redisShards = 1)
      val ra = SeaStreamer.relayLag(rconn, kconn, Seq("lr"), "lrg",
        redisShards = 1)
      assert(ra(("lr", 0L)).drained && ra(("lr", 0L)).behindMs.contains(0L),
        s"a drained redis relay must read zero span: $ra")
      // partially relayed: a rival-committed prefix moves the cursor; the
      // span shrinks to newest-pending minus oldest-PENDING
      rc.command(RedisStreams.set("pl:{lr/0}",
        (RedisStreams.packSeqNo(5025L, 0L) + 1L).toString): _*)
      val partial = SeaStreamer.relayLag(rconn, rconn, Seq("lr"), "pl",
        redisShards = 1)
      assert(partial(("lr", 0L)).behindMs.contains(0L) &&
        !partial(("lr", 0L)).drained,
        s"only the 5040 entry pends — span 0, not drained: " +
          partial(("lr", 0L)))
    } finally { kc.close(); rc.close(); k.close(); r.close() }
  }

  test("file corners: a .ss directory ships through the one facade " +
      "surface into both brokers, '*' means everything, a named subset " +
      "filters, lag reads pending bytes per part file and drains to zero") {
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis
    val kc = new KafkaClient(k.host, k.port)
    try {
      val dir = java.nio.file.Files.createTempDirectory("relayss")
        .toFile.getAbsolutePath
      val w = new graft.ss.SsWriter(
        new java.io.FileOutputStream(s"$dir/part-0.ss"), "part-0.ss", 1024, 0L)
      (0 until 6).foreach(i => w.write(graft.core.SeaMessage(
        if (i % 2 == 0) "fa" else "fb", 0L, i.toLong,
        new java.sql.Timestamp(1000L + i), s"f$i".getBytes("UTF-8"))))
      w.close()
      val fconn = SeaStreamer.connect(s"file://$dir", spark)
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark)
      kc.metadata(Seq("fa", "fb"))
      // pending bytes before any ship; coordinate is the part file
      val lag0 = SeaStreamer.relayLag(fconn, kconn, Seq("*"), "fk")
      assert(lag0(("part-0.ss", 0L)).behindBytes.exists(_ > 0L) &&
        !lag0(("part-0.ss", 0L)).drained, s"unshipped file must lag: $lag0")
      // '*' ships everything into kafka
      assert(SeaStreamer.relayExactlyOnce(fconn, kconn, Seq("*"),
        anchor = "fk") == 6L)
      assert(SeaStreamer.relayLag(fconn, kconn, Seq("*"), "fk")
        .values.forall(l => l.drained && l.behindBytes.contains(0L)))
      assert(SeaStreamer.relayExactlyOnce(fconn, kconn, Seq("*"),
        anchor = "fk") == 0L, "a drained directory must ship zero")
      // a named subset into redis: fb only; fa positions consumed
      assert(SeaStreamer.relayExactlyOnce(fconn, rconn, Seq("fb"),
        anchor = "fr") == 3L)
      assert(r.entries(RedisStreams.shardedKey("fb", 0L, true)).length == 3)
      assert(r.entries(RedisStreams.shardedKey("fa", 0L, true)).isEmpty)
      assert(SeaStreamer.relayLag(fconn, rconn, Seq("*"), "fr")
        .values.forall(_.drained), "filtered positions count as consumed")
      // the lag's pending bytes exclude the 128-byte container header:
      // a fresh one-frame directory reads exactly the frame bytes
      val dir2 = java.nio.file.Files.createTempDirectory("relayss2")
        .toFile.getAbsolutePath
      val w2 = new graft.ss.SsWriter(
        new java.io.FileOutputStream(s"$dir2/one.ss"), "one.ss", 1024, 0L)
      w2.write(graft.core.SeaMessage("h", 0L, 0L,
        new java.sql.Timestamp(1L), "h".getBytes("UTF-8")))
      w2.close()
      val frameBytes = new java.io.File(s"$dir2/one.ss").length() -
        graft.ss.SsFormat.HeaderSize
      val f2 = SeaStreamer.connect(s"file://$dir2", spark)
      assert(SeaStreamer.relayLag(f2, kconn, Seq("*"), "h2")(("one.ss", 0L))
        .behindBytes.contains(frameBytes),
        "pending bytes must exclude the container header")
      // file as a DESTINATION stays refused; '*' mixed with names refused
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, fconn, Seq("fa"), anchor = "x"))
        .getMessage.contains("destination"))
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(fconn, kconn, Seq("fa", "*"),
          anchor = "x")).getMessage.contains("ambiguous"))
    } finally { kc.close(); k.close(); r.close() }
  }

  test("iggy corners: an iggy endpoint relays through the one facade " +
      "surface into both brokers with record-counted lag; the wildcard " +
      "is refused off file sources") {
    val ig = new graft.iggy.EmbeddedIggy
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis
    val ic = new graft.iggy.IggyClient(ig.host, ig.port)
    val kc = new KafkaClient(k.host, k.port)
    try {
      ic.createStreamIfAbsent("graft")
      ic.createTopicIfAbsent("graft", "iq", 1)
      (0 until 5).foreach(i => ic.sendMessages("graft", "iq",
        graft.iggy.IggyWire.Partitioning.PartitionId(0),
        Seq((1000L + i, s"q$i".getBytes("UTF-8")))))
      val iconn = SeaStreamer.connect(s"iggy://${ig.host}:${ig.port}", spark)
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark)
      kc.metadata(Seq("iq"))
      val lag0 = SeaStreamer.relayLag(iconn, kconn, Seq("iq"), "iga")
      assert(lag0(("iq", 0L)).behindRecords.contains(5L), s"$lag0")
      assert(SeaStreamer.relayExactlyOnce(iconn, kconn, Seq("iq"),
        anchor = "iga") == 5L)
      assert(SeaStreamer.relayLag(iconn, kconn, Seq("iq"), "iga")
        .values.forall(l => l.drained && l.behindRecords.contains(0L)))
      assert(SeaStreamer.relayExactlyOnce(iconn, kconn, Seq("iq"),
        anchor = "iga") == 0L, "a drained iggy source must relay zero")
      // the redis corner, with its own anchor
      assert(SeaStreamer.relayExactlyOnce(iconn, rconn, Seq("iq"),
        anchor = "igr") == 5L)
      assert(r.entries(RedisStreams.shardedKey("iq", 0L, true)).length == 5)
      assert(SeaStreamer.relayLag(iconn, rconn, Seq("iq"), "igr")
        .values.forall(_.drained))
      // iggy stays refused as a DESTINATION, and '*' off non-file sources
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, iconn, Seq("iq"), anchor = "x"))
        .getMessage.contains("destination"))
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(iconn, kconn, Seq("*"), anchor = "x"))
        .getMessage.contains("wildcard"))
    } finally { ic.close(); kc.close(); ig.close(); k.close(); r.close() }
  }

  test("security threads through the facade relay: an AUTH'd redis end " +
      "relays and measures with credentials from the connect options; " +
      "wrong credentials surface as the client's typed AUTH error") {
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis(auth = Some(("relay", "relay-secret")))
    val kc = new KafkaClient(k.host, k.port)
    try {
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark,
        Map("redis.username" -> "relay", "redis.password" -> "relay-secret"))
      kc.metadata(Seq("sa"))
      (0 until 3).foreach(i => kc.produce("sa", 0,
        Seq((100L + i, null, s"s$i".getBytes("UTF-8")))))
      assert(SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("sa"),
        anchor = "saa") == 3L)
      assert(SeaStreamer.relayLag(kconn, rconn, Seq("sa"), "saa")
        .values.forall(_.drained))
      assert(r.entries(RedisStreams.shardedKey("sa", 0L, true)).length == 3)
      // wrong credentials: the RESP AUTH failure surfaces typed, not as a
      // silent empty relay
      val bad = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark,
        Map("redis.username" -> "relay", "redis.password" -> "nope"))
      intercept[Exception] {
        SeaStreamer.relayExactlyOnce(kconn, bad, Seq("sa"),
          anchor = "sab", rename = _ + "_x")
      }
      assert(r.entries(RedisStreams.shardedKey("sa_x", 0L, true)).isEmpty,
        "a failed AUTH must relay nothing")
    } finally { kc.close(); k.close(); r.close() }
  }

  test("typed errors: self-relay on a shared broker, cross-cluster " +
      "kafka→kafka, non-anchorable backends, clusters, empty/invalid keys") {
    val k = new EmbeddedKafka
    val k2 = new EmbeddedKafka
    val r = new EmbeddedRedis
    try {
      val kconn = SeaStreamer.connect(s"kafka://${k.host}:${k.port}", spark)
      val k2conn = SeaStreamer.connect(s"kafka://${k2.host}:${k2.port}", spark)
      val rconn = SeaStreamer.connect(s"redis://${r.host}:${r.port}", spark)
      val fconn = SeaStreamer.connect("file:///tmp/relay-spec", spark)
      // identity rename into the same broker: refused for BOTH same-scheme
      // pairs (it would chase its own appends)
      Seq(kconn -> kconn, rconn -> rconn).foreach { case (a, b) =>
        assert(intercept[SeaStreamErr.Unsupported](
          SeaStreamer.relayExactlyOnce(a, b, Seq("t"), anchor = "x"))
          .getMessage.contains("into itself"))
      }
      // cross-cluster kafka→kafka: the staged group offsets live on the
      // source cluster — refused, not silently downgraded
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, k2conn, Seq("t"), anchor = "x"))
        .getMessage.contains("cross-cluster"))
      // a file DESTINATION has no transactional/CAS primitive to anchor
      // on; a file SOURCE is valid (the shipper) but an empty directory
      // fails loud at connect-shape, never a silent zero-relay
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, fconn, Seq("t"), anchor = "x"))
        .getMessage.contains("destination"))
      assert(intercept[SeaStreamErr.Connect](
        SeaStreamer.relayExactlyOnce(fconn, kconn, Seq("t"), anchor = "x"))
        .getMessage.contains(".ss part files"))
      // multi-node endpoints route to the cluster-aware writer instead
      val cconn = SeaStreamer.connect(
        s"redis://${r.host}:${r.port},${r.host}:${r.port + 1}", spark)
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, cconn, Seq("t"), anchor = "x"))
        .getMessage.contains("single node"))
      // stream-key grammar holds at the facade boundary
      intercept[SeaStreamErr.StreamKeyEmpty.type](
        SeaStreamer.relayExactlyOnce(kconn, rconn, Seq.empty, anchor = "x"))
      intercept[SeaStreamErr.InvalidStreamKey](
        SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("bad key!"),
          anchor = "x"))
      // a NON-injective rename onto a redis destination would hand one
      // destination key to several concurrent relay tasks — refused at
      // plan time (kafka destinations append concurrently and keep
      // per-source ledgers, so they stay legal)
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(kconn, rconn, Seq("ta", "tb"),
          anchor = "x", rename = _ => "merged"))
        .getMessage.contains("INJECTIVE"))
    } finally { k.close(); k2.close(); r.close() }
  }

  test("endpoint identity is resolved, not spelled: localhost vs " +
      "127.0.0.1 of ONE broker triggers the self-relay refusal (an " +
      "aliased identity relay would chase its own appends forever), and " +
      "conversely a same-cluster kafka→kafka relay spelled two ways is " +
      "NOT refused as cross-cluster") {
    val k = new EmbeddedKafka
    val r = new EmbeddedRedis
    val kc = new KafkaClient(k.host, k.port)
    try {
      // embedded brokers bind 127.0.0.1 — reach the same socket via the
      // `localhost` alias on one end and the literal on the other
      val rLocal = SeaStreamer.connect(s"redis://localhost:${r.port}", spark)
      val rLit = SeaStreamer.connect(s"redis://127.0.0.1:${r.port}", spark)
      assert(intercept[SeaStreamErr.Unsupported](
        SeaStreamer.relayExactlyOnce(rLocal, rLit, Seq("al"), anchor = "aa"))
        .getMessage.contains("into itself"),
        "an aliased self-relay must still be recognized as one endpoint")
      // the same two spellings of one kafka cluster must RELAY (renamed),
      // not refuse as cross-cluster
      val kLocal = SeaStreamer.connect(s"kafka://localhost:${k.port}", spark)
      val kLit = SeaStreamer.connect(s"kafka://127.0.0.1:${k.port}", spark)
      kc.metadata(Seq("al"))
      (0 until 3).foreach(i => kc.produce("al", 0,
        Seq((100L + i, null, s"a$i".getBytes("UTF-8")))))
      assert(SeaStreamer.relayExactlyOnce(kLocal, kLit, Seq("al"),
        anchor = "ab", rename = _ + "_out") == 3L,
        "two spellings of one cluster must not read as cross-cluster")
      assert(kc.fetchIso("al_out", 0, 0L, readCommitted = true)._3
        .map(x => new String(x.value, "UTF-8")) == (0 until 3).map("a" + _))
    } finally { kc.close(); k.close(); r.close() }
  }
}
