package graft

import org.scalatest.funsuite.AnyFunSuite

/** Live-broker integration readiness — the reference's own gate
  * (sea-streamer-redis/tests/realtime.rs:4-8 runs only when the
  * `BROKERS_URL` env names a real endpoint; sea-streamer-kafka/tests/
  * consumer.rs likewise). Every other suite in this repo exercises the
  * wire paths against in-process embedded brokers; THIS one points the
  * same clients at real binaries the day one exists.
  *
  * Activation: set `BROKERS_URL` to a scheme-qualified endpoint
  * (`kafka://host:9092`, `redis://host:6379`, `iggy://host:8090`) — the
  * scheme picks which backend's test runs — or the per-backend overrides
  * `KAFKA_BROKERS_URL` / `REDIS_BROKERS_URL` / `IGGY_BROKERS_URL` (all
  * three may be set at once). `IGGY_USER`/`IGGY_PASSWORD` default to the
  * stock iggy/iggy. Without any of these the tests self-cancel (the
  * suite stays green in the zero-egress sandbox); with them, each test
  * is a k1/r1/i1-shaped produce → read-back round trip over a unique
  * per-run key, so re-runs against a dirty broker stay deterministic.
  *
  * Run: `BROKERS_URL=redis://localhost:6379 sbt "testOnly graft.LiveBrokerSpec"`.
  */
class LiveBrokerSpec extends AnyFunSuite {

  /** host:port for `scheme`, from the override var or a scheme-matching
    * BROKERS_URL (the reference's single-var convention). Empty vars are
    * as good as unset.
    */
  private def endpoint(scheme: String, overrideVar: String): Option[(String, Int)] = {
    val url = sys.env.get(overrideVar).filter(_.trim.nonEmpty).orElse(
      sys.env.get("BROKERS_URL").filter(_.startsWith(scheme + "://")))
    url.map { u =>
      assert(u.startsWith(scheme + "://"),
        s"$overrideVar must be $scheme://host:port, got $u")
      val hp = u.stripPrefix(scheme + "://").stripSuffix("/").split(":", 2)
      (hp(0), hp.lift(1).map(_.toInt).getOrElse(
        scheme match { case "kafka" => 9092; case "redis" => 6379
          case _ => 8090 }))
    }
  }

  private def uniqueKey(prefix: String): String =
    prefix + "_" + System.currentTimeMillis() + "_" +
      (scala.util.Random.nextInt(90000) + 10000)

  private val N = 10

  test("kafka: k1-shape roundtrip against a live broker (BROKERS_URL)") {
    val ep = endpoint("kafka", "KAFKA_BROKERS_URL")
    assume(ep.isDefined, "no live kafka broker configured — skipping")
    val (host, port) = ep.get
    val topic = uniqueKey("graft_live")
    val c = new kafka.KafkaClient(host, port)
    try {
      val parts = c.metadata(Seq(topic)).getOrElse(topic, Seq.empty)
      assert(parts.nonEmpty, s"broker did not auto-create/serve $topic " +
        "(set auto.create.topics.enable or pre-create it)")
      val p = parts.head
      val base = c.produce(topic, p,
        (0 until N).map(i => (1700000000000L + i, null: Array[Byte],
          s"live-$i".getBytes("UTF-8"))))
      val (_, recs) = c.fetch(topic, p, base)
      assert(recs.take(N).map(r => new String(r.value, "UTF-8")) ==
        (0 until N).map(i => s"live-$i"))
      // the seek law holds on a real broker too: first ts >= target
      assert(c.listOffset(topic, p, 1700000000005L).contains(base + 5))
    } finally c.close()
  }

  test("kafka: k6-shape transactions against a live broker (BROKERS_URL)") {
    // the txn surface is the least embedded-validated part of the wire
    // driver — the day a real Apache broker exists, this closes the
    // KIP-98 gap end-to-end: commit visible, abort invisible under
    // read_committed, markers skipped
    val ep = endpoint("kafka", "KAFKA_BROKERS_URL")
    assume(ep.isDefined, "no live kafka broker configured — skipping")
    val (host, port) = ep.get
    val topic = uniqueKey("graft_live_txn")
    val c = new kafka.KafkaClient(host, port)
    try {
      val parts = c.metadata(Seq(topic)).getOrElse(topic, Seq.empty)
      assume(parts.nonEmpty, s"broker did not auto-create $topic")
      val p = parts.head
      val good = new kafka.KafkaTxnProducer(c, topic + "-good")
        .initTransactions()
      val bad = new kafka.KafkaTxnProducer(c, topic + "-bad")
        .initTransactions()
      bad.begin()
      bad.send(topic, p, Seq((1L, null, "poison".getBytes("UTF-8"))))
      bad.abort()
      good.begin()
      good.send(topic, p, Seq((2L, null, "real".getBytes("UTF-8"))))
      good.commit()
      val (_, _, rc) = c.fetchIso(topic, p, 0L, readCommitted = true)
      assert(rc.map(r => new String(r.value, "UTF-8")) == Seq("real"),
        s"read_committed leaked: ${rc.map(r => new String(r.value, "UTF-8"))}")
      // read_uncommitted sees both data records (control rows never)
      val (_, ru) = c.fetch(topic, p, 0L)
      assert(ru.map(r => new String(r.value, "UTF-8")) ==
        Seq("poison", "real"))
    } finally c.close()
  }

  test("redis: r1-shape roundtrip against a live broker (BROKERS_URL)") {
    val ep = endpoint("redis", "REDIS_BROKERS_URL")
    assume(ep.isDefined, "no live redis broker configured — skipping")
    val (host, port) = ep.get
    val key = uniqueKey("graft_live")
    val c = new redis.RedisClient(host, port)
    try {
      (0 until N).foreach { i =>
        c.command(redis.RedisStreams.xadd(key, 1700000000000L + i,
          s"live-$i".getBytes("UTF-8")): _*)
      }
      val got = redis.RedisClient.retrying() {
        c.command(redis.RedisStreams.xrange(key): _*)
      }
      val entries = got match {
        case redis.Resp.Arr(items) => items
        case other => fail(s"unexpected XRANGE reply: $other")
      }
      assert(entries.length == N, s"wrote $N, read ${entries.length}")
      // cleanup so re-runs don't accumulate on the live instance (XTRIM
      // MAXLEN 0 — the stream-native form; DEL isn't guaranteed here)
      c.command(redis.RedisStreams.xtrimMaxLen(key, 0): _*)
    } finally c.close()
  }

  test("iggy: i1-shape roundtrip against a live broker (BROKERS_URL)") {
    val ep = endpoint("iggy", "IGGY_BROKERS_URL")
    assume(ep.isDefined, "no live iggy broker configured — skipping")
    val (host, port) = ep.get
    val stream = uniqueKey("graft_live")
    val c = new iggy.IggyClient(host, port,
      sys.env.getOrElse("IGGY_USER", "iggy"),
      sys.env.getOrElse("IGGY_PASSWORD", "iggy"))
    try {
      c.createStreamIfAbsent(stream)
      c.createTopicIfAbsent(stream, "t", partitions = 1)
      c.sendMessages(stream, "t", graft.iggy.IggyWire.Partitioning.PartitionId(0),
        (0 until N).map(i => (1700000000000L + i,
          s"live-$i".getBytes("UTF-8"))))
      val (_, msgs) = c.pollMessages(stream, "t", 0,
        graft.iggy.IggyWire.PollStrategy.First, N)
      assert(msgs.map(m => new String(m.payload, "UTF-8")) ==
        (0 until N).map(i => s"live-$i"))
    } finally c.close()
  }
}
