package graft.iggy

import org.apache.spark.sql.SparkSession

import graft.kafka.{KafkaClient, KafkaEosIngest, KafkaTls, KafkaTxnProducer}
import graft.redis.{RedisClient, RedisStreams, Resp}
import IggyWire.PollStrategy

/** Exactly-once Iggy → broker relay — the last seekable backend joins
  * the relay matrix as a SOURCE (kafka, redis, `.ss` files and now iggy
  * can each drain into the two transactional destinations). Iggy's
  * offsets are dense per (topic, partition) exactly like kafka's
  * (sea-streamer-iggy/src/consumer.rs's offset polls), so the cursor is
  * the next-unrelayed offset, DESTINATION-anchored like every other
  * corner: staged under the consumer group inside the kafka transaction
  * with the source (topic, partition) as the synthetic coordinate, or
  * SET in a WATCH-fenced `prefix:{topic/part}` redis ledger atomically
  * with the entries. No Spark checkpoint, no iggy-side state (the
  * server's own group offsets stay untouched — the relay's resume point
  * must survive the source broker's loss).
  *
  * One epoch plans per-(topic, partition) ranges on the driver
  * (GetTopic tips + cursor reads — O(#partitions) RPCs, no data), pins
  * the tip so a live producer never unbounds a transaction, then each
  * partition relays in its own task with the matrix's rival-resolution
  * protocol: kafka tasks fence-then-read and retry on
  * INVALID_PRODUCER_EPOCH ([[KafkaEosIngest.retryFenced]]); redis tasks
  * WATCH-then-read and re-run on a nil'd EXEC. `relayKafkaAll` /
  * `relayRedisAll` drain until an epoch moves nothing.
  */
object IggyEosRelay {

  /** Every (topic, partition, tip) the source currently holds — the
    * epoch's pinned tips, cursor-agnostic (the caller filters).
    */
  private def tips(host: String, port: Int, iggyStream: String,
      topics: Seq[String],
      auth: (String, String)): Seq[(String, Int, Long)] = {
    val c = new IggyClient(host, port, username = auth._1,
      password = auth._2)
    try topics.flatMap { t =>
      c.topicTips(iggyStream, t).toSeq.flatMap(_.zipWithIndex.collect {
        case (tip, p) if tip > 0L => (t, p, tip)
      })
    } finally c.close()
  }

  /** One bounded exactly-once relay epoch into KAFKA; returns messages
    * relayed (0 = drained to the planned tips).
    */
  def relayKafkaOnce(spark: SparkSession,
      iggyHost: String, iggyPort: Int, iggyStream: String,
      topics: Seq[String], topicOf: String => String,
      kafkaHost: String, kafkaPort: Int, group: String, txnIdPrefix: String,
      cap: Long = 100000L, page: Int = 1000,
      iggyAuth: (String, String) = ("iggy", "iggy"),
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      tls: Option[KafkaTls.Client] = None,
      crashBeforeCommit: Option[String] = None): Long = {
    require(cap > 0, "cap must be positive")
    val all = tips(iggyHost, iggyPort, iggyStream, topics, iggyAuth)
    val planner = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
      saslMechanism = saslMechanism, tls = tls)
    val ranges = try {
      planner.findCoordinator(group)
      val committed =
        if (all.isEmpty) Map.empty[(String, Int), Long]
        else planner.fetchOffsets(group,
          all.groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2) })
      all.flatMap { case (t, p, tip) =>
        val cur = committed.getOrElse((t, p), 0L)
        if (tip > cur) Some((t, p, math.min(tip, cur + cap))) else None
      }
    } finally planner.close()
    if (ranges.isEmpty) 0L
    else spark.sparkContext.parallelize(ranges, ranges.size)
      .map { case (topic, part, tipNext) =>
        val ic = new IggyClient(iggyHost, iggyPort,
          username = iggyAuth._1, password = iggyAuth._2)
        def attempt(): Long = {
          val kc = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
            saslMechanism = saslMechanism, tls = tls)
          try {
            // fence FIRST, read the cursor second (the matrix's law)
            val producer = new KafkaTxnProducer(kc,
              s"$txnIdPrefix-$topic-$part").initTransactions()
            kc.findCoordinator(group)
            val committed = kc.fetchOffsets(group, Map(topic -> Seq(part)))
              .getOrElse((topic, part), 0L)
            if (committed >= tipNext) 0L
            else {
              val dst = topicOf(topic)
              val dstParts = kc.metadata(Seq(dst)).getOrElse(dst, Seq.empty)
              require(dstParts.size > part,
                s"destination $dst lacks partition $part")
              var next = committed
              var n = 0L
              while (next < tipNext) {
                val want = math.min(page.toLong, tipNext - next).toInt
                val (_, msgs) = ic.pollMessages(iggyStream, topic, part,
                  PollStrategy.AtOffset(next), want)
                val keep = msgs.takeWhile(_.offset < tipNext)
                if (keep.isEmpty)
                  throw new IllegalStateException(
                    s"relay stalled: $topic/$part poll at $next below the" +
                      s" planned tip $tipNext returned nothing")
                if (n == 0L) producer.begin()
                producer.send(dst, part,
                  keep.map(m => (m.tsMs, null: Array[Byte], m.payload)))
                n += keep.length
                next = keep.last.offset + 1L
              }
              producer.sendOffsetsToTransaction(group,
                Map((topic, part) -> next))
              if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
                throw new IllegalStateException(
                  s"injected crash: relay $topic/$part produced + staged," +
                    " not committed")
              producer.commit()
              n
            }
          } finally kc.close()
        }
        try KafkaEosIngest.retryFenced(s"iggy relay $topic/$part")(attempt())
        finally ic.close()
      }.sum().toLong
  }

  /** One bounded exactly-once relay epoch into REDIS (the WATCH-fenced
    * `ledgerPrefix:{topic/part}` cursor).
    */
  def relayRedisOnce(spark: SparkSession,
      iggyHost: String, iggyPort: Int, iggyStream: String,
      topics: Seq[String], streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      cap: Long = 100000L, page: Int = 1000,
      iggyAuth: (String, String) = ("iggy", "iggy"),
      tls: Option[RedisClient.Tls] = None,
      auth: Option[RedisClient.Auth] = None,
      crashBeforeCommit: Option[String] = None): Long = {
    require(cap > 0, "cap must be positive")
    def ledgerKey(t: String, p: Int) = s"$ledgerPrefix:{$t/$p}"
    def cursorOf(v: Resp.Value): Long = v match {
      case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
      case _ => 0L
    }
    val all = tips(iggyHost, iggyPort, iggyStream, topics, iggyAuth)
    val ledgers = new RedisClient(redisHost, redisPort, tls = tls, auth = auth)
    val ranges = try all.flatMap { case (t, p, tip) =>
      val cur = cursorOf(
        ledgers.command(RedisStreams.get(ledgerKey(t, p)): _*))
      if (tip > cur) Some((t, p, math.min(tip, cur + cap))) else None
    } finally ledgers.close()
    if (ranges.isEmpty) 0L
    else spark.sparkContext.parallelize(ranges, ranges.size)
      .map { case (topic, part, tipNext) =>
        val ic = new IggyClient(iggyHost, iggyPort,
          username = iggyAuth._1, password = iggyAuth._2)
        val rc = new RedisClient(redisHost, redisPort, tls = tls, auth = auth)
        val ledger = ledgerKey(topic, part)
        def attempt(): Long = {
          val dstKey = RedisStreams.shardedKey(streamOf(topic),
            part.toLong, sharded = true)
          // WATCH the ledger AND the destination key: a foreign writer
          // pushing the destination tip between the floor read below and
          // EXEC nils us BEFORE anything applies, instead of real redis
          // refusing the lower explicit id inside the EXEC while the
          // cursor SET still landed (erasable by task retry — silent loss)
          rc.command(RedisStreams.watch(ledger, dstKey): _*)
          val committed = cursorOf(rc.command(RedisStreams.get(ledger): _*))
          if (committed >= tipNext) {
            rc.command(RedisStreams.unwatch: _*)
            0L
          } else {
            // destination tip ms floor, read UNDER the watch (pre-MULTI)
            var lastMs = RedisStreams.decodeEntriesWithIds(
              rc.command(RedisStreams.xrevrangeTip(dstKey): _*), "", 0L)
              .headOption.map(e =>
                RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
            rc.command(RedisStreams.multi: _*)
            var next = committed
            var n = 0L
            while (next < tipNext) {
              val want = math.min(page.toLong, tipNext - next).toInt
              val (_, msgs) = ic.pollMessages(iggyStream, topic, part,
                PollStrategy.AtOffset(next), want)
              val keep = msgs.takeWhile(_.offset < tipNext)
              if (keep.isEmpty)
                throw new IllegalStateException(
                  s"relay stalled: $topic/$part poll at $next below the" +
                    s" planned tip $tipNext returned nothing")
              keep.grouped(500).foreach { chunk =>
                rc.pipeline(chunk.map { m =>
                  // running clamp on top of the floor (iggy offsets are
                  // ts-monotone per partition by the sink's discipline,
                  // but a foreign producer need not be)
                  lastMs = math.max(m.tsMs, lastMs)
                  RedisStreams.xadd(dstKey, lastMs, m.payload)
                }).collectFirst { case Resp.Err(msg) =>
                  throw new IllegalStateException(
                    s"MULTI queue refused: $msg")
                }
              }
              n += keep.length
              next = keep.last.offset + 1L
            }
            rc.command(RedisStreams.set(ledger, next.toString): _*)
            if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
              throw new IllegalStateException(
                s"injected crash: relay $topic/$part queued, not EXECed")
            rc.command(RedisStreams.exec: _*) match {
              case Resp.Err(m) =>
                throw new IllegalStateException(s"EXEC failed: $m")
              case Resp.NullArr => -1L // a rival won the watched ledger
              case Resp.Arr(rs) =>
                rs.collectFirst { case Resp.Err(m) =>
                  throw new IllegalStateException(
                    s"EXEC element refused (state needs repair): $m")
                }
                n
              case other =>
                throw new IllegalStateException(s"EXEC reply: $other")
            }
          }
        }
        try {
          var relayed = -1L
          var attempts = 0
          while (relayed < 0L) {
            relayed = attempt()
            if (relayed < 0L) {
              attempts += 1
              require(attempts <= 5,
                s"iggy relay $topic/$part: EXEC nil'd $attempts times — " +
                  "a live rival keeps moving the ledger")
            }
          }
          relayed
        } finally { ic.close(); rc.close() }
      }.sum().toLong
  }

  /** Drain the source completely: epochs until one moves nothing. */
  def relayKafkaAll(spark: SparkSession,
      iggyHost: String, iggyPort: Int, iggyStream: String,
      topics: Seq[String], topicOf: String => String,
      kafkaHost: String, kafkaPort: Int, group: String, txnIdPrefix: String,
      cap: Long = 100000L, page: Int = 1000,
      iggyAuth: (String, String) = ("iggy", "iggy"),
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      tls: Option[KafkaTls.Client] = None): Long = {
    var total = 0L
    var moved = -1L
    while (moved != 0L) {
      moved = relayKafkaOnce(spark, iggyHost, iggyPort, iggyStream, topics,
        topicOf, kafkaHost, kafkaPort, group, txnIdPrefix, cap, page,
        iggyAuth, sasl, saslMechanism, tls)
      total += moved
    }
    total
  }

  /** Same drain for the redis destination. */
  def relayRedisAll(spark: SparkSession,
      iggyHost: String, iggyPort: Int, iggyStream: String,
      topics: Seq[String], streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      cap: Long = 100000L, page: Int = 1000,
      iggyAuth: (String, String) = ("iggy", "iggy"),
      tls: Option[RedisClient.Tls] = None,
      auth: Option[RedisClient.Auth] = None): Long = {
    var total = 0L
    var moved = -1L
    while (moved != 0L) {
      moved = relayRedisOnce(spark, iggyHost, iggyPort, iggyStream, topics,
        streamOf, redisHost, redisPort, ledgerPrefix, cap, page,
        iggyAuth, tls, auth)
      total += moved
    }
    total
  }
}
