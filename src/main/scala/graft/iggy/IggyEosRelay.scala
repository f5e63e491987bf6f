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
        val dstKey = RedisStreams.shardedKey(streamOf(topic),
          part.toLong, sharded = true)
        def plainCursor(): Long =
          cursorOf(rc.command(RedisStreams.get(ledger): _*))
        // Poll [from, tipNext) into a bounded buffer UNWATCHED: the
        // paging is the slow phase, and holding the destination-key
        // WATCH across it would let ANY foreign append on the
        // destination nil the EXEC — relays into streams a plain
        // producer also feeds must ride out contention, not livelock.
        def readSource(from: Long): Vector[(Long, Long, Array[Byte])] = {
          val out = Vector.newBuilder[(Long, Long, Array[Byte])]
          var next = from
          while (next < tipNext) {
            val want = math.min(page.toLong, tipNext - next).toInt
            val (_, msgs) = ic.pollMessages(iggyStream, topic, part,
              PollStrategy.AtOffset(next), want)
            val keep = msgs.takeWhile(_.offset < tipNext)
            if (keep.isEmpty)
              throw new IllegalStateException(
                s"relay stalled: $topic/$part poll at $next below the" +
                  s" planned tip $tipNext returned nothing")
            out ++= keep.map(m => (m.offset, m.tsMs, m.payload))
            next = keep.last.offset + 1L
          }
          out.result()
        }
        /** WATCH-fenced commit of the buffered batch: the watch window
          * is queue + EXEC only, a nil re-queues from memory with a
          * fresh cursor AND floor, a rival's partial commit filters by
          * record offset.
          */
        def commitBuffered(buffer: Vector[(Long, Long, Array[Byte])]): Long = {
          var attempts = 0
          while (true) {
            rc.command(RedisStreams.watch(ledger, dstKey): _*)
            val committed = plainCursor()
            if (committed >= tipNext) {
              rc.command(RedisStreams.unwatch: _*)
              return 0L
            }
            val live = buffer.filter(_._1 >= committed)
            // destination tip ms floor, read UNDER the watch (pre-MULTI):
            // a foreign push after this read nils the EXEC before
            // anything applies — never real redis refusing the lower
            // explicit id INSIDE the EXEC while the cursor SET landed
            var lastMs = RedisStreams.decodeEntriesWithIds(
              rc.command(RedisStreams.xrevrangeTip(dstKey): _*), "", 0L)
              .headOption.map(e =>
                RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
            rc.command(RedisStreams.multi: _*)
            // pipelineRaw: pipeline() throws on the first Err with the
            // remaining replies unread — the refusal check must fire
            // AND keep the connection drained
            live.grouped(2000).foreach { chunk =>
              rc.pipelineRaw(chunk.map { case (_, tsMs, payload) =>
                // running clamp on top of the floor (iggy offsets are
                // ts-monotone per partition by the sink's discipline,
                // but a foreign producer need not be)
                lastMs = math.max(tsMs, lastMs)
                RedisStreams.xadd(dstKey, lastMs, payload)
              }).collectFirst { case Resp.Err(msg) =>
                throw new IllegalStateException(
                  s"MULTI queue refused: $msg")
              }
            }
            rc.command(RedisStreams.set(ledger, tipNext.toString): _*)
            if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
              throw new IllegalStateException(
                s"injected crash: relay $topic/$part queued, not EXECed")
            rc.command(RedisStreams.exec: _*) match {
              case Resp.Err(m) =>
                throw new IllegalStateException(s"EXEC failed: $m")
              case Resp.NullArr =>
                // a watched key moved: rival attempt or foreign append —
                // nothing applied; retry with a jittered sit-out
                attempts += 1
                require(attempts <= 8,
                  s"iggy relay $topic/$part: EXEC nil'd $attempts times " +
                    "— a live rival or a foreign producer keeps touching" +
                    " the ledger/destination key")
                Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom
                  .current().nextLong(math.min(50L * attempts, 400L)))
              case Resp.Arr(rs) =>
                rs.collectFirst { case Resp.Err(m) =>
                  throw new IllegalStateException(
                    s"EXEC element refused (state needs repair): $m")
                }
                return live.length.toLong
              case other =>
                throw new IllegalStateException(s"EXEC reply: $other")
            }
          }
          0L // unreachable
        }
        try {
          val from = plainCursor()
          if (from >= tipNext) 0L
          else commitBuffered(readSource(from))
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
