package graft.redis

import org.apache.spark.sql.SparkSession

import graft.kafka.{KafkaClient, KafkaTls, KafkaWire}

/** Exactly-once Kafka→Redis relay — the DESTINATION-anchored twin of
  * [[graft.kafka.KafkaEosRelay]]. The kafka relay stages source offsets
  * inside the kafka transaction (sea-streamer-kafka/src/producer.rs:
  * 236-301's send_offsets_to_transaction); when the destination is redis
  * there is no kafka transaction to stage into, so the resume point
  * moves INTO the destination store: each (topic, partition) keeps its
  * committed source offset in a redis ledger key
  * `prefix:{<topic>/<partition>}`, and every relay transaction commits
  * the partition's entries AND the advanced offset in ONE WATCH-fenced
  * MULTI/EXEC. This is the classic consume-kafka/write-store-with-
  * offsets-in-store pattern: no Spark checkpoint, no kafka group — kill
  * the driver, lose everything but redis, restart anywhere, and the
  * ledger says exactly what landed.
  *
  * One epoch ([[relayOnce]]) plans per-(topic, partition) ranges
  * [committed, min(LSO, committed + cap)) on the driver (Metadata +
  * ledger GETs + one isolation-probe fetch — O(#partitions) RPCs, no
  * data), then each range relays in its own task: WATCH the ledger,
  * re-read the committed offset UNDER the watch (a rival attempt of the
  * same range — speculative task, stalled-but-alive zombie — can no
  * longer win silently: the first EXEC moves the watched key, every
  * other EXEC nils out), fetch read_committed pages, queue every XADD
  * plus the advanced-offset SET in one MULTI, EXEC. A crash anywhere
  * before EXEC takes the connection and its queue with it — no entries,
  * no offset move, the next epoch re-relays the same range.
  * [[relayAll]] loops epochs until a pass moves nothing.
  *
  * The ledger key hash-tags the braced `<topic>/<partition>` pair, and
  * the destination stream key is `streamOf(topic):partition` — on a
  * redis CLUSTER deployment the per-partition transaction must keep
  * both in one hash slot, which [[RedisSource.writeExactlyOnceCluster]]
  * demonstrates with per-key tags; this single-node form keeps the
  * reference consumer's `stream:shard` key naming readable instead.
  *
  * Scale shape: tasks are independent single-connection relays, one per
  * (topic, partition) — data bytes never touch the driver; `cap` bounds
  * the per-epoch MULTI (redis holds the whole queue in memory until
  * EXEC, so cap is the transaction-size pressure valve).
  */
object RedisEosRelay {

  private def ledgerKey(prefix: String, topic: String, part: Int): String =
    s"$prefix:{$topic/$part}"

  /** One bounded exactly-once relay epoch; returns records relayed
    * (0 = fully drained). `streamOf` maps source topic → destination
    * stream name; the source partition becomes the shard.
    * `crashBeforeCommit` is [[graft.ops.Failpoints]]' one-shot token —
    * the matching task dies with its MULTI queued, before EXEC.
    */
  def relayOnce(spark: SparkSession,
      kafkaHost: String, kafkaPort: Int, topics: Seq[String],
      streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      cap: Long = 100000L, maxFetchBytes: Int = 1 << 20,
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      kafkaTls: Option[KafkaTls.Client] = None,
      redisTls: Option[RedisClient.Tls] = None,
      redisAuth: Option[RedisClient.Auth] = None,
      crashBeforeCommit: Option[String] = None,
      raceAfterRead: Option[String] = None): Long = {
    require(cap > 0, "cap must be positive")
    val planner = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
      saslMechanism = saslMechanism, tls = kafkaTls)
    val ledgers = new RedisClient(redisHost, redisPort,
      tls = redisTls, auth = redisAuth)
    val ranges = try {
      val meta = planner.metadata(topics)
      topics.flatMap { t =>
        meta.getOrElse(t, Seq.empty).map { p =>
          val committed =
            ledgers.command(RedisStreams.get(ledgerKey(ledgerPrefix, t, p)): _*) match {
              case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
              case _ => 0L
            }
          // the relayable tip is the LSO (read_committed): aborted and
          // still-open source transactions must never land in redis
          val hw = planner.listOffset(t, p, KafkaWire.Ts.Latest).getOrElse(0L)
          val lso = planner.fetchIso(t, p, hw, maxBytes = 1,
            readCommitted = true)._1
          (t, p, committed, math.min(lso, committed + cap))
        }
      }.filter(r => r._4 > r._3)
    } finally { planner.close(); ledgers.close() }
    if (ranges.isEmpty) 0L
    else spark.sparkContext.parallelize(ranges, ranges.size)
      .map { case (topic, part, _, until) =>
        val kc = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
          saslMechanism = saslMechanism, tls = kafkaTls)
        val rc = new RedisClient(redisHost, redisPort,
          tls = redisTls, auth = redisAuth)
        def attempt(): Long = {
          val ledger = ledgerKey(ledgerPrefix, topic, part)
          val stream = streamOf(topic)
          val key = RedisStreams.shardedKey(stream, part.toLong,
            sharded = true)
          // WATCH FIRST — the ledger AND the destination key — then
          // re-read the resume point under the watch: the driver's
          // planning GET is advisory only (a rival attempt landing after
          // it nils our EXEC), and watching the DATA key makes the tip-ms
          // floor below race-free: a foreign writer pushing the
          // destination tip between the floor read and EXEC nils us
          // BEFORE anything applies, instead of real redis refusing the
          // lower explicit id inside the EXEC while the cursor SET still
          // landed (that loud throw is erasable — the task retry would
          // see the advanced cursor, skip, and silently lose entries)
          rc.command(RedisStreams.watch(ledger, key): _*)
          val committed = rc.command(RedisStreams.get(ledger): _*) match {
            case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
            case _ => 0L
          }
          raceAfterRead.foreach(graft.ops.Failpoints.fireHook)
          if (committed >= until) {
            rc.command(RedisStreams.unwatch: _*)
            0L // range already landed — replay/rival skip
          } else {
            // the destination key's current tip ms, read UNDER the watch
            // before the MULTI opens: kafka record timestamps need not be
            // monotonic. Clamp every id to max(record ts, floor, running
            // max).
            var lastMs = RedisStreams.decodeEntriesWithIds(
              rc.command(RedisStreams.xrevrangeTip(key): _*), "", 0L)
              .headOption.map(e =>
                RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
            rc.command(RedisStreams.multi: _*)
            var next = committed
            var n = 0L
            while (next < until) {
              val (_, page, recs) = kc.fetchIso(topic, part, next,
                maxFetchBytes, readCommitted = true)
              if (page <= next) {
                // empty page below an LSO-capped until: only retention
                // truncation may fast-forward (KafkaEosRelay's rule)
                val logStart = kc
                  .listOffset(topic, part, KafkaWire.Ts.Earliest)
                  .getOrElse(0L)
                if (logStart > next) next = math.min(logStart, until)
                else throw new IllegalStateException(
                  s"relay stalled: $topic/$part fetch at $next returned " +
                    s"no progress (page=$page) but log starts at $logStart")
              } else {
                val keep = recs.takeWhile(_.offset < until)
                keep.grouped(500).foreach { chunk =>
                  rc.pipeline(chunk.map { r =>
                    lastMs = math.max(r.tsMs, lastMs)
                    RedisStreams.xadd(key, lastMs, r.value)
                  }).collectFirst { case Resp.Err(m) =>
                    throw new IllegalStateException(
                      s"MULTI queue refused: $m")
                  }
                }
                n += keep.length
                next = math.min(page, until)
              }
            }
            // the advanced offset queues LAST, inside the same MULTI —
            // entries and resume point commit atomically at EXEC
            rc.command(RedisStreams.set(ledger, until.toString): _*)
            if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
              throw new IllegalStateException(
                s"injected crash: relay $topic/$part queued, not EXECed")
            rc.command(RedisStreams.exec: _*) match {
              case Resp.Err(m) =>
                throw new IllegalStateException(s"EXEC failed: $m")
              case Resp.NullArr => -1L // a rival won the watched ledger
              case Resp.Arr(rs) =>
                // EXEC executes every queued command even when one errors
                // (real redis) — an element error means entries were
                // refused while the ledger SET landed: LOUD, never silent
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
        // a nil'd EXEC means a rival attempt (a killed-but-alive task of
        // a failed prior epoch) committed FIRST and moved the ledger. Its
        // commit may cover less than OUR `until` (its epoch planned
        // earlier), so "skip" would under-deliver: re-run the body — the
        // re-read offset absorbs the rival's commit, only the remainder
        // relays. Each rival moves the ledger strictly forward, so
        // retries are bounded by the rival count; past the bound fail LOUD.
        try {
          var relayed = -1L
          var attempts = 0
          while (relayed < 0L) {
            relayed = attempt()
            if (relayed < 0L) {
              attempts += 1
              require(attempts <= 5,
                s"relay $topic/$part: EXEC nil'd $attempts times — a " +
                  "live rival keeps moving the ledger (two concurrent " +
                  "relays of the same ranges?)")
            }
          }
          relayed
        } finally { kc.close(); rc.close() }
      }.sum().toLong
  }

  /** Drain the source completely: epochs until one moves nothing. */
  def relayAll(spark: SparkSession,
      kafkaHost: String, kafkaPort: Int, topics: Seq[String],
      streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      cap: Long = 100000L,
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      kafkaTls: Option[KafkaTls.Client] = None,
      redisTls: Option[RedisClient.Tls] = None,
      redisAuth: Option[RedisClient.Auth] = None): Long = {
    var total = 0L
    var moved = -1L
    while (moved != 0L) {
      moved = relayOnce(spark, kafkaHost, kafkaPort, topics, streamOf,
        redisHost, redisPort, ledgerPrefix, cap,
        sasl = sasl, saslMechanism = saslMechanism, kafkaTls = kafkaTls,
        redisTls = redisTls, redisAuth = redisAuth)
      total += moved
    }
    total
  }
}
