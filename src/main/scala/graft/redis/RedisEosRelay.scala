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
  * data), then each range relays in its own task: fetch the
  * read_committed pages into a bounded in-memory buffer FIRST
  * (unwatched — the slow phase must not widen the watch window), then
  * WATCH the ledger AND the destination key, re-read the committed
  * offset under the watch (a rival attempt of the same range —
  * speculative task, stalled-but-alive zombie — can no longer win
  * silently: the first EXEC moves a watched key, every other EXEC nils
  * out, and a rival's partial commit filters exactly by record
  * offset), read the destination tip-ms floor, queue every XADD plus
  * the advanced-offset SET in one MULTI, EXEC. A nil re-queues from
  * memory with a fresh offset and floor after a jittered sit-out. A
  * crash anywhere before EXEC takes the connection and its queue with
  * it — no entries, no offset move, the next epoch re-relays the same
  * range. [[relayAll]] loops epochs until a pass moves nothing.
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
        val ledger = ledgerKey(ledgerPrefix, topic, part)
        val stream = streamOf(topic)
        val key = RedisStreams.shardedKey(stream, part.toLong,
          sharded = true)
        def plainCursor(): Long =
          rc.command(RedisStreams.get(ledger): _*) match {
            case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
            case _ => 0L
          }
        // Fetch [from, until) into a bounded buffer UNWATCHED: the
        // read_committed paging is the slow phase, and holding the
        // destination-key WATCH across it would let ANY foreign append
        // on the destination stream nil the EXEC — a relay into a
        // stream a plain producer also feeds (legal; the tip-ms floor
        // clamp exists for exactly that) must ride out contention, not
        // livelock on a multi-second window.
        def readSource(from: Long): Vector[(Long, Long, Array[Byte])] = {
          val out = Vector.newBuilder[(Long, Long, Array[Byte])]
          var next = from
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
              out ++= recs.takeWhile(_.offset < until)
                .map(r => (r.offset, r.tsMs, r.value))
              next = math.min(page, until)
            }
          }
          out.result()
        }
        /** WATCH-fenced commit of the buffered batch: the watch window
          * is queue + EXEC only, a nil re-queues from memory with a
          * fresh offset AND floor, and a rival's partial commit filters
          * frame-exactly by record offset.
          */
        def commitBuffered(buffer: Vector[(Long, Long, Array[Byte])]): Long = {
          var attempts = 0
          while (true) {
            rc.command(RedisStreams.watch(ledger, key): _*)
            val committed = plainCursor()
            raceAfterRead.foreach(graft.ops.Failpoints.fireHook)
            if (committed >= until) {
              rc.command(RedisStreams.unwatch: _*)
              return 0L // range already landed — replay/rival skip
            }
            // a rival may have committed a PREFIX (its epoch planned a
            // shorter range) — relay only the remainder, exactly once
            val live = buffer.filter(_._1 >= committed)
            // the destination key's current tip ms, read UNDER the watch
            // before the MULTI opens: kafka record timestamps need not
            // be monotonic — clamp every id to max(record ts, floor,
            // running max). A foreign push after this read nils the EXEC
            // before anything applies, never real redis refusing the
            // lower explicit id INSIDE the EXEC while the cursor SET
            // landed (erasable by a task retry = silent loss).
            var lastMs = RedisStreams.decodeEntriesWithIds(
              rc.command(RedisStreams.xrevrangeTip(key): _*), "", 0L)
              .headOption.map(e =>
                RedisStreams.parseEntryId(e._1)._1).getOrElse(0L)
            rc.command(RedisStreams.multi: _*)
            // pipelineRaw: pipeline() throws on the first Err with the
            // remaining replies unread — the refusal check must fire AND
            // keep the connection drained
            live.grouped(2000).foreach { chunk =>
              rc.pipelineRaw(chunk.map { case (_, tsMs, value) =>
                lastMs = math.max(tsMs, lastMs)
                RedisStreams.xadd(key, lastMs, value)
              }).collectFirst { case Resp.Err(m) =>
                throw new IllegalStateException(s"MULTI queue refused: $m")
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
              case Resp.NullArr =>
                // a watched key moved: a rival attempt, or a foreign
                // append on the destination — nothing applied; retry
                // with a jittered sit-out (fresh offset + floor each
                // time)
                attempts += 1
                require(attempts <= 8,
                  s"relay $topic/$part: EXEC nil'd $attempts times — a " +
                    "live rival or a foreign producer keeps touching " +
                    "the ledger/destination key")
                Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom
                  .current().nextLong(math.min(50L * attempts, 400L)))
              case Resp.Arr(rs) =>
                // EXEC executes every queued command even when one
                // errors (real redis) — an element error means entries
                // were refused while the ledger SET landed: LOUD, never
                // silent (unreachable for the id class by construction)
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
          if (from >= until) 0L
          else {
            val buffer = readSource(from)
            if (buffer.isEmpty) {
              // a fully-truncated/aborted range still advances the
              // cursor under the same fence (consumed positions)
              commitBuffered(Vector.empty[(Long, Long, Array[Byte])])
            } else commitBuffered(buffer)
          }
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
