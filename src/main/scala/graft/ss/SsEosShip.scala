package graft.ss

import org.apache.spark.sql.SparkSession

import graft.kafka.{KafkaClient, KafkaEosIngest, KafkaTls, KafkaTxnProducer,
  KafkaWire}
import graft.redis.{RedisClient, RedisStreams, Resp}

/** Exactly-once `.ss` file → broker shipper — the relay matrix extended
  * to the reference's file backend as a SOURCE (log shipping: the file
  * backend exists to dump a stream to disk and replay it later,
  * sea-streamer-file/src/lib.rs; shipping that dump into kafka/redis
  * without loss or duplication is the production follow-up). A file
  * destination stays refused across the matrix — the filesystem has no
  * transaction or compare-and-set to anchor a resume point on.
  *
  * The cursor is the file's FRAME-EXACT BYTE OFFSET after the last
  * shipped frame, one cursor per part file (identified by file NAME, so
  * a relocated directory resumes), anchored in the destination exactly
  * like the other corners: staged under the consumer group inside the
  * kafka transaction, or SET in a WATCH-fenced `prefix:{file}` ledger
  * key atomically with the redis entries. No Spark checkpoint, no
  * source-side state — the file itself never changes.
  *
  * One epoch ([[shipOnce]]) plans per-file ranges on the driver
  * ([[SsOffsetWalk.safeEnd]] caps the tip at the last COMPLETE frame —
  * a live appender's torn tail is never shipped — and `capBytes` bounds
  * the per-epoch transaction), then each file ships in its own task,
  * sequentially reading `[cursor, until)` — the per-file sequential
  * read IS the medium; parallelism comes from the file count, exactly
  * how a `format("ss")` directory lays out one part file per writing
  * partition. Kafka tasks fence-then-read like [[KafkaEosIngest]]
  * (rival incarnations resolve in-task via
  * [[KafkaEosIngest.retryFenced]]); redis tasks WATCH-then-read with
  * the nil-means-rival retry.
  *
  * Destination mapping: topic/stream = `renameTo(stream_key)`,
  * partition = `floorMod(shard_id, partitions)` (the
  * [[graft.kafka.KafkaEosSink]] mapping); redis keys are
  * `stream:shard`. Redis entry ids clamp each key's ms to monotone
  * (real redis refuses non-monotonic explicit ids; FRAME ORDER is the
  * contract worth keeping — the payload carries its own time).
  * `onlyStreams` optionally ships a subscription subset; skipped frames
  * still advance the cursor (they are consumed positions, exactly like
  * aborted slots on a kafka source).
  */
object SsEosShip {

  private def fileKey(path: String): String =
    new java.io.File(path).getName

  /** Run `f` over the frames of `[from, until)` (stream-filtered), with
    * the reader closed either way — takeWhile stops short of exhausting
    * the underlying reader, so closure cannot ride iterator exhaustion.
    */
  private def eachFrames[T](path: String, from: Long, until: Long,
      onlyStreams: Option[Set[String]])(f: Iterator[SsRecord] => T): T = {
    val reader = SsReader.openAtOffset(path,
      math.max(from, SsFormat.HeaderSize.toLong))
    try f(reader.iterator.takeWhile(_.endOffset <= until)
      .filter(r => onlyStreams.forall(_.contains(r.message.stream_key))))
    finally reader.close()
  }

  /** One bounded exactly-once ship epoch into KAFKA; returns frames
    * shipped (0 = drained to the planned tips — note a fully-filtered
    * range still counts its cursor advance as progress via the records
    * it skipped, so `shipAll` terminates).
    */
  def shipKafkaOnce(spark: SparkSession, paths: Seq[String],
      topicOf: String => String,
      kafkaHost: String, kafkaPort: Int, group: String, txnIdPrefix: String,
      capBytes: Long = 64L << 20, page: Int = 1000, partitions: Int = 4,
      onlyStreams: Option[Set[String]] = None,
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      tls: Option[KafkaTls.Client] = None,
      crashBeforeCommit: Option[String] = None): Long = {
    require(capBytes > 0, "capBytes must be positive")
    val planner = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
      saslMechanism = saslMechanism, tls = tls)
    val ranges = try {
      planner.findCoordinator(group)
      val committed = planner.fetchOffsets(group,
        paths.map(p => fileKey(p) -> Seq(0)).toMap)
      paths.flatMap { p =>
        val from = committed.getOrElse((fileKey(p), 0), 0L)
        val until = SsOffsetWalk.safeEnd(p, from, capBytes).offset
        if (until > from) Some((p, until)) else None
      }
    } finally planner.close()
    if (ranges.isEmpty) 0L
    else spark.sparkContext.parallelize(ranges, ranges.size)
      .map { case (path, until) =>
        val key = fileKey(path)
        def attempt(): Long = {
          val kc = new KafkaClient(kafkaHost, kafkaPort, sasl = sasl,
            saslMechanism = saslMechanism, tls = tls)
          try {
            // fence FIRST, read the cursor second (KafkaEosIngest's law)
            val producer = new KafkaTxnProducer(kc,
              s"$txnIdPrefix-$key").initTransactions()
            kc.findCoordinator(group)
            val committed = kc.fetchOffsets(group, Map(key -> Seq(0)))
              .getOrElse((key, 0), 0L)
            if (committed >= until) 0L // range already landed
            else {
              val known = scala.collection.mutable.Set.empty[String]
              var n = 0L
              producer.begin()
              eachFrames(path, committed, until, onlyStreams)(_
                .grouped(page).foreach { chunk =>
                  chunk.groupBy(r => (topicOf(r.message.stream_key),
                    math.floorMod(r.message.shard_id,
                      partitions.toLong).toInt))
                    .foreach { case ((topic, part), rs) =>
                      if (known.add(topic)) {
                        val parts = kc.metadata(Seq(topic))
                          .getOrElse(topic, Seq.empty)
                        require(parts.size >= partitions,
                          s"topic $topic has ${parts.size} partitions, " +
                            s"need $partitions")
                      }
                      producer.send(topic, part, rs.map(r =>
                        (r.message.timestamp.getTime, null: Array[Byte],
                          r.message.payload)))
                      n += rs.length
                    }
                })
              if (n == 0L) {
                // every frame in range was filtered out: advance the
                // cursor plainly (no data to make transactional)
                producer.abort()
                kc.commitOffsets(group, Map((key, 0) -> until))
                0L
              } else {
                producer.sendOffsetsToTransaction(group,
                  Map((key, 0) -> until))
                if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
                  throw new IllegalStateException(
                    s"injected crash: ship $key produced + staged, " +
                      "not committed")
                producer.commit()
                n
              }
            }
          } finally kc.close()
        }
        KafkaEosIngest.retryFenced(s"ship $key")(attempt())
      }.sum().toLong
  }

  /** One bounded exactly-once ship epoch into REDIS; same contract with
    * the WATCH-fenced `ledgerPrefix:{file}` cursor.
    */
  def shipRedisOnce(spark: SparkSession, paths: Seq[String],
      streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      capBytes: Long = 64L << 20,
      onlyStreams: Option[Set[String]] = None,
      tls: Option[RedisClient.Tls] = None,
      auth: Option[RedisClient.Auth] = None,
      crashBeforeCommit: Option[String] = None): Long = {
    require(capBytes > 0, "capBytes must be positive")
    val ledgers = new RedisClient(redisHost, redisPort, tls = tls, auth = auth)
    val ranges = try {
      paths.flatMap { p =>
        val from = ledgers.command(
          RedisStreams.get(s"$ledgerPrefix:{${fileKey(p)}}"): _*) match {
          case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
          case _ => 0L
        }
        val until = SsOffsetWalk.safeEnd(p, from, capBytes).offset
        if (until > from) Some((p, until)) else None
      }
    } finally ledgers.close()
    if (ranges.isEmpty) 0L
    else spark.sparkContext.parallelize(ranges, ranges.size)
      .map { case (path, until) =>
        val ledger = s"$ledgerPrefix:{${fileKey(path)}}"
        val rc = new RedisClient(redisHost, redisPort, tls = tls, auth = auth)
        def attempt(): Long = {
          rc.command(RedisStreams.watch(ledger): _*)
          val committed = rc.command(RedisStreams.get(ledger): _*) match {
            case Resp.Bulk(bs) => new String(bs, "UTF-8").toLong
            case _ => 0L
          }
          if (committed >= until) {
            rc.command(RedisStreams.unwatch: _*)
            0L
          } else {
            rc.command(RedisStreams.multi: _*)
            // per-key ms clamp: frame order is the contract; real redis
            // refuses a non-monotonic explicit id
            val lastMs = scala.collection.mutable.Map.empty[String, Long]
            var n = 0L
            eachFrames(path, committed, until, onlyStreams)(_
              .grouped(500).foreach { chunk =>
                rc.pipeline(chunk.map { r =>
                  val k = RedisStreams.shardedKey(
                    streamOf(r.message.stream_key), r.message.shard_id,
                    sharded = true)
                  val ms = math.max(r.message.timestamp.getTime,
                    lastMs.getOrElse(k, 0L))
                  lastMs(k) = ms
                  n += 1
                  RedisStreams.xadd(k, ms, r.message.payload)
                }).collectFirst { case Resp.Err(m) =>
                  throw new IllegalStateException(s"MULTI queue refused: $m")
                }
              })
            rc.command(RedisStreams.set(ledger, until.toString): _*)
            if (crashBeforeCommit.exists(graft.ops.Failpoints.fire))
              throw new IllegalStateException(
                s"injected crash: ship ${fileKey(path)} queued, not EXECed")
            rc.command(RedisStreams.exec: _*) match {
              case Resp.Err(m) =>
                throw new IllegalStateException(s"EXEC failed: $m")
              case Resp.NullArr => -1L // a rival won the watched ledger
              case _ => n
            }
          }
        }
        try {
          var shipped = -1L
          var attempts = 0
          while (shipped < 0L) {
            shipped = attempt()
            if (shipped < 0L) {
              attempts += 1
              require(attempts <= 5,
                s"ship ${fileKey(path)}: EXEC nil'd $attempts times — a " +
                  "live rival keeps moving the ledger")
            }
          }
          shipped
        } finally rc.close()
      }.sum().toLong
  }

  /** Drain to the files' current safe ends: epochs until one moves no
    * bytes. (Frame counts can read 0 on a fully-filtered epoch while the
    * cursor still advances, so the loop keys on planned ranges instead.)
    */
  def shipKafkaAll(spark: SparkSession, paths: Seq[String],
      topicOf: String => String,
      kafkaHost: String, kafkaPort: Int, group: String, txnIdPrefix: String,
      capBytes: Long = 64L << 20, page: Int = 1000, partitions: Int = 4,
      onlyStreams: Option[Set[String]] = None,
      sasl: Option[(String, String)] = None,
      saslMechanism: String = "PLAIN",
      tls: Option[KafkaTls.Client] = None): Long = {
    var total = 0L
    var progressed = true
    while (progressed) {
      val before = kafkaCursors(paths, kafkaHost, kafkaPort, group,
        sasl, saslMechanism, tls)
      total += shipKafkaOnce(spark, paths, topicOf, kafkaHost, kafkaPort,
        group, txnIdPrefix, capBytes, page, partitions, onlyStreams,
        sasl, saslMechanism, tls)
      progressed = kafkaCursors(paths, kafkaHost, kafkaPort, group,
        sasl, saslMechanism, tls) != before
    }
    total
  }

  /** Same drain for the redis destination. */
  def shipRedisAll(spark: SparkSession, paths: Seq[String],
      streamOf: String => String,
      redisHost: String, redisPort: Int, ledgerPrefix: String,
      capBytes: Long = 64L << 20,
      onlyStreams: Option[Set[String]] = None,
      tls: Option[RedisClient.Tls] = None,
      auth: Option[RedisClient.Auth] = None): Long = {
    var total = 0L
    var progressed = true
    while (progressed) {
      val before = redisCursors(paths, redisHost, redisPort, ledgerPrefix,
        tls, auth)
      total += shipRedisOnce(spark, paths, streamOf, redisHost, redisPort,
        ledgerPrefix, capBytes, onlyStreams, tls, auth)
      progressed = redisCursors(paths, redisHost, redisPort, ledgerPrefix,
        tls, auth) != before
    }
    total
  }

  private def kafkaCursors(paths: Seq[String], host: String, port: Int,
      group: String, sasl: Option[(String, String)], mech: String,
      tls: Option[KafkaTls.Client]): Map[(String, Int), Long] = {
    val c = new KafkaClient(host, port, sasl = sasl, saslMechanism = mech,
      tls = tls)
    try {
      c.findCoordinator(group)
      c.fetchOffsets(group, paths.map(p => fileKey(p) -> Seq(0)).toMap)
    } finally c.close()
  }

  private def redisCursors(paths: Seq[String], host: String, port: Int,
      prefix: String, tls: Option[RedisClient.Tls],
      auth: Option[RedisClient.Auth]): Map[String, Long] = {
    val c = new RedisClient(host, port, tls = tls, auth = auth)
    try paths.flatMap { p =>
      c.command(RedisStreams.get(s"$prefix:{${fileKey(p)}}"): _*) match {
        case Resp.Bulk(bs) =>
          Some(fileKey(p) -> new String(bs, "UTF-8").toLong)
        case _ => None
      }
    }.toMap finally c.close()
  }
}
