package graft.redis

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SeaMessage

/** Spark ↔ Redis Streams integration. Scale shape: one Spark partition per
  * (stream, shard) redis key, each task holding its own connection — reads
  * are `XRANGE` sweeps per shard (the reference manager's range-read path),
  * writes are pipelined `XADD` batches (producer.rs:285-518). Nothing
  * funnels through the driver; 32k shards = 32k parallel tasks.
  */
object RedisSource {

  /** Lazy paged XRANGE over one key: cursors restart exclusive-after the
    * last RAW entry id (never a packed-seq reconstruction, which is lossy
    * past 16 bits of sub-sequence), and only one page is held in memory.
    */
  private[redis] def pagedScan(client: RedisClient, key: String,
      stream: String, shard: Long, batch: Int,
      untilId: String = "+", afterId: String = "0-0"): Iterator[SeaMessage] =
    new Iterator[SeaMessage] {
      private var page: Iterator[(String, SeaMessage)] = Iterator.empty
      private var cursor = if (afterId == "0-0") "-" else s"($afterId"
      private var exhausted = false
      private def fetch(): Unit = {
        val entries = RedisStreams.decodeEntriesWithIds(
          client.command(RedisStreams.xrange(key, cursor, untilId,
            Some(batch)): _*),
          stream, shard)
        if (entries.isEmpty) exhausted = true
        else {
          cursor = s"(${entries.last._1}"
          if (entries.size < batch) exhausted = true
          page = entries.iterator
        }
      }
      def hasNext: Boolean = {
        if (!page.hasNext && !exhausted) fetch()
        page.hasNext
      }
      def next(): SeaMessage = {
        if (!hasNext) throw new NoSuchElementException
        page.next()._2
      }
    }

  /** Bounded read of whole streams: one task per (stream, shard).
    * `afterMs` pushes the seek law `timestamp > T` into each key's XRANGE
    * start id (ids are `<ms>-<seq>`) — no post-filter, no scan of the
    * pre-seek prefix.
    */
  def boundedRead(spark: SparkSession, host: String, port: Int,
      shards: Seq[(String, Long)], sharded: Boolean = true,
      batch: Int = 1000, afterMs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val afterId = afterMs.map(RedisStreams.seekAfterId).getOrElse("0-0")
    sc.parallelize(shards, math.max(1, shards.size)).mapPartitions { it =>
      it.flatMap { case (stream, shard) =>
        val key = RedisStreams.shardedKey(stream, shard, sharded)
        val client = new RedisClient(host, port)
        val scan = pagedScan(client, key, stream, shard, batch,
          afterId = afterId)
        new Iterator[SeaMessage] {
          def hasNext: Boolean = {
            val h = scan.hasNext
            if (!h) client.close()
            h
          }
          def next(): SeaMessage = scan.next()
        }
      }
    }.toDF()
  }

  /** Pipelined XADD write: each partition opens one connection and flushes
    * command batches of `pipelineSize`. The frame is hash-partitioned on
    * the REDIS KEY — (stream, shard) when sharded, stream alone when not
    * (unsharded rows share the bare key regardless of shard_id) — and
    * time-sorted within partitions first, so every redis key has exactly
    * ONE writer appending in timestamp order: redis rejects non-monotonic
    * explicit `<ms>-*` ids, and the reference keeps the same
    * single-producer-per-key model (one producer actor per connection).
    */
  def write(df: DataFrame, host: String, port: Int,
      sharded: Boolean = true, pipelineSize: Int = 100): Unit = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    val keyCols =
      if (sharded) Seq(col("stream_key"), col("shard_id"))
      else Seq(col("stream_key"))
    df.select("stream_key", "shard_id", "timestamp", "payload")
      .repartition(keyCols: _*)
      .sortWithinPartitions(col("timestamp"))
      .as[(String, Long, java.sql.Timestamp, Array[Byte])]
      .foreachPartition { (rows: Iterator[(String, Long, java.sql.Timestamp, Array[Byte])]) =>
        if (rows.nonEmpty) {
          val client = new RedisClient(host, port)
          try rows.grouped(pipelineSize).foreach { chunk =>
            client.pipeline(chunk.map { case (stream, shard, ts, payload) =>
              RedisStreams.xadd(
                RedisStreams.shardedKey(stream, shard, sharded),
                ts.getTime, payload)
            })
          } finally client.close()
        }
      }
  }
}
