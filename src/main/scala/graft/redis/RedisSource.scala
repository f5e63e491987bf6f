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

  /** Bounded read of whole streams: one task per (stream, shard). */
  def boundedRead(spark: SparkSession, host: String, port: Int,
      shards: Seq[(String, Long)], sharded: Boolean = true,
      batch: Int = 1000): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    sc.parallelize(shards, math.max(1, shards.size)).mapPartitions { it =>
      it.flatMap { case (stream, shard) =>
        val key = RedisStreams.shardedKey(stream, shard, sharded)
        val client = new RedisClient(host, port)
        try {
          // paged XRANGE: after a page, restart exclusive-after the last id
          val out = Seq.newBuilder[SeaMessage]
          var start = "-"
          var done = false
          while (!done) {
            val msgs = RedisStreams.decodeEntries(
              client.command(RedisStreams.xrange(key, start, "+",
                Some(batch)): _*),
              stream, shard)
            out ++= msgs
            if (msgs.size < batch) done = true
            else {
              val (ms, sub) = (msgs.last.sequence >> 16,
                msgs.last.sequence & 0xFFFFL)
              start = s"(${RedisStreams.entryId(ms, sub)}"
            }
          }
          out.result()
        } finally client.close()
      }
    }.toDF()
  }

  /** Pipelined XADD write: each partition opens one connection and flushes
    * command batches of `pipelineSize`. The frame is hash-partitioned on
    * (stream, shard) and time-sorted within partitions first, so every redis
    * key has exactly ONE writer appending in timestamp order — redis rejects
    * non-monotonic explicit `<ms>-*` ids, and the reference keeps the same
    * single-producer-per-key model (one producer actor per connection).
    */
  def write(df: DataFrame, host: String, port: Int,
      sharded: Boolean = true, pipelineSize: Int = 100): Unit = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    df.select("stream_key", "shard_id", "timestamp", "payload")
      .repartition(col("stream_key"), col("shard_id"))
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
