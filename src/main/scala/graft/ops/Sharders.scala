package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Producer-side sharders (sea-streamer-redis/src/producer.rs:60-90) as
  * column expressions — pure, codegen'd, lock-free by construction.
  *
  * The reference contract: `shard(stream_key, bytes) -> u64`, message lands
  * on sub-stream `stream:N`. In Spark the shard column doubles as the
  * partitioning key: `repartitionByShard` co-locates a shard per task, which
  * is what makes the write path scale (each task pipelines to its own
  * shard/partition, no cross-task coordination).
  */
object Sharders {

  /** Round-robin: `seq % n` — reproduces the reference test law
    * (sharding.rs: receipt shard = i % 3).
    */
  def roundRobin(numShards: Int): Column =
    pmod(col("sequence"), lit(numShards.toLong))

  /** Pseudo-random but deterministic per message identity (the reference
    * uses `rand() % n`, which is not replayable; hashing the identity is —
    * same distribution, idempotent retries).
    */
  def pseudoRandom(numShards: Int): Column =
    pmod(xxhash64(col("stream_key"), col("sequence")), lit(numShards.toLong))

  /** Hash of the payload/key expression (consistent routing by content). */
  def byExpr(e: Column, numShards: Int): Column =
    pmod(xxhash64(e), lit(numShards.toLong))

  /** Stamp the shard column. */
  def applyShard(df: DataFrame, sharder: Column): DataFrame =
    df.withColumn("shard_id", sharder.cast("long"))

  /** Co-locate rows of a shard in one partition (write-path parallel unit). */
  def repartitionByShard(df: DataFrame, numShards: Int): DataFrame =
    df.repartition(numShards, col("shard_id"))
}
