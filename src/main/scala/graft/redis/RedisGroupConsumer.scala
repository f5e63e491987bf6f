package graft.redis

import graft.core.SeaMessage

/** Load-balanced group consumption over one `stream:shard` key — the
  * reference's Resumable/LoadBalanced consumer loop
  * (sea-streamer-redis/src/consumer/node.rs:348-430 ack flow, 647-744
  * auto-claim): `XREADGROUP >` delivers undelivered entries and records
  * them in the group's PEL under this consumer; [[ack]] (`XACK`) settles
  * them — at-least-once until acked; [[claimStale]] (`XAUTOCLAIM`) steals a
  * dead sibling's pending entries, the failover law.
  *
  * One instance per (key, consumer) with its own connection — on Spark this
  * lives inside a task (e.g. foreachPartition), one consumer per shard key,
  * exactly the reference's shared-shard balancing unit.
  */
final class RedisGroupConsumer(
    host: String, port: Int,
    stream: String, shard: Long, sharded: Boolean,
    group: String, consumer: String) extends AutoCloseable {

  private val key = RedisStreams.shardedKey(stream, shard, sharded)
  private val client = new RedisClient(host, port)

  /** Idempotent group creation from the earliest entry (MKSTREAM). */
  def create(): Unit =
    try client.command(RedisStreams.xgroupCreate(key, group): _*)
    catch {
      case RedisClient.RedisError(msg) if msg.contains("BUSYGROUP") => ()
    }

  /** Undelivered entries → this consumer's PEL (`XREADGROUP ... >`). */
  def fetch(count: Int = 100): Seq[SeaMessage] =
    decode(client.command(
      RedisStreams.xreadGroup(group, consumer, Seq(key -> ">"),
        Some(count)): _*))

  /** Re-read THIS consumer's pending (delivered, unacked) entries. */
  def pending(count: Int = 100): Seq[SeaMessage] =
    decode(client.command(
      RedisStreams.xreadGroup(group, consumer, Seq(key -> "0-0"),
        Some(count)): _*))

  /** Settle delivery — the at-least-once commit (`XACK`). */
  def ack(messages: Seq[SeaMessage]): Long = {
    if (messages.isEmpty) return 0L
    client.command(RedisStreams.xack(key, group,
      messages.map(m => RedisStreams.entryId(m.sequence >> 16,
        m.sequence & 0xFFFFL))): _*) match {
      case Resp.Num(n) => n
      case other => throw new IllegalArgumentException(s"bad XACK reply: $other")
    }
  }

  /** Steal entries pending on dead siblings (`XAUTOCLAIM`): failover. */
  def claimStale(minIdleMs: Long): Seq[SeaMessage] =
    client.command(RedisStreams.xautoclaim(key, group, consumer,
      minIdleMs): _*) match {
      case Resp.Arr(Seq(_, entries, _*)) =>
        RedisStreams.decodeEntries(entries, stream, shard)
      case other =>
        throw new IllegalArgumentException(s"bad XAUTOCLAIM reply: $other")
    }

  private def decode(v: Resp.Value): Seq[SeaMessage] =
    RedisStreams.decodeReadReply(v).flatMap(_._2)

  override def close(): Unit = client.close()
}
