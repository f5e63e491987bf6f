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
  * Deliveries carry their RAW entry id — the packed SeqNo drops
  * sub-sequence bits past 64k entries/ms, so acks always go back with the
  * id redis itself assigned.
  *
  * One instance per (key, consumer) with its own connection — on Spark this
  * lives inside a task (e.g. foreachPartition), one consumer per shard key,
  * exactly the reference's shared-shard balancing unit.
  */
final class RedisGroupConsumer(
    host: String, port: Int,
    stream: String, shard: Long, sharded: Boolean,
    group: String, consumer: String,
    tls: Option[RedisClient.Tls] = None,
    auth: Option[RedisClient.Auth] = None) extends AutoCloseable {
  import RedisGroupConsumer.Delivered

  private val key = RedisStreams.shardedKey(stream, shard, sharded)
  private val client = new RedisClient(host, port, tls = tls, auth = auth)

  /** Idempotent group creation from the earliest entry (MKSTREAM). */
  def create(): Unit =
    try client.command(RedisStreams.xgroupCreate(key, group): _*)
    catch {
      case RedisClient.RedisError(msg) if msg.contains("BUSYGROUP") => ()
    }

  /** Undelivered entries → this consumer's PEL (`XREADGROUP ... >`). */
  def fetch(count: Int = 100): Seq[Delivered] =
    decode(client.command(
      RedisStreams.xreadGroup(group, consumer, Seq(key -> ">"),
        Some(count)): _*))

  /** Re-read THIS consumer's pending (delivered, unacked) entries. */
  def pending(count: Int = 100): Seq[Delivered] =
    decode(client.command(
      RedisStreams.xreadGroup(group, consumer, Seq(key -> "0-0"),
        Some(count)): _*))

  /** Settle delivery — the at-least-once commit (`XACK`, raw ids). */
  def ack(messages: Seq[Delivered]): Long = {
    if (messages.isEmpty) return 0L
    client.command(RedisStreams.xack(key, group,
      messages.map(_.id)): _*) match {
      case Resp.Num(n) => n
      case other => throw new IllegalArgumentException(s"bad XACK reply: $other")
    }
  }

  /** Steal entries pending on dead siblings (`XAUTOCLAIM`): failover.
    * Follows the reply's next-cursor until the scan completes, so a single
    * call claims the WHOLE backlog, not just the first server-side page.
    */
  def claimStale(minIdleMs: Long): Seq[Delivered] = {
    val out = Seq.newBuilder[Delivered]
    var cursor = "0-0"
    var done = false
    while (!done) {
      client.command(RedisStreams.xautoclaim(key, group, consumer,
        minIdleMs, cursor): _*) match {
        case Resp.Arr(Seq(next: Resp.Bulk, entries, _*)) =>
          out ++= RedisStreams.decodeEntriesWithIds(entries, stream, shard)
            .map((Delivered.apply _).tupled)
          val n = next.utf8
          if (n == "0-0" || n == cursor) done = true else cursor = n
        case other =>
          throw new IllegalArgumentException(s"bad XAUTOCLAIM reply: $other")
      }
    }
    out.result()
  }

  private def decode(v: Resp.Value): Seq[Delivered] =
    RedisStreams.decodeReadReplyWithIds(v).flatMap(_._2)
      .map((Delivered.apply _).tupled)

  override def close(): Unit = client.close()
}

object RedisGroupConsumer {
  /** One delivered entry: the redis-assigned id plus the envelope row. */
  final case class Delivered(id: String, message: SeaMessage)
}
