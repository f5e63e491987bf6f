package graft.redis

import scala.collection.mutable

/** Cluster-aware command routing: follow `MOVED` redirects and cache key
  * ownership (sea-streamer-redis/src/cluster.rs:1-135 — the reference keeps
  * the same lazily-learned key→node map and retries on MOVED).
  *
  * Redis Streams pin one stream key to one slot, so stream traffic is
  * naturally node-sticky: after the first MOVED the cached owner serves
  * every later command for that key without extra hops.
  */
final class RedisClusterClient(seeds: Seq[(String, Int)])
    extends AutoCloseable {
  require(seeds.nonEmpty, "at least one cluster seed node required")

  private val clients = mutable.Map.empty[(String, Int), RedisClient]
  private val owner = mutable.Map.empty[String, (String, Int)]
  private val MaxRedirects = 5

  private def clientFor(node: (String, Int)): RedisClient =
    clients.getOrElseUpdate(node, new RedisClient(node._1, node._2))

  /** MOVED reply: `MOVED <slot> <host>:<port>`. */
  private def movedTarget(msg: String): Option[(String, Int)] = {
    val parts = msg.split(' ')
    if (parts.length == 3 && (parts(0) == "MOVED" || parts(0) == "ASK")) {
      val i = parts(2).lastIndexOf(':')
      if (i > 0) Some((parts(2).substring(0, i),
        parts(2).substring(i + 1).toInt))
      else None
    } else None
  }

  /** Run a command routed by its stream key. */
  def command(key: String, args: Array[Byte]*): Resp.Value = {
    var node = owner.getOrElse(key, seeds.head)
    var redirects = 0
    while (true) {
      try {
        val v = clientFor(node).command(args: _*)
        owner(key) = node
        return v
      } catch {
        case RedisClient.RedisError(msg) =>
          movedTarget(msg) match {
            case Some(target) if redirects < MaxRedirects =>
              owner(key) = target
              node = target
              redirects += 1
            case _ => throw RedisClient.RedisError(msg)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The node currently believed to own a key (None until first routed). */
  def ownerOf(key: String): Option[(String, Int)] = owner.get(key)

  override def close(): Unit = clients.values.foreach(_.close())
}
