package graft.redis

import scala.collection.mutable

/** Redis Cluster key→slot mapping (public cluster spec): slot =
  * CRC16-XModem(hash-tag(key)) mod 16384, where the hash-tag rule keys the
  * hash off `{...}` when a non-empty braced section exists — what lets
  * `stream:{k}:0` / `stream:{k}:1` co-locate. The reference builds the same
  * shard→node map (sea-streamer-redis/src/cluster.rs:1-135).
  */
object RedisCluster {
  val HashSlots = 16384

  /** CRC16/XMODEM (poly 0x1021, init 0): the variant the cluster spec
    * mandates — distinct from the `.ss` format's CRC16/CDMA2000.
    */
  def crc16XModem(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc ^= (bytes(i) & 0xFF) << 8
      var bit = 0
      while (bit < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xFFFF
              else (crc << 1) & 0xFFFF
        bit += 1
      }
      i += 1
    }
    crc
  }

  /** The braced section a cluster hashes instead of the whole key, when
    * present and non-empty (first `{`, first `}` after it).
    */
  def hashTag(key: String): String = {
    val open = key.indexOf('{')
    if (open < 0) key
    else {
      val close = key.indexOf('}', open + 1)
      if (close < 0 || close == open + 1) key
      else key.substring(open + 1, close)
    }
  }

  def hashSlot(key: String): Int =
    crc16XModem(hashTag(key).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % HashSlots
}

/** Immutable slot→node ownership map from one `CLUSTER SLOTS` reply. */
final class RedisSlotMap(ranges: Seq[(Int, Int, String, Int)]) {
  private val sorted = ranges.sortBy(_._1).toIndexedSeq

  def ownerOfSlot(slot: Int): Option[(String, Int)] = {
    // ranges are few (one per master); linear scan is fine and allocation-free
    var i = 0
    while (i < sorted.length) {
      val (lo, hi, h, p) = sorted(i)
      if (slot >= lo && slot <= hi) return Some((h, p))
      i += 1
    }
    None
  }

  def owner(key: String): Option[(String, Int)] =
    ownerOfSlot(RedisCluster.hashSlot(key))

  def nodes: Seq[(String, Int)] = sorted.map(r => (r._3, r._4)).distinct
  def isEmpty: Boolean = sorted.isEmpty
}

/** Cluster-aware command routing: bootstrap the full slot→node map with
  * `CLUSTER SLOTS` ([[bootstrapSlots]]), route keys to their owners, and
  * still follow `MOVED`/`ASK` redirects for the rebalancing window when the
  * map is stale (sea-streamer-redis/src/cluster.rs:1-135 keeps the same
  * map + MOVED-refresh loop).
  *
  * Redis Streams pin one stream key to one slot, so stream traffic is
  * naturally node-sticky: after bootstrap (or the first MOVED) the cached
  * owner serves every later command for that key without extra hops.
  */
final class RedisClusterClient(seeds: Seq[(String, Int)],
    tls: Option[RedisClient.Tls] = None,
    auth: Option[RedisClient.Auth] = None)
    extends AutoCloseable {
  require(seeds.nonEmpty, "at least one cluster seed node required")

  private val clients = mutable.Map.empty[(String, Int), RedisClient]
  private val owner = mutable.Map.empty[String, (String, Int)]
  private var slotMap: Option[RedisSlotMap] = None
  private val MaxRedirects = 5

  private def clientFor(node: (String, Int)): RedisClient =
    clients.getOrElseUpdate(node,
      new RedisClient(node._1, node._2, tls = tls, auth = auth))

  /** Fetch the full topology from the first reachable seed. An empty reply
    * (standalone node) leaves lazy MOVED learning in place.
    */
  def bootstrapSlots(): RedisSlotMap = {
    var lastErr: Throwable = null
    var result: Option[RedisSlotMap] = None
    val it = seeds.iterator
    while (result.isEmpty && it.hasNext) {
      val seed = it.next()
      try {
        val ranges = clientFor(seed).commandS("CLUSTER", "SLOTS") match {
          case Resp.Arr(items) => items.collect {
            case Resp.Arr(Resp.Num(lo) +: Resp.Num(hi) +:
                Resp.Arr(Seq(host: Resp.Bulk, Resp.Num(port), _*)) +: _) =>
              (lo.toInt, hi.toInt, host.utf8, port.toInt)
          }
          case _ => Seq.empty
        }
        val map = new RedisSlotMap(ranges)
        if (!map.isEmpty) slotMap = Some(map)
        result = Some(map)
      } catch { case scala.util.control.NonFatal(e) => lastErr = e }
    }
    result.getOrElse(throw new IllegalStateException(
      "no cluster seed reachable for CLUSTER SLOTS", lastErr))
  }

  /** The node currently believed to own a key: explicit MOVED knowledge
    * first (freshest), then the bootstrapped slot map, then the first seed.
    */
  def routeFor(key: String): (String, Int) =
    owner.getOrElse(key,
      slotMap.flatMap(_.owner(key)).getOrElse(seeds.head))

  /** Run a command routed by its stream key (single-command form of
    * [[pipelineFor]]: MOVED re-routes + caches, ASK one-shots with
    * ASKING).
    */
  def command(key: String, args: Array[Byte]*): Resp.Value =
    pipelineFor(key, Seq(args)).head

  private val AskingCmd: Seq[Array[Byte]] =
    Seq("ASKING".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Route a whole pipelined batch for ONE key to its owner node. On a
    * redirect, ONLY the suffix from the first bounced command replays —
    * commands before the bounce already applied on the old owner, and
    * replaying them would duplicate stream entries when a slot migrates
    * mid-pipeline. `ASK` (migration in flight) re-sends the suffix to the
    * named node with the required per-command ASKING handshake and does
    * not poison the owner cache; `MOVED` (migration settled) updates it.
    * (The reference producer's redirect-and-retry loop,
    * sea-streamer-redis/src/producer.rs:428-507.)
    */
  def pipelineFor(key: String,
      commands: Seq[Seq[Array[Byte]]]): Seq[Resp.Value] = {
    var node = routeFor(key)
    var redirects = 0
    var asking = false
    var pending = commands
    val acc = Seq.newBuilder[Resp.Value]
    def settle(v: Resp.Value): Resp.Value = v match {
      case Resp.Err(m) => throw RedisClient.RedisError(m)
      case ok => ok
    }
    while (pending.nonEmpty) {
      val wire = if (asking) pending.flatMap(c => Seq(AskingCmd, c)) else pending
      val raw = clientFor(node).pipelineRaw(wire)
      val replies =
        if (asking) raw.grouped(2).map(_.last).toSeq else raw
      val bounce = replies.indexWhere {
        case Resp.Err(m) => movedTarget(m).isDefined
        case _ => false
      }
      if (bounce < 0) {
        acc ++= replies.map(settle)
        if (!asking) owner(key) = node
        pending = Seq.empty
      } else {
        acc ++= replies.take(bounce).map(settle)
        val msg = replies(bounce) match { case Resp.Err(m) => m; case _ => "" }
        val target = movedTarget(msg).get
        // loop bound exhausted: surface the server's own MOVED/ASK error
        if (redirects >= MaxRedirects) throw RedisClient.RedisError(msg)
        asking = msg.startsWith("ASK")
        if (!asking) owner(key) = target
        node = target
        redirects += 1
        pending = pending.drop(bounce)
      }
    }
    acc.result()
  }

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

  /** The node currently believed to own a key (None until routed/bootstrapped). */
  def ownerOf(key: String): Option[(String, Int)] =
    owner.get(key).orElse(slotMap.flatMap(_.owner(key)))

  /** A connection PINNED to a key's believed owner — for WATCH/MULTI
    * sequences, which must stay on ONE socket for their whole lifetime
    * (cluster transactions are single-slot AND single-connection; routing
    * mid-transaction would strand the queue). The caller owns redirect
    * handling: on a MOVED, [[noteMoved]] + retry the WHOLE transaction on
    * a fresh [[connectionFor]] — nothing applied, EXEC never ran.
    */
  def connectionFor(key: String): RedisClient = clientFor(routeFor(key))

  /** Drop (and close) the cached connection to a key's believed owner —
    * used when a transaction aborted mid-protocol and the socket may hold
    * an open MULTI queue that would swallow the next caller's commands.
    */
  def quarantineConnectionOf(key: String): Unit = {
    val node = routeFor(key)
    clients.remove(node).foreach { c =>
      try c.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Learn a key's new owner from a server MOVED/ASK error message;
    * returns true when the message carried a target.
    */
  def noteMoved(key: String, errMsg: String): Boolean =
    movedTarget(errMsg) match {
      case Some(target) => owner(key) = target; true
      case None => false
    }

  override def close(): Unit = clients.values.foreach(_.close())
}
