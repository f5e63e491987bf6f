package graft.redis

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal blocking Redis connection over a plain socket. One connection per
  * executor task — the scale unit the Spark integration uses; no pooling
  * machinery because a task's lifetime IS the pool.
  */
final class RedisClient(host: String, port: Int,
    connectTimeoutMs: Int = 5000, soTimeoutMs: Int = 30000,
    tls: Option[RedisClient.Tls] = None,
    auth: Option[RedisClient.Auth] = None)
    extends AutoCloseable {

  // `rediss://` support (sea-streamer-redis/src/connection.rs:131-136):
  // TLS wraps the socket, RESP runs inside the channel unchanged.
  // `verifyHostname=false` is the reference's
  // disable_hostname_verification knob — the chain is still verified
  // against the truststore, only the name check is waived.
  private val socket: Socket = tls match {
    case Some(t) => graft.core.TlsChannel.clientSocket(t.conf, host, port,
      verifyHostname = t.verifyHostname, connectTimeoutMs = connectTimeoutMs)
    case None =>
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      s.setTcpNoDelay(true)
      s
  }
  socket.setSoTimeout(soTimeoutMs)

  /** Negotiated TLS protocol (e.g. "TLSv1.3"), None on plaintext. */
  def tlsProtocol: Option[String] = socket match {
    case s: javax.net.ssl.SSLSocket => Some(s.getSession.getProtocol)
    case _ => None
  }
  private val in = Resp.buffered(socket.getInputStream)
  private val out = Resp.buffered(socket.getOutputStream)

  // AUTH runs eagerly in the constructor (the reference sets
  // username/password on the connection info so every connection
  // authenticates before its first command —
  // sea-streamer-redis/src/connection.rs:141-146). Legacy 2-arg AUTH when
  // no username (the `default` ACL user); 3-arg otherwise. A WRONGPASS /
  // ERR reply surfaces typed here — no half-authenticated client escapes.
  auth.foreach { a =>
    a.username match {
      case Some(u) => commandS("AUTH", u, a.password)
      case None => commandS("AUTH", a.password)
    }
  }

  /** One command, one reply. */
  def command(args: Array[Byte]*): Resp.Value = {
    out.write(Resp.encodeCommand(args))
    out.flush()
    reply(Resp.parse(in))
  }

  def commandS(args: String*): Resp.Value =
    command(args.map(_.getBytes(UTF_8)): _*)

  /** Pipelined batch: write every command, then drain exactly as many
    * replies — the reference producer's batched XADD shape
    * (sea-streamer-redis/src/producer.rs:285-518).
    */
  def pipeline(commands: Seq[Seq[Array[Byte]]]): Seq[Resp.Value] = {
    commands.foreach(c => out.write(Resp.encodeCommand(c)))
    out.flush()
    commands.map(_ => reply(Resp.parse(in)))
  }

  /** Pipeline that returns error replies as values instead of throwing —
    * required when SOME commands are expected to fail (XGROUP CREATE's
    * BUSYGROUP) and the rest of the batch must still drain cleanly.
    */
  def pipelineRaw(commands: Seq[Seq[Array[Byte]]]): Seq[Resp.Value] = {
    commands.foreach(c => out.write(Resp.encodeCommand(c)))
    out.flush()
    commands.map(_ => Resp.parse(in))
  }

  /** Split pipeline primitives for resumable writers: write a batch, then
    * drain replies ONE at a time ([[RedisClient.Session.pipelineAcked]]
    * keeps the ack high-water mark between the two).
    */
  private[redis] def writeCommands(cmds: Seq[Seq[Array[Byte]]]): Unit = {
    cmds.foreach(c => out.write(Resp.encodeCommand(c)))
    out.flush()
  }
  private[redis] def readReplyRaw(): Resp.Value = Resp.parse(in)

  private def reply(v: Resp.Value): Resp.Value = v match {
    case Resp.Err(m) => throw RedisClient.RedisError(m)
    case other => other
  }

  override def close(): Unit = socket.close()
}

object RedisClient {
  final case class RedisError(msg: String) extends RuntimeException(msg)

  /** `rediss://` client config — truststore + the reference's ONE tls
    * knob, `disable_hostname_verification`
    * (sea-streamer-redis/src/connection.rs:131-136), spelled positively.
    * Plain strings + a Boolean so it rides `InputPartition` / closure
    * serialization to executors.
    */
  final case class Tls(conf: graft.core.TlsChannel.Client,
      verifyHostname: Boolean = true)

  /** Connect-time credentials — the reference's username/password connect
    * options (sea-streamer-redis/src/streamer.rs:23-24,140-152). `None`
    * username = the legacy 2-arg `AUTH password` against the `default`
    * ACL user. Plain strings so it rides partition/closure serialization
    * to executors like [[Tls]].
    */
  final case class Auth(username: Option[String], password: String)

  /** Error-reply prefixes that mean "the server refused but nothing was
    * written — try again": redis's transient states (replica still LOADING,
    * scripting BUSY, cluster TRYAGAIN/CLUSTERDOWN/MASTERDOWN during
    * failover). MOVED/ASK are NOT here — they carry routing information and
    * belong to [[RedisClusterClient]]'s redirect loop, not blind retry.
    */
  private val RetriablePrefixes =
    Seq("TRYAGAIN", "LOADING", "BUSY ", "CLUSTERDOWN", "MASTERDOWN")
  def retriableErr(msg: String): Boolean =
    RetriablePrefixes.exists(msg.startsWith)

  /** Self-healing connection for long scans and writes — the reference
    * consumer's reconnect loop (`sea-streamer-redis/src/consumer/node.rs:299-310`)
    * and the producer's requeue-on-failure machinery
    * (`sea-streamer-redis/src/producer.rs:464-507`) as one bounded-retry
    * session. IOExceptions reconnect; transient error replies back off and
    * retry; both surface [[graft.core.SeaStreamErr.Backend]] once the
    * budget is spent, so a dead server fails fast instead of hanging.
    */
  final class Session(mkClient: () => RedisClient, maxRetries: Int = 5,
      backoffMs: Long = 20L) extends AutoCloseable {
    private var client: RedisClient = null

    private def connected(): RedisClient = {
      if (client == null) client = mkClient()
      client
    }
    private def dropClient(): Unit = {
      if (client != null) {
        try client.close() catch { case _: Throwable => () }
        client = null
      }
    }
    /** Shared budget bookkeeping: sleep, or surface the typed error once
      * the budget is spent. `attempt` is the caller's counter AFTER
      * incrementing.
      */
    private def backoff(what: String, attempt: Int, cause: Throwable): Unit = {
      if (attempt > maxRetries)
        throw graft.core.SeaStreamErr.Backend(cause match {
          case _: java.io.IOException =>
            s"redis $what: retries exhausted after $maxRetries reconnects"
          case e => s"redis $what: transient error persisted through " +
            s"$maxRetries retries: ${e.getMessage}"
        }, cause)
      Thread.sleep(backoffMs * attempt)
    }

    def retrying[T](what: String)(f: RedisClient => T): T = {
      var attempt = 0
      while (true) {
        try return f(connected())
        catch {
          case e: java.io.IOException => // dropped / truncated connection
            dropClient()
            attempt += 1
            backoff(what, attempt, e)
          case e: RedisError if retriableErr(e.msg) =>
            attempt += 1
            backoff(what, attempt, e)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    /** Pipelined write that re-sends ONLY commands not known to have been
      * applied — never the acknowledged ones (replaying an acked XADD
      * would duplicate the entry: `ms-*` ids mint a fresh sub-sequence per
      * append). Replies drain one at a time, each settling its command's
      * fate: OK → done; transient error → the server refused WITHOUT
      * applying, requeue just that command (later commands of the batch
      * were still processed — a blind tail-resend would duplicate them);
      * fatal error → typed [[FatalReply]], no retry. A connection drop
      * requeues the refused commands plus the undrained tail. On a real
      * wire a drop can lose an in-flight append's reply (at-least-once,
      * same as the reference's requeue, producer.rs:464-507); the law this
      * method pins is that KNOWN-applied commands are never replayed.
      *
      * Ordering caveat: once a batch is pipelined, commands AFTER a
      * transiently-refused one have already been processed by the server —
      * they cannot be un-applied, and resending them to restore order would
      * duplicate them. So across a MIXED failure (refusal early, success or
      * drop later in the same batch) this method guarantees exactly-once,
      * NOT send order: the requeued command lands after the batch's
      * already-applied tail. Single-mode failures (all-refused, or a clean
      * drop) preserve order. Callers needing total order across transient
      * refusals must wrap the batch in MULTI/EXEC or send serially.
      */
    def pipelineAcked(cmds: Seq[Seq[Array[Byte]]], what: String = "xadd"): Unit = {
      var attempt = 0
      var pending = cmds
      while (pending.nonEmpty) {
        val batch = pending
        val redo = scala.collection.mutable.ArrayBuffer.empty[Seq[Array[Byte]]]
        var drained = 0
        try {
          val c = connected()
          c.writeCommands(batch)
          while (drained < batch.size) {
            c.readReplyRaw() match {
              case Resp.Err(m) if retriableErr(m) =>
                redo += batch(drained); drained += 1
              case Resp.Err(m) =>
                // Replies for commands after the fatal one are still queued
                // in the socket buffer; a reused Session would read THOSE as
                // the next batch's acks and misattribute them. Drop the
                // connection so the session can never resume desynced.
                dropClient()
                throw new FatalReply(m)
              case _ => drained += 1
            }
          }
          pending = redo.toSeq
          if (pending.nonEmpty) {
            attempt += 1
            backoff(what, attempt, RedisError("transient refusals in batch"))
          }
        } catch {
          case e: java.io.IOException =>
            dropClient()
            pending = redo.toSeq ++ batch.drop(drained)
            attempt += 1
            backoff(what, attempt, e)
        }
      }
    }

    override def close(): Unit = dropClient()
  }

  /** Non-retriable error reply escaping [[Session.pipelineAcked]] —
    * wrapped so the retry loop can't mistake it for a transient. */
  final class FatalReply(msg: String) extends RuntimeException(msg)

  /** Bounded retry with short backoff for DRIVER-side calls, which have no
    * task-retry safety net (a blip in offset planning must not kill a
    * query) — the reference consumer's reconnect loop (node.rs:299-310),
    * bounded so a dead broker still surfaces quickly.
    */
  def retrying[T](attempts: Int = 3, backoffMs: Long = 100L)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch {
        case _: java.io.IOException if attempt < attempts - 1 =>
          attempt += 1
          Thread.sleep(backoffMs << attempt)
      }
    }
    out.get
  }
}
