package graft.redis

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal blocking Redis connection over a plain socket. One connection per
  * executor task — the scale unit the Spark integration uses; no pooling
  * machinery because a task's lifetime IS the pool.
  */
final class RedisClient(host: String, port: Int,
    connectTimeoutMs: Int = 5000, soTimeoutMs: Int = 30000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setSoTimeout(soTimeoutMs)
  socket.setTcpNoDelay(true)
  private val in = Resp.buffered(socket.getInputStream)
  private val out = Resp.buffered(socket.getOutputStream)

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

  private def reply(v: Resp.Value): Resp.Value = v match {
    case Resp.Err(m) => throw RedisClient.RedisError(m)
    case other => other
  }

  override def close(): Unit = socket.close()
}

object RedisClient {
  final case class RedisError(msg: String) extends RuntimeException(msg)

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
