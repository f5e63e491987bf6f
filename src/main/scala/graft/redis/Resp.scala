package graft.redis

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** RESP2 wire codec (the Redis serialization protocol), dependency-free —
  * the zero-egress build has no redis client library, and the protocol is
  * small enough that hand-rolling it is simpler than vendoring one
  * (command framing: redis.io/docs/reference/protocol-spec; the reference
  * drives the same wire through the `redis` crate,
  * sea-streamer-redis/src/connection.rs).
  */
object Resp {

  sealed trait Value
  final case class Simple(s: String) extends Value
  final case class Err(msg: String) extends Value
  final case class Num(n: Long) extends Value
  final case class Bulk(bytes: Array[Byte]) extends Value {
    def utf8: String = new String(bytes, UTF_8)
  }
  case object NullBulk extends Value
  final case class Arr(items: Seq[Value]) extends Value
  case object NullArr extends Value

  /** Encode a command as a RESP array of bulk strings. */
  def encodeCommand(args: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      out.write(s"$$${a.length}\r\n".getBytes(UTF_8))
      out.write(a)
      out.write('\r'); out.write('\n')
    }
    out.toByteArray
  }

  def encodeCommandS(args: String*): Array[Byte] =
    encodeCommand(args.map(_.getBytes(UTF_8)))

  /** Encode a reply (used by the in-process test server). */
  def encodeValue(v: Value): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def go(v: Value): Unit = v match {
      case Simple(s) => out.write(s"+$s\r\n".getBytes(UTF_8))
      case Err(m) => out.write(s"-$m\r\n".getBytes(UTF_8))
      case Num(n) => out.write(s":$n\r\n".getBytes(UTF_8))
      case Bulk(b) =>
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
        out.write(b); out.write('\r'); out.write('\n')
      case NullBulk => out.write("$-1\r\n".getBytes(UTF_8))
      case Arr(items) =>
        out.write(s"*${items.length}\r\n".getBytes(UTF_8))
        items.foreach(go)
      case NullArr => out.write("*-1\r\n".getBytes(UTF_8))
    }
    go(v)
    out.toByteArray
  }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("RESP stream closed mid-line")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new EOFException("RESP line missing \\n")
    sb.result()
  }

  /** Parse one RESP value from the stream (blocking). */
  def parse(in: InputStream): Value = {
    val t = in.read()
    if (t < 0) throw new EOFException("RESP stream closed")
    val line = readLine(in)
    t.toChar match {
      case '+' => Simple(line)
      case '-' => Err(line)
      case ':' => Num(line.toLong)
      case '$' =>
        val n = line.toInt
        if (n < 0) NullBulk
        else {
          val buf = new Array[Byte](n)
          var read = 0
          while (read < n) {
            val r = in.read(buf, read, n - read)
            if (r < 0) throw new EOFException("RESP bulk truncated")
            read += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new EOFException("RESP bulk missing terminator")
          Bulk(buf)
        }
      case '*' =>
        val n = line.toInt
        if (n < 0) NullArr
        else Arr((0 until n).map(_ => parse(in)))
      case other =>
        throw new IllegalArgumentException(s"unknown RESP type byte '$other'")
    }
  }

  /** Buffered copies — sized for pipelined command batches. */
  def buffered(in: InputStream): InputStream = new BufferedInputStream(in, 1 << 16)
  def buffered(out: OutputStream): OutputStream = new BufferedOutputStream(out, 1 << 16)
}
