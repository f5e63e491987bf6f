package graft.ss

/** The reference's `tail` dev demo (sea-streamer-file/src/bin/tail.rs):
  * a raw-bytes `tail -f` — open the file, anchor at its END
  * (`ReadFrom::End`), and stream every newly-appended byte to stdout,
  * flushed as it arrives. No `.ss` decoding: the reference's
  * `FileSource::stream_bytes` hands raw bytes through, so this works on
  * any growing file (a `.ss` container prints as binary, a log file as
  * text — same as the original).
  *
  * Driver-local by design, like the original: one file, one cursor, an
  * endless poll loop. The distributed tail is the `ss`/`stdio-lines`
  * streaming sources.
  */
object SsTail {

  /** Testable seam: pump bytes from `path` to `out`, polling for growth.
    * Starts at EOF when `fromEnd` (tail.rs's `ReadFrom::End`), else at
    * byte 0. `stop` is consulted at each idle poll — `main` never stops
    * (the reference loops forever); tests bound it. Returns bytes copied.
    */
  private[ss] def tail(path: String, out: java.io.OutputStream,
      fromEnd: Boolean = true, pollMs: Long = 50L,
      stop: () => Boolean = () => false,
      anchored: Long => Unit = _ => ()): Long = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      var pos = if (fromEnd) f.length() else 0L
      anchored(pos)
      var copied = 0L
      val buf = new Array[Byte](1 << 16)
      var done = false
      while (!done) {
        val len = f.length()
        if (len < pos) {
          // the file was truncated under us (logrotate copytruncate,
          // `> file`): a cursor past EOF would stall forever on
          // `len > pos`. Re-anchor at the new start like `tail -f` does
          // ("file truncated") and keep following (round-18 review).
          System.err.println(s"[tail] $path truncated ($pos -> $len), " +
            "following from the start of the new content")
          pos = 0L
        }
        if (len > pos) {
          f.seek(pos)
          var remaining = len - pos
          while (remaining > 0) {
            val n = f.read(buf, 0, math.min(remaining, buf.length.toLong).toInt)
            if (n > 0) {
              out.write(buf, 0, n)
              pos += n; copied += n; remaining -= n
            } else remaining = 0
          }
          out.flush()
        } else if (stop()) done = true
        else Thread.sleep(pollMs)
      }
      copied
    } finally f.close()
  }

  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: tail --file <path>")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--file" if i + 1 < args.length => file = Some(args(i + 1)); i += 2
        case _ => usage()
      }
    }
    val path = file.getOrElse(usage())
    if (!new java.io.File(path).isFile) {
      System.err.println(s"no such file: $path"); sys.exit(2)
    }
    tail(path, System.out)
  }
}
