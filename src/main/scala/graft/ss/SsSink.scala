package graft.ss

import java.io.{BufferedOutputStream, File, FileOutputStream}

import graft.core.SeaMessage

/** The reference's `sink` dev demo (sea-streamer-file/src/bin/sink.rs): a
  * clock that writes straight into a `.ss` container — stream key `clock`,
  * shard 0, sequence = tick ordinal, payload `tick-N` — one frame per
  * interval, default beacon interval and the 16 GB default size limit
  * (`DEFAULT_BEACON_INTERVAL`, `DEFAULT_FILE_SIZE_LIMIT`,
  * sea-streamer-file/src/lib.rs:92-93). The duration grammar is the demo
  * family's shared one ([[graft.Clock.parseDuration]]; sink.rs:16-26 is
  * the ms/s/m subset of clock.rs's).
  *
  * `--ticks N` bounds the run like [[graft.Clock]] (the reference loops to
  * u64::MAX); a bounded run flushes and closes WITHOUT an EOS frame,
  * mirroring sink.rs's bare `flush()` — the container stays appendable
  * ([[SsWriter.append]] resumes it) and fully readable.
  */
object SsSink {

  /** Testable seam: write `ticks` clock frames at `intervalMs` into a
    * fresh container at `path`. Returns frames written.
    */
  private[ss] def run(path: String, intervalMs: Long, ticks: Long,
      sizeLimit: Long = SsFormat.DefaultFileSizeLimit): Long = {
    val dest = new File(path)
    val w = new SsWriter(
      new BufferedOutputStream(new FileOutputStream(dest), 1 << 16),
      dest.getName)
    var i = 0L
    try {
      while (i < ticks) {
        if (w.offset >= sizeLimit)
          throw new IllegalStateException(
            s"file size limit reached ($sizeLimit bytes) at tick $i")
        w.write(SeaMessage("clock", 0L, i,
          new java.sql.Timestamp(System.currentTimeMillis()),
          s"tick-$i".getBytes("UTF-8")))
        // flush per tick, not per run: the endless default (`--ticks`
        // absent = u64::MAX, sink.rs:42) never reaches a post-loop flush,
        // and a drip-feed clock buffered 64 KB deep would keep the
        // container empty for a concurrent tail/decode for ~minutes and
        // lose every buffered tick on Ctrl-C (round-18 review)
        w.flush()
        i += 1
        if (i < ticks) Thread.sleep(intervalMs)
      }
      i
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var intervalMs: Option[Long] = None
    var ticks: Long = Long.MaxValue
    var i = 0
    def usage(): Nothing = {
      System.err.println(
        "usage: sink --file <path> --interval <1s|100ms|...> [--ticks N]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--file" if i + 1 < args.length =>
          file = Some(args(i + 1)); i += 2
        case "--interval" if i + 1 < args.length =>
          intervalMs = Some(
            try graft.Clock.parseDuration(args(i + 1))
            catch { case e: RuntimeException =>
              System.err.println(e.getMessage); usage()
            })
          i += 2
        case "--ticks" if i + 1 < args.length =>
          ticks =
            try args(i + 1).toLong
            catch { case _: NumberFormatException =>
              System.err.println(s"--ticks must be a number: ${args(i + 1)}")
              usage()
            }
          i += 2
        case _ => usage()
      }
    }
    run(file.getOrElse(usage()), intervalMs.getOrElse(usage()), ticks)
  }
}
