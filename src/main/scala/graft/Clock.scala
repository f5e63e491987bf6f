package graft

import graft.ops.StdioParser

/** The reference's `clock` demo producer (sea-streamer-stdio/src/bin/
  * clock.rs; README "Here is how to stream from Stdio ➡️ Redis / Kafka"):
  * emit `{ "tick": N }` payloads on a stdio stream at a fixed interval.
  * The stdio producer contract is this process's stdout, so lines print
  * in the producer format `[ts | stream | seq] payload`
  * (sea-streamer-stdio/src/producer.rs) — pipeable straight into
  * [[Relay]]'s stdio input, exactly the reference's `clock | relay`
  * pipeline. No Spark session needed: a clock is a single local producer.
  *
  * `--ticks N` bounds the run (the reference loops to u64::MAX; a bound
  * makes the pipeline drainable in tests and shell demos).
  */
object Clock {

  /** Reference clock.rs duration grammar: ns/us/ms/s/m suffixes. The
    * reference parses the count as u64, whose FromStr accepts ONE
    * optional leading `+` but no `-` — so `+1s` parses and `-1s` is a
    * parse error there. Match that exactly: a `-` must surface as the
    * parse error + usage that main's catch prints, never a raw
    * IllegalArgumentException from Thread.sleep.
    */
  private[graft] def parseDuration(src: String): Long = {
    def num(raw: String): Long = {
      val s = if (raw.startsWith("+")) raw.drop(1) else raw
      if (s.isEmpty || !s.forall(_.isDigit))
        throw new IllegalArgumentException(
          s"Failed to parse $src as Duration")
      s.toLong
    }
    if (src.endsWith("ns")) math.max(1L, num(src.dropRight(2)) / 1000000L)
    else if (src.endsWith("us")) math.max(1L, num(src.dropRight(2)) / 1000L)
    else if (src.endsWith("ms")) num(src.dropRight(2))
    else if (src.endsWith("m")) num(src.dropRight(1)) * 60000L
    else if (src.endsWith("s")) num(src.dropRight(1)) * 1000L
    else throw new IllegalArgumentException(
      s"Failed to parse $src as Duration")
  }

  def main(args: Array[String]): Unit = {
    var stream: Option[String] = None
    var intervalMs: Option[Long] = None
    var ticks: Long = Long.MaxValue
    var i = 0
    def usage(): Nothing = {
      System.err.println(
        "usage: clock --stream <key> --interval <1s|100ms|...> [--ticks N]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--stream" if i + 1 < args.length =>
          stream = Some(args(i + 1)); i += 2
        case "--interval" if i + 1 < args.length =>
          // a malformed duration prints the parse error + usage, never a
          // raw stack trace (round-17 review)
          intervalMs = Some(
            try parseDuration(args(i + 1))
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
    val key = stream.getOrElse(usage())
    if (!graft.core.Envelope.isValidStreamKey(key)) {
      System.err.println(s"invalid stream key: $key"); sys.exit(2)
    }
    val interval = intervalMs.getOrElse(usage())
    var tick = 0L
    while (tick < ticks) {
      println(StdioParser.formatLine(
        new java.sql.Timestamp(System.currentTimeMillis()), key, tick,
        s"""{ "tick": $tick }"""))
      Console.out.flush()
      tick += 1
      if (tick < ticks) Thread.sleep(interval)
    }
  }
}
