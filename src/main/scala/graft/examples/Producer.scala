package graft.examples

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.core.StreamUrl
import graft.facade.SeaStreamer

/** The reference's front-page basic producer (examples/src/bin/
  * producer.rs; README "Here is a basic stream producer"): anchor ONE
  * stream key from a StreamUrl and send `"tick N"` payloads (the JSON
  * string literal, quotes included — producer.rs:31 `r#""tick {tick}""#`)
  * at a fixed interval, echoing each to stderr, then flush and exit.
  *
  * {{{
  * runMain graft.examples.Producer --stream redis://localhost:6379/hello1
  * runMain graft.examples.Producer --stream stdio:///hello1
  * }}}
  *
  * The reference loops exactly 100 ticks at 1 s (producer.rs:29-37) —
  * those are the defaults here; `--ticks`/`--interval` bound shell demos
  * and tests. `producer.end()` (flush) is implicit: every `send` in this
  * library is a completed synchronous write, so exit IS the flush.
  */
object Producer {

  def main(args: Array[String]): Unit = {
    var stream: Option[String] = None
    var intervalMs = 1000L
    var ticks = 100L
    var i = 0
    def usage(): Nothing = {
      System.err.println(
        "usage: producer --stream <url> [--interval 1s|100ms|...] [--ticks N]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--stream" if i + 1 < args.length =>
          stream = Some(args(i + 1)); i += 2
        case "--interval" if i + 1 < args.length =>
          intervalMs =
            try graft.Clock.parseDuration(args(i + 1))
            catch { case e: RuntimeException =>
              System.err.println(e.getMessage); usage()
            }
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
    if (stream.isEmpty) usage()
    val spark = GraftSession.get()
    try run(spark, stream.get, intervalMs, ticks)
    finally spark.stop()
  }

  /** Core, testable seam: returns the number of ticks sent. */
  def run(spark: SparkSession, stream: String, intervalMs: Long,
      ticks: Long): Long = {
    val url = StreamUrl.parse(stream)
    val conn = SeaStreamer.connect(SeaStreamer.connString(url), spark)
    // stream.stream_key()? — exactly one key or a typed error
    val producer = conn.createProducer(url.streamKey)
    import spark.implicits._
    var tick = 0L
    while (tick < ticks) {
      val message = s""""tick $tick""""
      System.err.println(message)
      producer.send(Seq((url.streamKey, 0L, tick,
        new java.sql.Timestamp(System.currentTimeMillis()),
        message.getBytes("UTF-8")))
        .toDF("stream_key", "shard_id", "sequence", "timestamp", "payload"))
      tick += 1
      if (tick < ticks) Thread.sleep(intervalMs)
    }
    ticks
  }
}
