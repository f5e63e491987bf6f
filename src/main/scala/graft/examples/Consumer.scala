package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.core.StreamUrl
import graft.facade.SeaStreamer
import graft.facade.SeaStreamer.{AutoStreamReset, ConsumerMode, ConsumerOptions}
import graft.ops.StdioParser

/** The reference's front-page basic consumer (examples/src/bin/
  * consumer.rs; the README Quick Start's first code block): subscribe the
  * StreamUrl's key(s) in RealTime mode anchored at Earliest
  * (consumer.rs:30-31 `set_auto_stream_reset(Earliest)`) and print every
  * message as `[<timestamp>] <payload>` (consumer.rs:39).
  *
  * {{{
  * runMain graft.examples.Consumer --stream redis://localhost:6379/hello2
  * runMain graft.examples.Consumer --stream kafka://localhost:9092/hello1,hello2
  * }}}
  *
  * The reference loops forever; `--once` is the bounded drain twin
  * (print the stream's current contents and exit) that makes the demo
  * composable in shell pipelines and tests — same extension the `relay`
  * port carries. Printing happens on the driver because printing IS this
  * program's output contract (a console viewer, not a data path).
  */
object Consumer {

  def main(args: Array[String]): Unit = {
    var stream: Option[String] = None
    var once = false
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: consumer --stream <url> [--once]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--stream" if i + 1 < args.length =>
          stream = Some(args(i + 1)); i += 2
        case "--once" => once = true; i += 1
        case _ => usage()
      }
    }
    if (stream.isEmpty) usage()
    val spark = GraftSession.get()
    try run(spark, stream.get, once)
    finally spark.stop()
  }

  private def printBatch(rows: Array[org.apache.spark.sql.Row]): Unit = {
    rows.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("timestamp")
      val payload = new String(r.getAs[Array[Byte]]("payload"), "UTF-8")
      // consumer.rs:39 `println!("[{}] {}", mess.timestamp(), ...)` with
      // the types crate's canonical TIMESTAMP_FORMAT rendering
      println(s"[${StdioParser.formatTimestamp(ts)}] $payload")
    }
    Console.out.flush()
  }

  /** Core, testable seam: rows printed in `--once` mode; a live consumer
    * blocks until its query is stopped and returns -1.
    */
  def run(spark: SparkSession, stream: String, once: Boolean): Long = {
    val url = StreamUrl.parse(stream)
    val conn = SeaStreamer.connect(SeaStreamer.connString(url), spark)
    val consumer = conn.createConsumer(url.streamKeys, ConsumerOptions(
      mode = ConsumerMode.RealTime,
      autoStreamReset = AutoStreamReset.Earliest,
      live = !once))
    if (once) {
      val rows = consumer
        .orderBy(col("timestamp"), col("sequence")).collect()
      printBatch(rows)
      rows.length.toLong
    } else {
      val q = consumer.writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          printBatch(df.orderBy(col("timestamp"), col("sequence")).collect()))
        .start()
      q.awaitTermination()
      -1L
    }
  }
}
