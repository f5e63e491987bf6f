package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.core.{StreamUrl, SeaStreamErr}
import graft.facade.SeaStreamer
import graft.facade.SeaStreamer.{AutoStreamReset, ConsumerMode, ConsumerOptions}

/** The reference's `relay` demo program (sea-streamer-socket/src/bin/
  * relay.rs; README "The `relay` program redirect messages from `input`
  * to `output`"): redirect messages between ANY two backends selected at
  * runtime by StreamUrl —
  *
  * {{{
  * runMain graft.Relay --input stdio:///clock --output redis://localhost:6379/clock
  * runMain graft.Relay --input redis://localhost:6379/clock --output kafka://localhost:9092/clock
  * runMain graft.Relay --input kafka://localhost:9092/clock --output stdio:///clock --offset start
  * }}}
  *
  * Semantics mirror relay.rs: `--offset start|end` maps to the consumer's
  * earliest/latest reset, the input may subscribe several stream keys
  * while the output anchors exactly one, and `input == output` is refused
  * unless the protocol is stdio (relay.rs:58-60). `stdio:///` as input
  * means THIS process's stdin (the reference's dedicated stdin thread),
  * bridged through a spool file for the `stdio-lines` source;
  * `stdio://<path>` reads that line file directly. Output `stdio` prints
  * producer-format lines on the driver's stdout — so `clock | relay`
  * composes exactly like the reference README's pipeline.
  *
  * `--once` is the bounded form (drain the input's current contents,
  * send, exit) — the Replay-mode twin of the reference's endless loop,
  * and what makes the program drainable in shell pipelines and tests.
  * This is an at-least-once demo pipe like the reference's; the
  * exactly-once engines live behind `SeaStreamer.relayExactlyOnce`.
  */
object Relay {

  def main(args: Array[String]): Unit = {
    var input: Option[String] = None
    var output: Option[String] = None
    var offsetStart: Option[Boolean] = None
    var once = false
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: relay --input <url> --output <url> " +
        "[--offset start|end] [--once]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--input" if i + 1 < args.length =>
          input = Some(args(i + 1)); i += 2
        case "--output" if i + 1 < args.length =>
          output = Some(args(i + 1)); i += 2
        case "--offset" if i + 1 < args.length =>
          args(i + 1) match {
            case "start" => offsetStart = Some(true)
            case "end" => offsetStart = Some(false)
            case other =>
              System.err.println(s"unknown Offset: $other"); sys.exit(2)
          }
          i += 2
        case "--once" => once = true; i += 1
        case _ => usage()
      }
    }
    if (input.isEmpty || output.isEmpty) usage()
    val spark = GraftSession.get()
    try {
      val n = run(spark, input.get, output.get, offsetStart, once)
      if (once) System.err.println(s"[relay] relayed $n messages")
    } finally spark.stop()
  }

  /** Core, testable seam. Returns rows relayed in `--once` mode; a live
    * relay blocks until the query terminates and returns -1.
    *
    * `offsetStart`: None = the mode's natural default — live follows the
    * reference's `end` (relay.rs default), bounded `--once` drains from
    * the start (Replay semantics). `--once --offset end` is REFUSED: the
    * bounded readers have no "from the tip" form, and silently draining
    * the whole stream under an explicit `end` would re-ship everything
    * on every invocation.
    */
  def run(spark: SparkSession, input: String, output: String,
      offsetStart: Option[Boolean], once: Boolean,
      stdin: java.io.InputStream = System.in): Long = {
    if (once && offsetStart.contains(false))
      throw SeaStreamErr.Unsupported(
        "--once is a bounded start-to-tip drain; --offset end would " +
          "silently re-ship the whole stream (use a live relay for " +
          "latest-only)")
    val in = StreamUrl.parse(input)
    val out = StreamUrl.parse(output)
    val inProto = in.streamer.protocol.getOrElse(
      throw SeaStreamErr.Connect(s"no protocol in '$input'"))
    // relay.rs:58-60 — a self-relay would loop; stdio is exempt because
    // its input (stdin) and output (stdout) are distinct pipes
    if (input == output && inProto != "stdio")
      throw SeaStreamErr.Unsupported("input == output !!!")

    out.streamer.protocol.getOrElse(
      throw SeaStreamErr.Connect(s"no protocol in '$output'"))

    def connStr(u: StreamUrl): String = {
      val proto = u.streamer.protocol.get
      val hosts = u.streamer.nodes
        .map(_.stripPrefix(proto + "://")).mkString(",")
      s"$proto://$hosts"
    }

    // stdio:///key = THIS process's stdin: spool it to a line file the
    // stdio-lines source can read (bounded mode drains stdin to EOF
    // first; live mode tails the spool as it grows)
    val inUri =
      if (inProto == "stdio" && connStr(in) == "stdio://.") {
        val spool = Files.createTempFile("relay-stdin", ".log")
        spool.toFile.deleteOnExit()
        if (once) {
          Files.copy(stdin, spool, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } else {
          val t = new Thread(() => {
            val rdr = new java.io.BufferedReader(
              new java.io.InputStreamReader(stdin, "UTF-8"))
            // one appender held open for the thread's life, flushed per
            // line — a Files.write(APPEND) per line would pay an
            // open/close pair on every message of the ingest hot path
            val w = new java.io.OutputStreamWriter(
              Files.newOutputStream(spool, StandardOpenOption.APPEND),
              "UTF-8")
            try {
              var line = rdr.readLine()
              while (line != null) {
                w.write(line); w.write('\n'); w.flush()
                line = rdr.readLine()
              }
            } finally w.close()
          }, "relay-stdin-spool")
          t.setDaemon(true)
          t.start()
        }
        s"stdio://$spool"
      } else connStr(in)

    val source = SeaStreamer.connect(inUri, spark)
    val sink = SeaStreamer.connect(connStr(out), spark)
    val consumer = source.createConsumer(in.streamKeys,
      ConsumerOptions(
        mode = ConsumerMode.RealTime,
        live = !once,
        autoStreamReset =
          if (offsetStart.getOrElse(once)) AutoStreamReset.Earliest
          else AutoStreamReset.Latest))
    val producer = sink.createProducer(out.streamKey)
    if (once) {
      // bounded drain: pin the rows so count and send read one snapshot
      val batch = consumer.localCheckpoint(true)
      val n = batch.count()
      producer.send(batch)
      n
    } else {
      val q = consumer.writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          producer.send(df))
        .start()
      q.awaitTermination()
      -1L
    }
  }
}
