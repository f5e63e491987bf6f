package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.{GraftSession, Relay}

/** The reference's front-page basic stream processor (examples/src/bin/
  * processor.rs; README "Here is a basic stream processor"): consume
  * `--input`, run each message through `process`, produce the result to
  * `--output` — the examples/README run matrix's middle program.
  *
  * {{{
  * runMain graft.examples.Processor \
  *   --input redis://localhost:6379/hello1 --output redis://localhost:6379/hello2
  * runMain graft.examples.Producer --stream stdio:///hello1 | \
  * runMain graft.examples.Processor --input stdio:///hello1 --output stdio:///hello2
  * }}}
  *
  * A processor IS a relay with one transform hook (processor.rs's loop is
  * relay.rs's loop plus `process`), so this delegates to [[Relay.run]]
  * with the `process` step as the transform: the stdin bridge, live
  * tailing, bounded `--once` drain, and `--offset start|end` all carry
  * over. `process` itself is the reference's demo step —
  * `"{payload} processed"` (processor.rs:52) — expressed as a COLUMN map
  * so it runs inside the stream on executors, never on the driver.
  */
object Processor {

  /** processor.rs:51-53 — `Ok(format!("{} processed", ...))`. */
  def process(envelope: DataFrame): DataFrame =
    envelope.withColumn("payload",
      concat(col("payload").cast("string"), lit(" processed"))
        .cast("binary"))

  def main(args: Array[String]): Unit = {
    var input: Option[String] = None
    var output: Option[String] = None
    var offsetStart: Option[Boolean] = None
    var once = false
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: processor --input <url> --output <url> " +
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
      if (once) System.err.println(s"[processor] processed $n messages")
    } finally spark.stop()
  }

  /** Core, testable seam — [[Relay.run]] semantics with the `process`
    * transform applied between consume and produce.
    */
  def run(spark: SparkSession, input: String, output: String,
      offsetStart: Option[Boolean], once: Boolean,
      stdin: java.io.InputStream = System.in): Long =
    Relay.run(spark, input, output, offsetStart, once, stdin = stdin,
      transform = process)
}
