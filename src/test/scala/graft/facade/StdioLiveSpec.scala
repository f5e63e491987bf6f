package graft.facade

import java.nio.file.{Files, Path, StandardOpenOption}

import graft.TestSession
import graft.facade.SeaStreamer.{AutoStreamReset, ConsumerOptions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live stdio consumer laws: the growing line file stands in for stdin
  * (sea-streamer-stdio/src/streamer.rs:66-79) and lines appended WHILE the
  * stream runs are delivered — the mode the facade used to reject.
  */
class StdioLiveSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def append(p: Path, lines: String*): Unit =
    Files.write(p, (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("live stdio delivers appends while streaming, honoring parser defaults") {
    val f = Files.createTempDirectory("stdio-live").resolve("in.txt")
    append(f,
      "[2023-01-01T00:00:00 | fruits | 5 | 2] apple",
      "no meta at all",
      "[veggies] carrot")
    val conn = SeaStreamer.connect(s"stdio://$f", spark)
    val live = conn.createConsumer(Seq("fruits", "veggies"),
      ConsumerOptions(live = true,
        autoStreamReset = AutoStreamReset.Earliest))
    val q = live
      .select(col("stream_key"), col("shard_id"), col("sequence"),
        col("payload").cast("string").as("p"))
      .writeStream.format("memory").queryName("stdio_live_sink").start()
    try {
      q.processAllAvailable()
      // appended AFTER the stream started — the law the old throw denied
      append(f, "[fruits] banana", "[melons] skipped")
      q.processAllAvailable()
      val got = spark.table("stdio_live_sink")
        .as[(String, Long, Long, String)].collect().toSet
      assert(got == Set(
        // explicit meta honored: ts/key/seq/shard from the prefix
        ("fruits", 2L, 5L, "apple"),
        // keyless line → broadcast stream, shard 0, seq = line ordinal
        ("broadcast", 0L, 1L, "no meta at all"),
        // key only → seq defaults to the line ordinal
        ("veggies", 0L, 2L, "carrot"),
        ("fruits", 0L, 3L, "banana")))
      // 'melons' was filtered by the subscription (not a parse failure)
    } finally q.stop()
  }

  test("latest reset sees only lines appended after stream start") {
    val f = Files.createTempDirectory("stdio-live").resolve("in.txt")
    append(f, "[fruits] old-1", "[fruits] old-2")
    val conn = SeaStreamer.connect(s"stdio://$f", spark)
    val live = conn.createConsumer(Seq("fruits"),
      ConsumerOptions(live = true,
        autoStreamReset = AutoStreamReset.Latest))
    val q = live.select(col("payload").cast("string").as("p"))
      .writeStream.format("memory").queryName("stdio_latest_sink").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stdio_latest_sink").count() == 0)
      append(f, "[fruits] new-1")
      q.processAllAvailable()
      assert(spark.table("stdio_latest_sink").as[String].collect().toSeq
        == Seq("new-1"))
    } finally q.stop()
  }

  test("restart from checkpoint keeps line ordinals continuous (latest)") {
    // The default sequence is the file line ordinal, documented as
    // restart-stable: a restarted query must number the first recovered
    // batch checkpoint.line.., not construction-time-total-line-count..
    // (ADVICE r7 — the eager lastPlanned seed broke this).
    val dir = Files.createTempDirectory("stdio-restart")
    val f = dir.resolve("in.txt")
    val ckpt = dir.resolve("ckpt").toString
    val out = dir.resolve("out").toString
    append(f, "[fruits] pre-1", "[fruits] pre-2") // lines 0,1 — pre-start
    def start() = spark.readStream.format("stdio-lines")
      .option("startingOffsets", "latest").option("path", f.toString).load()
      .select(col("sequence"), col("payload").cast("string").as("p"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      append(f, "[fruits] live-1") // line 2, first delivered
      q1.processAllAvailable()
    } finally q1.stop()
    // lines appended BETWEEN the runs are recovered on restart and must
    // continue the checkpoint's numbering
    append(f, "[fruits] gap-1", "[fruits] gap-2") // lines 3,4
    val q2 = start()
    try {
      q2.processAllAvailable()
      append(f, "[fruits] live-2") // line 5
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .as[(Long, String)].collect().toSet
      assert(got == Set(
        (2L, "live-1"), (3L, "gap-1"), (4L, "gap-2"), (5L, "live-2")))
    } finally q2.stop()
  }

  test("lineBase re-anchors the default ordinals: a rotated spool file " +
      "keeps counting where the old file stopped instead of resetting " +
      "to 0 (the Relay spool-cap rotation contract)") {
    val f = Files.createTempDirectory("stdio-base").resolve("in.txt")
    // this file is the ROTATED TAIL: its byte 0 is logically line 7 of
    // the rotated-away history
    append(f, "[fruits] after-rot-1", "no meta")
    val df = spark.readStream.format("stdio-lines")
      .option("startingOffsets", "earliest").option("lineBase", "7")
      .option("path", f.toString).load()
    val q = df.select(col("stream_key"), col("sequence"),
        col("payload").cast("string").as("p"))
      .writeStream.format("memory").queryName("stdio_base_sink").start()
    try {
      q.processAllAvailable()
      append(f, "[fruits] after-rot-2")
      q.processAllAvailable()
      val got = spark.table("stdio_base_sink")
        .as[(String, Long, String)].collect().toSet
      assert(got == Set(
        ("fruits", 7L, "after-rot-1"),
        ("broadcast", 8L, "no meta"),
        ("fruits", 9L, "after-rot-2")))
    } finally q.stop()
  }

  test("a partial line without its newline is not delivered yet") {
    val f = Files.createTempDirectory("stdio-live").resolve("in.txt")
    Files.write(f, "[fruits] complete\n[fruits] par".getBytes("UTF-8"),
      StandardOpenOption.CREATE)
    val df = spark.readStream.format("stdio-lines")
      .option("startingOffsets", "earliest").option("path", f.toString).load()
    val q = df.select(col("payload").cast("string").as("p"))
      .writeStream.format("memory").queryName("stdio_partial_sink").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stdio_partial_sink").as[String].collect().toSeq
        == Seq("complete"))
      // the newline arrives → the held-back line is delivered whole
      Files.write(f, "tial\n".getBytes("UTF-8"), StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(spark.table("stdio_partial_sink").as[String].collect().toSet
        == Set("complete", "partial"))
    } finally q.stop()
  }
}
