package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files

import graft.TestSession
import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** Resumable-mode law: a checkpointed query restarted over the same source
  * resumes from committed offsets — every message delivered exactly once to
  * the sink across restarts (reference Resumable semantics, SURVEY §2.6,
  * via Spark's checkpoint). Also exercises SsOffset.deserializeOffset and
  * the ss streaming sink end-to-end.
  */
class SsRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("checkpointed ss-to-ss pipeline resumes exactly-once across restart") {
    val src = Files.createTempDirectory("restart_src").toFile
    val dst = Files.createTempDirectory("restart_dst").toString
    val ckpt = Files.createTempDirectory("restart_ckpt").toString
    val path = s"$src/live.ss"

    def msg(i: Int) = SeaMessage("r", 0, i.toLong,
      new java.sql.Timestamp(1000L + i), s"m$i".getBytes)

    val w = new SsWriter(new FileOutputStream(path), "live.ss", 1024, 0L)
    (0 until 40).foreach(i => w.write(msg(i)))
    w.flush()

    def startQuery() = spark.readStream.format("ss").load(src.toString)
      .writeStream.format("ss")
      .option("checkpointLocation", ckpt)
      .option("path", dst).start()

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.format("ss").load(dst).count() == 40)

    // append while the query is DOWN, then restart from the checkpoint
    (40 until 70).foreach(i => w.write(msg(i)))
    w.close()
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.format("ss").load(dst)
    assert(out.count() == 70, "restart must deliver exactly the new frames")
    val seqs = out.select("sequence").as[Long].collect().sorted.toSeq
    assert(seqs == (0L until 70L), "no duplicates, no gaps after restart")
  }
}
