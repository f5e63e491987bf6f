package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files

import graft.TestSession
import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** Surveyor point-seek laws (sea-streamer-file/src/surveyor.rs:16-122,
  * seek/rewind laws messages.rs:262-279): a mid-file replay starts at the
  * exact first qualifying frame found by beacon binary search.
  */
class SsSurveyorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** A multi-beacon two-stream file: seq i carries ts 1000+i. */
  private def writeFixture(n: Int): String = {
    val dir = Files.createTempDirectory("surveyor").toFile
    val path = s"$dir/s.ss"
    val w = new SsWriter(new FileOutputStream(path), "s.ss", 1024, 0L)
    (0 until n).foreach { i =>
      w.write(SeaMessage(if (i % 2 == 0) "a" else "b", 0, i.toLong,
        ts(1000L + i), (s"m$i-" + "x" * 40).getBytes))
    }
    w.close()
    path
  }

  test("seekOffset lands on the exact first frame past each law") {
    val path = writeFixture(2000)
    // ground truth by full scan
    def firstOffset(p: SeaMessage => Boolean): Long = {
      val r = SsReader.open(path, verifyChecksum = false, skim = true)
      try {
        var res = -1L
        var pos = r.currentOffset
        while (res < 0) r.next() match {
          case Some(rec) =>
            if (p(rec.message)) res = rec.startOffset else pos = rec.endOffset
          case None => res = pos
        }
        res
      } finally r.close()
    }
    // seek: ts > 2500 → first frame is seq 1501
    assert(SsSurveyor.seekOffset(path, Some(2500L), None) ==
      firstOffset(_.timestamp.getTime > 2500L))
    // rewind: seq >= 700
    assert(SsSurveyor.seekOffset(path, None, Some(700L)) ==
      firstOffset(_.sequence >= 700L))
    // beyond the end: frame-exact end of data, not a mid-frame offset
    val end = SsSurveyor.seekOffset(path, Some(999999L), None)
    assert(end == firstOffset(_ => false))
    // before the beginning: the whole file
    assert(SsSurveyor.seekOffset(path, Some(0L), None) ==
      firstOffset(_ => true))
  }

  test("startingTimestamp/startingSequence stream only the lawful suffix") {
    val path = writeFixture(1200)
    val dir = new java.io.File(path).getParent

    val q1 = spark.readStream.format("ss")
      .option("startingTimestamp", "1999")
      .load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("surv_ts").start()
    try q1.processAllAvailable() finally q1.stop()
    val got1 = spark.table("surv_ts").select("sequence").as[Long].collect().sorted
    assert(got1.toSeq == (1000L until 1200L), "seek law is strict >")

    val q2 = spark.readStream.format("ss")
      .option("startingSequence", "1000")
      .load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("surv_seq").start()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = spark.table("surv_seq").select("sequence").as[Long].collect().sorted
    assert(got2.toSeq == (1000L until 1200L), "rewind law is >=")
  }

  test("latest conflicts with a point seek") {
    val path = writeFixture(10)
    val dir = new java.io.File(path).getParent
    val q = spark.readStream.format("ss")
      .option("startingOffsets", "latest")
      .option("startingTimestamp", "5")
      .load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("surv_conflict").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("conflicts") ||
        Option(e.getCause).exists(_.getMessage.contains("conflicts")))
    } finally q.stop()
  }
}
