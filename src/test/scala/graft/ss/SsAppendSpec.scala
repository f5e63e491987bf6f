package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files

import graft.TestSession
import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** Single-file append parity (sea-streamer-file/src/messages.rs:420-515):
  * reopening a container truncates a trailing EOS (or crashed-writer tail),
  * restores marker state, and continues beacon-consistently.
  */
class SsAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private def msg(i: Int, key: String = "k") =
    SeaMessage(key, 0, i.toLong, ts(1000L + i), (s"m$i-" + "x" * 30).getBytes)

  test("append after EOS truncates the EOS and continues the stream") {
    val dir = Files.createTempDirectory("ssappend").toFile
    val path = s"$dir/a.ss"
    val w1 = new SsWriter(new FileOutputStream(path), "a.ss", 1024, 0L)
    (0 until 300).foreach(i => w1.write(msg(i)))
    w1.endOfStream()
    w1.close()

    // reader stops at EOS
    assert(spark.read.format("ss").load(path).count() == 300)

    val w2 = SsWriter.append(path)
    assert(w2.messageCount == 300)
    (300 until 500).foreach(i => w2.write(msg(i)))
    w2.close()

    val back = spark.read.format("ss").load(path)
    assert(back.count() == 500)
    assert(back.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 500L))
  }

  test("appended beacons stay consistent: splits, pruning and surveyor work") {
    val dir = Files.createTempDirectory("ssappend2").toFile
    val path = s"$dir/b.ss"
    val w1 = new SsWriter(new FileOutputStream(path), "b.ss", 1024, 0L)
    (0 until 400).foreach(i => w1.write(msg(i)))
    w1.endOfStream()
    w1.close()
    val w2 = SsWriter.append(path)
    (400 until 800).foreach(i => w2.write(msg(i)))
    w2.close()

    // beacon-split batch scan decodes across the append boundary
    val back = spark.read.format("ss").load(path)
    assert(back.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 800L))
    // surveyor point-seek binary-searches beacons spanning both sessions
    val r = SsReader.openAtOffset(path,
      SsSurveyor.seekOffset(path, None, Some(600L)),
      verifyChecksum = false, skim = true)
    try assert(r.next().map(_.message.sequence).contains(600L))
    finally r.close()
  }

  test("append truncates a crashed writer's incomplete tail frame") {
    val dir = Files.createTempDirectory("ssappend3").toFile
    val path = s"$dir/c.ss"
    val w1 = new SsWriter(new FileOutputStream(path), "c.ss", 1024, 0L)
    (0 until 100).foreach(i => w1.write(msg(i)))
    w1.close()
    // simulate a mid-frame crash: chop the last 7 bytes
    val full = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      full.dropRight(7))

    val w2 = SsWriter.append(path)
    assert(w2.messageCount == 99, "incomplete frame must not count")
    (100 until 150).foreach(i => w2.write(msg(i)))
    w2.close()
    val seqs = spark.read.format("ss").load(path)
      .select("sequence").as[Long].collect().sorted.toSeq
    assert(seqs == ((0L until 99L) ++ (100L until 150L)),
      "frame 99 was truncated by the crash; the rest must survive")
  }

  test("append works when the cut lands exactly on a beacon boundary") {
    val dir = Files.createTempDirectory("ssappend4").toFile
    val path = s"$dir/d.ss"
    val w1 = new SsWriter(new FileOutputStream(path), "d.ss", 1024, 0L)
    // size the first frame to END exactly at the first boundary, so the EOS
    // that follows STARTS there (the cut-on-boundary case: the beacon at
    // the boundary must survive the truncation)
    val target = 1024L - w1.offset
    def mk(p: Int) = SeaMessage("k", 0, 0L, ts(1000L), Array.fill(p)('x'.toByte))
    val p = (1 to 2000).find(n => SsFormat.encodeMessage(mk(n))._1.length.toLong == target)
    assert(p.isDefined, "no payload size hits the boundary exactly")
    w1.write(mk(p.get))
    w1.endOfStream()
    w1.close()

    val w2 = SsWriter.append(path)
    assert(w2.messageCount == 1)
    (1 until 50).foreach(j => w2.write(msg(j)))
    w2.close()
    val seqs = spark.read.format("ss").load(path)
      .select("sequence").as[Long].collect().sorted.toSeq
    assert(seqs == (0L until 50L))
  }
}
