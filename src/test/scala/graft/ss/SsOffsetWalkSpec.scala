package graft.ss

import java.io.{FileOutputStream, RandomAccessFile}
import java.nio.file.Files

import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

/** The streaming offset walk's two laws:
  *   1. correctness — safeEnd equals the ground truth (last complete frame
  *      end / first end past the budget target) on every tail shape:
  *      clean EOF, truncated mid-frame, spliced frames, boundary-exact ends;
  *   2. boundedness — driver work per trigger is O(beaconInterval), NOT
  *      O(new bytes): appending megabytes between triggers must not grow
  *      the walked-byte count (the round-4 `weak` this replaces).
  */
class SsOffsetWalkSpec extends AnyFunSuite {

  private val Interval = 4096

  private def msg(i: Int, size: Int = 100) = SeaMessage("s", 0, i.toLong,
    new java.sql.Timestamp(1000L + i), Array.fill(size)((i % 251).toByte))

  /** Write n messages, return (path, per-frame end offsets). */
  private def build(n: Int, size: Int = 100): (String, Seq[Long]) = {
    val dir = Files.createTempDirectory("walk").toFile
    val path = s"$dir/w.ss"
    val w = new SsWriter(new FileOutputStream(path), "w.ss", Interval, 0L)
    val ends = (0 until n).map { i => w.write(msg(i, size)); w.offset }
    w.close()
    (path, ends)
  }

  /** Ground truth by the O(new bytes) full walk the implementation replaced. */
  private def fullWalk(path: String, from: Long): Long = {
    val r =
      if (from <= SsFormat.HeaderSize)
        SsReader.open(path, verifyChecksum = false, skim = true)
      else SsReader.openAtOffset(path, from, verifyChecksum = false, skim = true)
    try {
      var end = math.max(from, SsFormat.HeaderSize.toLong)
      var done = false
      while (!done) r.next() match {
        case Some(rec) => end = rec.endOffset
        case None => done = true
      }
      end
    } finally r.close()
  }

  test("clean file: safeEnd equals the full walk from any prior offset") {
    val (path, ends) = build(500)
    assert(SsOffsetWalk.safeEnd(path, 0L).offset == fullWalk(path, 0L))
    // resume from several mid-stream frame boundaries
    Seq(0, 9, 120, 333, 498).map(ends).foreach { from =>
      assert(SsOffsetWalk.safeEnd(path, from).offset == fullWalk(path, from),
        s"from=$from")
    }
    // caught-up: nothing new
    assert(SsOffsetWalk.safeEnd(path, ends.last).offset == ends.last)
  }

  test("truncated tail: end stops at the EOF-straddling frame's start") {
    val (path, ends) = build(300)
    // chop mid-frame at several depths, incl. inside a spliced frame region
    Seq(1, 57, 1000, Interval / 2).foreach { chop =>
      val dir = Files.createTempDirectory("walkt").toFile
      val p2 = s"$dir/t.ss"
      Files.copy(java.nio.file.Paths.get(path), java.nio.file.Paths.get(p2))
      val raf = new RandomAccessFile(p2, "rw")
      raf.setLength(ends.last - chop)
      raf.close()
      val got = SsOffsetWalk.safeEnd(p2, 0L).offset
      assert(got == fullWalk(p2, 0L), s"chop=$chop")
      assert(got <= ends.last - chop)
      assert(ends.contains(got), "end must be a frame boundary")
    }
  }

  test("huge frames spanning multiple beacon intervals") {
    val (path, _) = build(8, size = 3 * Interval) // every frame spans >2 beacons
    assert(SsOffsetWalk.safeEnd(path, 0L).offset == fullWalk(path, 0L))
    // truncate inside the last monster frame: walk must converge below it
    val full = fullWalk(path, 0L)
    val raf = new RandomAccessFile(path, "rw")
    raf.setLength(full - Interval) // cut > one interval into the last frame
    raf.close()
    assert(SsOffsetWalk.safeEnd(path, 0L).offset == fullWalk(path, 0L))
  }

  test("byte budget: first frame end at/after the target, monotone progress") {
    val (path, ends) = build(400)
    var from = 0L
    var batches = 0
    while (from < ends.last && batches < 1000) {
      val e = SsOffsetWalk.safeEnd(path, from, budget = 2000L)
      assert(e.offset > from, s"stalled at $from")
      assert(ends.contains(e.offset))
      // the end is the FIRST frame end at/after the byte target (overshoot
      // at most one frame), or EOF when the target lies past the file
      val target = math.max(from, SsFormat.HeaderSize.toLong) + 2000L
      if (target <= ends.last) {
        assert(e.offset >= target)
        assert(e.offset == ends.find(_ >= target).get)
      } else assert(e.offset == ends.last)
      from = e.offset
      batches += 1
    }
    assert(from == ends.last)
    assert(batches > 5, "budget should force multiple batches")
  }

  test("boundedness: walked bytes stay O(interval) as appended bytes grow 100x") {
    val (path, ends) = build(5100)
    // the trigger's committed offset sits 5000 frames (>>100 intervals)
    // behind the tail — the exact shape that made the old walk O(new bytes)
    val from = ends(99)
    val grown = new java.io.File(path).length()
    assert(grown - from > 100L * Interval, "test premise: big append")

    val e = SsOffsetWalk.safeEnd(path, from)
    assert(e.offset == fullWalk(path, from))
    // the law this spec exists for: no full-byte skim per trigger
    assert(e.walkedBytes <= 2L * Interval,
      s"walked ${e.walkedBytes} bytes for a ${grown - from}-byte append")
    assert(e.probes <= 3)
  }
}
