package graft.ss

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SeaMessage

/** Laws of the reference's three file dev bins, re-expressed:
  * `tail` (sea-streamer-file/src/bin/tail.rs), `sink` (bin/sink.rs) and
  * `stdin-to-file` (bin/stdin-to-file.rs).
  */
class DevBinsSpec extends AnyFunSuite {

  test("tail anchors at EOF and streams only newly-appended raw bytes " +
      "(ReadFrom::End, tail.rs:17)") {
    val f = Files.createTempFile("sstail", ".log")
    Files.write(f, "history-not-shown\n".getBytes("UTF-8"))
    val buf = new java.io.ByteArrayOutputStream()
    @volatile var stopNow = false
    @volatile var copied = -1L
    val anchorLatch = new java.util.concurrent.CountDownLatch(1)
    @volatile var anchorPos = -1L
    val t = new Thread(() =>
      copied = SsTail.tail(f.toString, buf, fromEnd = true, pollMs = 10L,
        stop = () => stopNow,
        // record only — an assert here would die in the tail thread and
        // surface as an opaque latch timeout instead of the real mismatch
        anchored = pos => { anchorPos = pos; anchorLatch.countDown() }))
    t.start()
    // grow the file only once the tail has ANCHORED (an unsynchronized
    // sleep could let the append land before the EOF anchor)
    assert(anchorLatch.await(10, java.util.concurrent.TimeUnit.SECONDS))
    assert(anchorPos == 18L, s"EOF anchor at $anchorPos, not 18")
    Files.write(f, "live-1\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    Thread.sleep(150)
    Files.write(f, "live-2\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val deadline = System.currentTimeMillis() + 10000
    while (buf.size() < 14 && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    stopNow = true
    t.join(5000)
    assert(!t.isAlive)
    assert(buf.toString("UTF-8") == "live-1\nlive-2\n",
      s"got '${buf.toString("UTF-8")}'")
    assert(copied == 14L)
  }

  test("tail fromEnd=false replays the whole file first — and binary " +
      "bytes pass through undecoded (raw stream_bytes, tail.rs:21-23)") {
    val f = Files.createTempFile("sstail2", ".bin")
    val bytes = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    Files.write(f, bytes)
    val buf = new java.io.ByteArrayOutputStream()
    SsTail.tail(f.toString, buf, fromEnd = false, pollMs = 5L,
      stop = () => true)
    assert(buf.toByteArray.toSeq == bytes.toSeq)
  }

  test("tail survives truncation: re-anchors at the new start instead " +
      "of stalling past EOF forever (tail -f's 'file truncated' law)") {
    val f = Files.createTempFile("sstail3", ".log")
    Files.write(f, "aaaa\n".getBytes("UTF-8"))
    val buf = new java.io.ByteArrayOutputStream()
    @volatile var stopNow = false
    val latch = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() =>
      SsTail.tail(f.toString, buf, fromEnd = false, pollMs = 10L,
        stop = () => stopNow, anchored = _ => latch.countDown()))
    t.start()
    assert(latch.await(10, java.util.concurrent.TimeUnit.SECONDS))
    val deadline = System.currentTimeMillis() + 10000
    while (buf.size() < 5 && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    // truncate-and-rewrite with SHORTER content: pos (5) > len (3)
    Files.write(f, "bb\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    while (buf.size() < 8 && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    stopNow = true
    t.join(5000)
    assert(!t.isAlive)
    assert(buf.toString("UTF-8") == "aaaa\nbb\n",
      s"got '${buf.toString("UTF-8")}'")
  }

  test("sink writes the clock stream into a .ss container: key 'clock', " +
      "shard 0, seq = tick, payload tick-N (sink.rs:40-46); bounded runs " +
      "flush WITHOUT EOS so the container stays appendable") {
    val f = Files.createTempFile("sssink", ".ss")
    val n = SsSink.run(f.toString, intervalMs = 1L, ticks = 5L)
    assert(n == 5L)
    val frames = SsReader.open(f.toString).iterator.map(_.message).toVector
    assert(frames.size == 5)
    frames.zipWithIndex.foreach { case (m, i) =>
      assert(m.stream_key == "clock" && m.shard_id == 0L &&
        m.sequence == i.toLong &&
        new String(m.payload, "UTF-8") == s"tick-$i")
    }
    // no EOS frame → SsWriter.append resumes it and the clock continues
    val w = SsWriter.append(f.toString)
    try w.write(SeaMessage("clock", 0L, 5L,
      new java.sql.Timestamp(System.currentTimeMillis()),
      "tick-5".getBytes("UTF-8")))
    finally w.close()
    val seqs = SsReader.open(f.toString).iterator
      .map(_.message.sequence).toVector
    assert(seqs == (0L to 5L).toVector)
  }

  test("sink refuses to grow past the file size limit " +
      "(DEFAULT_FILE_SIZE_LIMIT seam, sink.rs:33-37)") {
    val f = Files.createTempFile("sssink2", ".ss")
    val e = intercept[IllegalStateException](
      SsSink.run(f.toString, intervalMs = 0L, ticks = 10000L,
        sizeLimit = 4096L))
    assert(e.getMessage.contains("size limit"), e.getMessage)
  }

  test("stdin-to-file writes raw lines, overwrites the target, stops at " +
      "EOF or the reference's literal 10-line demo bound " +
      "(stdin-to-file.rs:27-35)") {
    val f = Files.createTempFile("stdin2file", ".log")
    Files.write(f, "stale content to be overwritten\n".getBytes("UTF-8"))
    // EOF before the bound: 3 lines in, 3 lines out, old content gone
    val in3 = new java.io.ByteArrayInputStream("a\nb\nc\n".getBytes("UTF-8"))
    assert(SsStdinToFile.run(f.toString, in3) == 3)
    assert(new String(Files.readAllBytes(f), "UTF-8") == "a\nb\nc\n")
    // 12 lines in: exactly the first 10 land
    val in12 = new java.io.ByteArrayInputStream(
      (1 to 12).map(i => s"l$i").mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(SsStdinToFile.run(f.toString, in12) == 10)
    assert(new String(Files.readAllBytes(f), "UTF-8") ==
      (1 to 10).map(i => s"l$i").mkString("", "\n", "\n"))
  }
}
