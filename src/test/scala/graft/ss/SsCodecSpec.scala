package graft.ss

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.core.SeaMessage
import org.scalatest.funsuite.AnyFunSuite

class SsCodecSpec extends AnyFunSuite {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private def msg(key: String, shard: Long, seq: Long, tsMs: Long, payload: String) =
    SeaMessage(key, shard, seq, ts(tsMs), payload.getBytes("UTF-8"))

  // Goldens from sea-streamer-file/src/crc.rs tests + format.rs:586-608
  test("crc16/cdma2000 goldens") {
    assert(Crc16Cdma2000("123456789".getBytes("UTF-8")) == 0x4C06)
    assert(Crc16Cdma2000("hello, world".getBytes("UTF-8")) == 0x8028)
  }

  test("running checksum goldens") {
    val rc = RunningChecksum()
    "123456789".getBytes("UTF-8").foreach(rc.updateByte)
    assert(rc.value == 0x4C06)
    "abcd".getBytes("UTF-8").foreach(rc.updateByte)
    assert(rc.value == 0xA106)
    assert(rc.value == Crc16Cdma2000("123456789abcd".getBytes("UTF-8")))
  }

  test("num markers (format.rs:610-615)") {
    assert(SsFormat.numMarkers(640) == 1)
    assert(SsFormat.numMarkers(1024) == 1)
  }

  test("header roundtrip is 128 bytes") {
    val h = SsFormat.SsHeader("hello", 1234567890123L, 12345)
    val bytes = SsFormat.encodeHeader(h)
    assert(bytes.length == SsFormat.HeaderSize)
    assert(bytes(0) == 0x53 && bytes(1) == 0x73 && bytes(2) == 0x01)
    assert(bytes.last == 0x0D)
    assert(SsFormat.decodeHeader(bytes) == h)
  }

  test("message frame roundtrip with checksum") {
    val m = msg("my-stream.1", 3, 42, 1700000000123L, "123456789")
    val (frame, crc) = SsFormat.encodeMessage(m)
    assert(crc == 0x4C06)
    assert(frame.last == 0x0D)
    var i = 0
    val r = new SsFormat.ByteReader {
      def readByte(): Int = { val b = frame(i) & 0xFF; i += 1; b }
    }
    val (back, storedCrc) = SsFormat.decodeMessage(r)
    assert(back.stream_key == "my-stream.1" && back.shard_id == 3 &&
      back.sequence == 42 && back.timestamp.getTime == 1700000000123L)
    assert(new String(back.payload, "UTF-8") == "123456789")
    assert(storedCrc == 0x4C06)
    assert(i == frame.length)
  }

  test("writer/reader roundtrip with splicing across small beacons") {
    val dir = Files.createTempDirectory("ss").toFile
    val path = s"$dir/t.ss"
    // 256-byte interval with ~90-byte frames → beacons splice many frames
    val w = new SsWriter(new FileOutputStream(path), "t.ss", 256, 1700000000000L)
    val sent = (0 until 100).map { i =>
      val m = msg(if (i % 2 == 0) "alpha" else "beta", i % 3, i.toLong,
        1700000000000L + i, "x" * 50 + i.toString)
      w.write(m); m
    }
    w.endOfStream()
    w.close()

    val r = SsReader.open(path)
    val got = r.iterator.toVector
    assert(r.isEos)
    assert(got.size == 100)
    got.zip(sent).foreach { case (rec, m) =>
      assert(rec.message.stream_key == m.stream_key)
      assert(rec.message.sequence == m.sequence)
      assert(rec.message.shard_id == m.shard_id)
      assert(new String(rec.message.payload, "UTF-8") == new String(m.payload, "UTF-8"))
    }
    // beacons were actually interleaved
    assert(r.lastBeacon.isDefined)
    r.close()
  }

  test("split read at nth beacon sees exactly the tail messages") {
    val dir = Files.createTempDirectory("ss").toFile
    val path = s"$dir/s.ss"
    val interval = 512
    val w = new SsWriter(new FileOutputStream(path), "s.ss", interval, 0L)
    (0 until 200).foreach { i =>
      w.write(msg("s", 0, i.toLong, 1000L + i, f"payload-$i%05d-${"y" * 40}"))
    }
    w.close()

    // full scan
    val all = SsReader.open(path).iterator.map(_.message.sequence).toVector
    assert(all == (0L until 200L).toVector)

    // split scan: nth=2 must yield exactly the messages whose frame starts
    // at/after beacon 2 (no duplicates, no misses vs a full scan cut there)
    val r2 = SsReader.openAt(path, 2)
    val tail = r2.iterator.toVector
    val expected = SsReader.open(path).iterator.toVector
      .filter(_.startOffset >= 2L * interval)
    assert(tail.map(_.message.sequence) == expected.map(_.message.sequence))
    r2.close()
  }

  test("beacon markers carry max seq/ts per stream with running checksum") {
    val out = new ByteArrayOutputStream()
    // numMarkers(1024) == 1 — exactly one marker per beacon fits
    val w = new SsWriter(out, "b.ss", 1024, 0L)
    (0 until 50).foreach { i =>
      w.write(msg("only", 7, i.toLong, 500L + i, s"m$i-${"z" * 30}"))
    }
    w.close()
    val bytes = out.toByteArray
    // walk: header, then parse beacon at offset 1024
    var i = 1024
    val r = new SsFormat.ByteReader {
      def readByte(): Int = { val b = bytes(i) & 0xFF; i += 1; b }
    }
    val beacon = SsFormat.decodeBeacon(r)
    assert(beacon.items.size == 1)
    val it = beacon.items.head
    assert(it.streamKey == "only" && it.shardId == 7)
    assert(it.maxSeqNo >= 0 && it.maxTimestampMillis >= 500L)
  }

  test("checksum verification catches corruption") {
    val dir = Files.createTempDirectory("ss").toFile
    val path = s"$dir/c.ss"
    val w = new SsWriter(new FileOutputStream(path), "c.ss", 1024, 0L)
    w.write(msg("k", 0, 1, 1L, "hello, world"))
    w.close()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // flip a payload byte (payload starts after header(128)+frame header)
    val idx = bytes.length - 5 // inside payload/crc region
    bytes(idx) = (bytes(idx) ^ 0x01).toByte
    Files.write(java.nio.file.Paths.get(path), bytes)
    val r = SsReader.open(path)
    assertThrows[SsFormat.ChecksumException](r.iterator.toVector)
  }
}
