package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

import KafkaWire.{Batch, KRecord}

/** Byte-level goldens against the PUBLISHED Kafka protocol spec — these pin
  * the wire layout itself (not just self-consistency), so the codec can't
  * drift into a private dialect the way a roundtrip-only test would allow.
  */
class KafkaWireSpec extends AnyFunSuite {

  test("CRC32C matches the public check value") {
    // the canonical CRC-32C (Castagnoli) check vector
    val crc = new java.util.zip.CRC32C
    crc.update("123456789".getBytes("US-ASCII"))
    assert(crc.getValue == 0xE3069283L)
  }

  test("zigzag varint goldens (protobuf/Kafka encoding)") {
    def enc(v: Int): Seq[Int] =
      new KafkaWire.Writer().varint(v).result().toSeq.map(_ & 0xff)
    assert(enc(0) == Seq(0x00))
    assert(enc(-1) == Seq(0x01))
    assert(enc(1) == Seq(0x02))
    assert(enc(-2) == Seq(0x03))
    assert(enc(63) == Seq(0x7e))
    assert(enc(64) == Seq(0x80, 0x01))
    assert(enc(300) == Seq(0xd8, 0x04))
    assert(enc(Int.MaxValue) == Seq(0xfe, 0xff, 0xff, 0xff, 0x0f))
    assert(enc(Int.MinValue) == Seq(0xff, 0xff, 0xff, 0xff, 0x0f))
    // decode inverts
    for (v <- Seq(0, -1, 1, -2, 63, 64, 300, Int.MaxValue, Int.MinValue))
      assert(new KafkaWire.Reader(
        new KafkaWire.Writer().varint(v).result()).varint() == v)
    for (v <- Seq(0L, -1L, Long.MaxValue, Long.MinValue, 1234567890123L))
      assert(new KafkaWire.Reader(
        new KafkaWire.Writer().varlong(v).result()).varlong() == v)
  }

  test("v2 batch layout: spec field offsets and big-endian encoding") {
    val b = KafkaWire.encodeBatch(Seq(
      KRecord(7L, 1700000000000L, null, Array[Byte](1, 2, 3))))
    // baseOffset INT64 big-endian at 0
    assert(java.nio.ByteBuffer.wrap(b, Batch.BaseOffset, 8).getLong == 7L)
    // batchLength at 8 covers everything after itself
    assert(java.nio.ByteBuffer.wrap(b, Batch.Length, 4).getInt == b.length - 12)
    // partitionLeaderEpoch -1 at 12, magic 2 at 16
    assert(java.nio.ByteBuffer.wrap(b, Batch.LeaderEpoch, 4).getInt == -1)
    assert(b(Batch.Magic) == 2)
    // CRC32C at 17 of [attributes, end)
    val crc = new java.util.zip.CRC32C
    crc.update(b, Batch.Attributes, b.length - Batch.Attributes)
    assert(java.nio.ByteBuffer.wrap(b, Batch.Crc, 4).getInt == crc.getValue.toInt)
    // attributes 0 (no compression), recordCount 1 at 57, overhead 61
    assert(java.nio.ByteBuffer.wrap(b, Batch.Attributes, 2).getShort == 0)
    assert(java.nio.ByteBuffer.wrap(b, 57, 4).getInt == 1)
    assert(Batch.Overhead == 61)
    // producerId -1, producerEpoch -1, baseSequence -1 (no idempotence)
    assert(java.nio.ByteBuffer.wrap(b, 43, 8).getLong == -1L)
    assert(java.nio.ByteBuffer.wrap(b, 51, 2).getShort == -1)
    assert(java.nio.ByteBuffer.wrap(b, 53, 4).getInt == -1)
  }

  test("batch roundtrip preserves offsets, timestamps, keys and values") {
    val recs = Seq(
      KRecord(100L, 1700000000000L, null, "alpha".getBytes),
      KRecord(101L, 1700000000250L, "k1".getBytes, "beta".getBytes),
      KRecord(103L, 1699999999000L, "k2".getBytes, Array.emptyByteArray))
    val got = KafkaWire.decodeBatches(KafkaWire.encodeBatch(recs))
    assert(got.map(_.offset) == Seq(100L, 101L, 103L))
    assert(got.map(_.tsMs) == recs.map(_.tsMs))
    assert(got(0).key == null && new String(got(1).key) == "k1")
    assert(new String(got(0).value) == "alpha" && got(2).value.isEmpty)
  }

  test("concatenated batches decode in sequence; truncated tail is dropped") {
    val b1 = KafkaWire.encodeBatch(Seq(KRecord(0L, 10L, null, "a".getBytes)))
    val b2 = KafkaWire.encodeBatch(Seq(KRecord(1L, 20L, null, "b".getBytes)))
    val both = b1 ++ b2
    assert(KafkaWire.decodeBatches(both).map(_.offset) == Seq(0L, 1L))
    // a fetch response may end mid-batch: the partial tail must be dropped
    val truncated = b1 ++ b2.dropRight(3)
    assert(KafkaWire.decodeBatches(truncated).map(_.offset) == Seq(0L))
  }

  test("CRC corruption fails loudly") {
    val b = KafkaWire.encodeBatch(Seq(KRecord(0L, 10L, null, "abc".getBytes)))
    b(b.length - 1) = (b(b.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](KafkaWire.decodeBatches(b))
  }

  test("request frame golden: size + header v1 layout") {
    val out = new java.io.ByteArrayOutputStream()
    KafkaWire.writeRequest(out, apiKey = 18, apiVersion = 0,
      correlationId = 0x01020304, clientId = "ab", body = Array[Byte](9))
    val f = out.toByteArray
    // size = header(2+2+4+2+2) + body(1) = 13
    assert(java.nio.ByteBuffer.wrap(f, 0, 4).getInt == 13)
    assert(java.nio.ByteBuffer.wrap(f, 4, 2).getShort == 18)    // api_key
    assert(java.nio.ByteBuffer.wrap(f, 6, 2).getShort == 0)     // api_version
    assert(java.nio.ByteBuffer.wrap(f, 8, 4).getInt == 0x01020304)
    assert(java.nio.ByteBuffer.wrap(f, 12, 2).getShort == 2)    // client_id len
    assert(new String(f, 14, 2) == "ab")
    assert(f(16) == 9 && f.length == 17)
    // and the broker-side reader inverts it
    val in = new java.io.ByteArrayInputStream(f)
    val Some((k, v, cid, client, body)) = KafkaWire.readRequest(in)
    assert(k == 18 && v == 0 && cid == 0x01020304 && client == "ab" &&
      body.toSeq == Seq(9: Byte))
  }

  test("null client id and null arrays encode as -1 sentinels") {
    val w = new KafkaWire.Writer
    w.nullableStr(null)
    assert(w.result().toSeq == Seq(0xff.toByte, 0xff.toByte))
    val r = new KafkaWire.Reader(Array(0xff.toByte, 0xff.toByte))
    assert(r.nullableStr() == null)
    val wb = new KafkaWire.Writer
    wb.nullableBytes(null)
    assert(wb.result().toSeq == Seq.fill(4)(0xff.toByte))
  }

  // ---- compression (attributes bits 0-2; the reference's
  //      compression.type producer option, producer.rs:85-86) ----

  test("gzip batch: codec bit set, plain 61-byte header, gzip magic, " +
    "CRC over the compressed bytes, decode inverts") {
    val recs = Seq(
      KRecord(40L, 1700000000000L, null, ("lorem " * 40).getBytes),
      KRecord(41L, 1700000000100L, "k".getBytes, ("ipsum " * 40).getBytes),
      KRecord(42L, 1700000000200L, null, null))
    val b = KafkaWire.encodeBatch(recs, KafkaWire.Codec.Gzip)
    // attributes = 1 (gzip), header layout unchanged: count 3 at 57
    assert(java.nio.ByteBuffer.wrap(b, Batch.Attributes, 2).getShort == 1)
    assert(KafkaWire.batchCodec(b) == KafkaWire.Codec.Gzip)
    assert(java.nio.ByteBuffer.wrap(b, 57, 4).getInt == 3)
    // the records region starts with the RFC 1952 gzip magic 1f 8b
    assert((b(Batch.Overhead) & 0xff) == 0x1f &&
      (b(Batch.Overhead + 1) & 0xff) == 0x8b)
    // CRC32C at 17 covers [attributes, end) OVER THE COMPRESSED BYTES
    val crc = new java.util.zip.CRC32C
    crc.update(b, Batch.Attributes, b.length - Batch.Attributes)
    assert(java.nio.ByteBuffer.wrap(b, Batch.Crc, 4).getInt == crc.getValue.toInt)
    val got = KafkaWire.decodeBatches(b)
    assert(got.map(_.offset) == Seq(40L, 41L, 42L))
    assert(got.map(_.tsMs) == recs.map(_.tsMs))
    assert(new String(got(0).value) == "lorem " * 40)
    assert(new String(got(1).key) == "k" && got(2).value == null)
    // and compressible payloads actually shrink on the wire
    assert(b.length < KafkaWire.encodeBatch(recs).length / 2)
  }

  test("plain and gzip batches interleave in one record set") {
    val p = KafkaWire.encodeBatch(Seq(KRecord(0L, 10L, null, "a".getBytes)))
    val g = KafkaWire.encodeBatch(
      Seq(KRecord(1L, 20L, null, "b".getBytes)), KafkaWire.Codec.Gzip)
    val got = KafkaWire.decodeBatches(p ++ g)
    assert(got.map(r => (r.offset, new String(r.value))) ==
      Seq((0L, "a"), (1L, "b")))
    assert(KafkaWire.batchCodec(p) == 0 && KafkaWire.batchCodec(p ++ g) == 0)
  }

  test("corruption inside the compressed region fails the batch CRC loudly") {
    val b = KafkaWire.encodeBatch(
      Seq(KRecord(0L, 10L, null, ("x" * 100).getBytes)), KafkaWire.Codec.Gzip)
    b(Batch.Overhead + 12) = (b(Batch.Overhead + 12) ^ 0x40).toByte
    assertThrows[KafkaWire.CorruptBatchException](KafkaWire.decodeBatches(b))
  }

  test("snappy/lz4/zstd batches: codec bits, library framing magic, " +
    "CRC over the compressed bytes, decode inverts, payloads shrink") {
    val recs = Seq(
      KRecord(40L, 1700000000000L, null, ("lorem " * 40).getBytes),
      KRecord(41L, 1700000000100L, "k".getBytes, ("ipsum " * 40).getBytes),
      KRecord(42L, 1700000000200L, null, null))
    val plainLen = KafkaWire.encodeBatch(recs).length
    // each codec's records region must open with ITS library's framing
    // magic — the interop pin: these are the byte signatures a real
    // broker's decoder dispatches on (xerial snappy header, LZ4 Frame
    // magic 0x184D2204 LE, zstd magic 0xFD2FB528 LE)
    val magics = Map(
      KafkaWire.Codec.Snappy -> Seq(0x82, 'S', 'N', 'A', 'P', 'P', 'Y'),
      KafkaWire.Codec.Lz4 -> Seq(0x04, 0x22, 0x4d, 0x18),
      KafkaWire.Codec.Zstd -> Seq(0x28, 0xb5, 0x2f, 0xfd))
    for ((codec, magic) <- magics) {
      val b = KafkaWire.encodeBatch(recs, codec)
      assert(java.nio.ByteBuffer.wrap(b, Batch.Attributes, 2)
        .getShort == codec, s"codec bits for $codec")
      assert(KafkaWire.batchCodec(b) == codec)
      assert(java.nio.ByteBuffer.wrap(b, 57, 4).getInt == 3)
      assert(magic.zipWithIndex.forall { case (m, i) =>
        (b(Batch.Overhead + i) & 0xff) == (m.toInt & 0xff) },
        s"framing magic for codec $codec")
      val crc = new java.util.zip.CRC32C
      crc.update(b, Batch.Attributes, b.length - Batch.Attributes)
      assert(java.nio.ByteBuffer.wrap(b, Batch.Crc, 4).getInt ==
        crc.getValue.toInt)
      val got = KafkaWire.decodeBatches(b)
      assert(got.map(_.offset) == Seq(40L, 41L, 42L))
      assert(new String(got(0).value) == "lorem " * 40)
      assert(new String(got(1).key) == "k" && got(2).value == null)
      assert(b.length < plainLen, s"codec $codec did not shrink")
    }
    // all five batches interleave in one record set
    val set = (KafkaWire.Codec.None to KafkaWire.Codec.Zstd).map { c =>
      KafkaWire.encodeBatch(
        Seq(KRecord(c.toLong, 10L + c, null, s"p$c".getBytes)), c)
    }.reduce(_ ++ _)
    assert(KafkaWire.decodeBatches(set)
      .map(r => (r.offset, new String(r.value))) ==
      (0 to 4).map(c => (c.toLong, s"p$c")))
  }

  test("reserved codec bits and unknown names refused loudly") {
    assert(KafkaWire.Codec.of("none") == 0 && KafkaWire.Codec.of("GZIP") == 1)
    assert(KafkaWire.Codec.of("snappy") == 2 &&
      KafkaWire.Codec.of("lz4") == 3 && KafkaWire.Codec.of("ZSTD") == 4)
    assertThrows[IllegalArgumentException](KafkaWire.Codec.of("lzma"))
    // a batch whose attributes claim reserved codec 5 must be refused at
    // decode, not misread: rewrite attributes and re-stamp the CRC so the
    // refusal is the codec check itself
    val b = KafkaWire.encodeBatch(Seq(KRecord(0L, 10L, null, "a".getBytes)))
    b(Batch.Attributes + 1) = 5
    val crc = new java.util.zip.CRC32C
    crc.update(b, Batch.Attributes, b.length - Batch.Attributes)
    java.nio.ByteBuffer.wrap(b, Batch.Crc, 4).putInt(crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](KafkaWire.decodeBatches(b))
    assert(e.getMessage.contains("codec 5"))
  }
}
