package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** The decode must recover exactly what the encoder wrote — real codecs
  * (JDK PNG via javax.imageio, RIFF/WAVE header parse), not byte-length
  * arithmetic.
  */
class MultimodalSpec extends AnyFunSuite {
  import Multimodal._

  test("png roundtrip recovers true dimensions") {
    val bytes = Codecs.encodePng(width = 33, height = 21, seed = 7L)
    // PNG magic, so the sniffer routes correctly
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P')
    val m = Codecs.decode(42L, bytes)
    assert(m.kind == "png" && m.width == 33 && m.height == 21 &&
      m.channels == 3 && m.frames == 1)
  }

  test("wav roundtrip recovers channels, rate and frame count") {
    val bytes = Codecs.encodeWav(channels = 2, sampleRate = 16000, frames = 123)
    val m = Codecs.decode(43L, bytes)
    assert(m.kind == "wav" && m.channels == 2 && m.sample_rate == 16000 &&
      m.frames == 123 && m.width == 0)
  }

  test("wav parser skips unknown chunks before data") {
    val base = Codecs.encodeWav(1, 8000, 10)
    // splice a LIST chunk between fmt and data
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      .array()
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    val m = Codecs.decodeWav(44L, spliced)
    assert(m.frames == 10 && m.channels == 1)
  }

  test("synthesize is deterministic and sniffable") {
    assert(Multimodal.synthesize(10L).sameElements(Multimodal.synthesize(10L)))
    assert(Codecs.decode(10L, Multimodal.synthesize(10L)).kind == "png")
    assert(Codecs.decode(11L, Multimodal.synthesize(11L)).kind == "wav")
  }

  test("garbage bytes fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      Codecs.decode(1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
  }

  test("aHash: planted near-dup variants are close, strangers are far") {
    // group of 4 around base 80 (even ids 80,82,84,86 share the texture)
    val hashes = Seq(80L, 82L, 84L, 86L).map(id =>
      Multimodal.aHashOf(id, Multimodal.synthesizeNearDupPng(id)))
    for (a <- hashes; b <- hashes)
      assert(java.lang.Long.bitCount(a ^ b) <= 16,
        s"within-group hamming ${java.lang.Long.bitCount(a ^ b)} > 16")
    // a different base should disagree on far more bits than the threshold
    val stranger = Multimodal.aHashOf(200L, Multimodal.synthesizeNearDupPng(200L))
    assert(java.lang.Long.bitCount(hashes.head ^ stranger) > 16)
    // deterministic across re-synthesis (content-stable, retry-safe)
    assert(Multimodal.aHashOf(82L, Multimodal.synthesizeNearDupPng(82L)) ==
      hashes(1))
  }

  test("eHash: planted near-dup audio variants are close, strangers are far") {
    // group of 4 around base 81 (odd ids 81,83,85,87 share the waveform)
    val hashes = Seq(81L, 83L, 85L, 87L).map(id =>
      Multimodal.eHashOf(id, Multimodal.synthesizeNearDupWav(id)))
    for (a <- hashes; b <- hashes)
      assert(java.lang.Long.bitCount(a ^ b) <= 16,
        s"within-group hamming ${java.lang.Long.bitCount(a ^ b)} > 16")
    // a different base disagrees on far more bits than the threshold
    val stranger = Multimodal.eHashOf(201L, Multimodal.synthesizeNearDupWav(201L))
    assert(java.lang.Long.bitCount(hashes.head ^ stranger) > 16)
    // deterministic across re-synthesis (content-stable, retry-safe)
    assert(Multimodal.eHashOf(83L, Multimodal.synthesizeNearDupWav(83L)) ==
      hashes(1))
  }

  test("vHash: planted near-dup clips are close, strangers are far") {
    // group of 4 around base 80 (ids 80..83 share the clip)
    val hashes = Seq(80L, 81L, 82L, 83L).map(id =>
      Multimodal.vHashOf(id, Multimodal.synthesizeNearDupVideo(id)))
    for (a <- hashes; b <- hashes)
      assert(java.lang.Long.bitCount(a ^ b) <= 16,
        s"within-group hamming ${java.lang.Long.bitCount(a ^ b)} > 16")
    val stranger = Multimodal.vHashOf(200L, Multimodal.synthesizeNearDupVideo(200L))
    assert(java.lang.Long.bitCount(hashes.head ^ stranger) > 16)
    // truncated container fails loudly, not with a wild read
    val bytes = Multimodal.synthesizeNearDupVideo(80L)
    assertThrows[IllegalArgumentException](
      Multimodal.vHashOf(80L, bytes.take(bytes.length / 2)))
  }
}
