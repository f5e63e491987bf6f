package graft.ss

/** CRC-16/CDMA2000 — poly 0xC867, init 0xFFFF, no reflection, no xorout.
  * Standard public CRC parameterization (see reveng catalogue); the reference
  * uses the same algorithm for `.ss` payload + running checksums
  * (sea-streamer-file/src/crc.rs, format.rs:470-504). Table is derived from
  * the polynomial at class-load.
  *
  * Golden values (format.rs:586-608): crc("123456789") == 0x4C06,
  * crc("hello, world") == 0x8028.
  */
object Crc16Cdma2000 {
  final val Init = 0xFFFF
  private final val Poly = 0xC867

  private val table: Array[Int] = Array.tabulate(256) { i =>
    var crc = i << 8
    var b = 0
    while (b < 8) {
      crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ Poly) & 0xFFFF
      else (crc << 1) & 0xFFFF
      b += 1
    }
    crc
  }

  def update(crc: Int, b: Byte): Int =
    (table(((crc >>> 8) ^ (b & 0xFF)) & 0xFF) ^ ((crc << 8) & 0xFFFF)) & 0xFFFF

  def update(crc: Int, bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = crc
    var i = from
    while (i < until) { c = update(c, bytes(i)); i += 1 }
    c
  }

  def apply(bytes: Array[Byte]): Int = update(Init, bytes, 0, bytes.length)
}

/** Running checksum over per-message checksums: each message's u16 CRC is fed
  * big-endian into a CRC of CRCs (format.rs:470-504). Golden: feeding bytes of
  * "123456789" then "abcd" yields 0x4C06 then 0xA106.
  */
final class RunningChecksum private (private var crc: Int) {
  def update(messageChecksum: Int): Unit = {
    crc = Crc16Cdma2000.update(crc, ((messageChecksum >>> 8) & 0xFF).toByte)
    crc = Crc16Cdma2000.update(crc, (messageChecksum & 0xFF).toByte)
  }
  def updateByte(b: Byte): Unit = crc = Crc16Cdma2000.update(crc, b)
  def value: Int = crc
}

object RunningChecksum {
  def apply(): RunningChecksum = new RunningChecksum(Crc16Cdma2000.Init)
  def resume(crc: Int): RunningChecksum = new RunningChecksum(crc)
}
