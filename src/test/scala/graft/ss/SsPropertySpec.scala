package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files

import graft.core.SeaMessage
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: any message batch × any beacon interval roundtrips
  * byte-exactly, and beacon-split reads reconstruct the full scan.
  * (Plain ScalaCheck generators driven by fixed seeds — the scalatestplus
  * bridge isn't on the classpath.)
  */
class SsPropertySpec extends AnyFunSuite {

  private val keyGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 20)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('.', '_', '-')))
  } yield cs.mkString

  private val msgGen: Gen[SeaMessage] = for {
    key <- keyGen
    shard <- Gen.chooseNum(0L, 8L)
    seq <- Gen.chooseNum(0L, 1000000L)
    ts <- Gen.chooseNum(0L, 4000000000000L)
    payload <- Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Arbitrary.arbitrary[Byte]))
  } yield SeaMessage(key, shard, seq, new java.sql.Timestamp(ts),
    payload.toArray)

  private val batchGen: Gen[(List[SeaMessage], Int)] = for {
    msgs <- Gen.nonEmptyListOf(msgGen)
    interval <- Gen.chooseNum(128, 4096)
  } yield (msgs, interval)

  private def cases(n: Int): Seq[(List[SeaMessage], Int)] =
    (1 to n).flatMap { i =>
      batchGen.apply(Gen.Parameters.default, Seed(i.toLong * 7919))
    }

  test("write/read roundtrip for arbitrary batches and intervals") {
    cases(25).foreach { case (msgs, interval) =>
      val dir = Files.createTempDirectory("prop").toFile
      val path = s"$dir/p.ss"
      val w = new SsWriter(new FileOutputStream(path), "p.ss", interval, 0L)
      msgs.foreach(w.write)
      w.close()

      val got = SsReader.open(path).iterator.toVector
      assert(got.size == msgs.size)
      got.zip(msgs).foreach { case (rec, m) =>
        assert(rec.message.stream_key == m.stream_key)
        assert(rec.message.shard_id == m.shard_id)
        assert(rec.message.sequence == m.sequence)
        assert(rec.message.timestamp.getTime == m.timestamp.getTime)
        assert(java.util.Arrays.equals(rec.message.payload, m.payload))
      }

      // beacon-split reads tile the file exactly: frames from consecutive
      // [a, b) beacon windows reproduce the full scan
      val size = new java.io.File(path).length()
      val nBeacons = (size - 1) / interval
      if (nBeacons >= 1) {
        val bounds = (0L to nBeacons) :+ (nBeacons + 1)
        val pieces = bounds.sliding(2).flatMap { case Seq(a, b) =>
          val r = if (a == 0) SsReader.open(path) else SsReader.openAt(path, a)
          val limit = if (b > nBeacons) Long.MaxValue else b * interval
          val out = r.iterator.takeWhile(_.startOffset < limit).toVector
          r.close()
          out
        }.toVector
        assert(pieces.map(_.message.sequence) == got.map(_.message.sequence))
      }
    }
  }
}
