package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files

import graft.core.SeaMessage
import graft.facade.KafkaOptions
import org.scalatest.funsuite.AnyFunSuite

class SsAdminSpec extends AnyFunSuite {

  private def writePart(dir: String, name: String, baseTs: Long, n: Int): Unit = {
    val w = new SsWriter(new FileOutputStream(s"$dir/$name"), name, 1024, baseTs)
    (0 until n).foreach { i =>
      w.write(SeaMessage("s", 0, i.toLong,
        new java.sql.Timestamp(baseTs + i), ("m" + i).getBytes))
    }
    w.close()
  }

  test("trimMinTimestamp drops only fully-old part files") {
    val dir = Files.createTempDirectory("trim").toString
    writePart(dir, "old.ss", 1000L, 50)      // ts 1000..1049
    writePart(dir, "new.ss", 100000L, 50)    // ts 100000..100049
    val deleted = SsAdmin.trimMinTimestamp(dir, 50000L)
    assert(deleted.map(p => new java.io.File(p).getName) == Seq("old.ss"))
    val left = graft.ss.spark.SsDataSource.listFiles(dir).map(_.getName)
    assert(left == Seq("new.ss"))
    // cutoff below everything deletes nothing
    assert(SsAdmin.trimMinTimestamp(dir, 1L).isEmpty)
  }

  test("trimMaxLen keeps the newest files covering the budget") {
    val dir = Files.createTempDirectory("trim").toString
    writePart(dir, "a.ss", 1000L, 30)
    writePart(dir, "b.ss", 2000L, 30)
    writePart(dir, "c.ss", 3000L, 30)
    val deleted = SsAdmin.trimMaxLen(dir, 50) // c(30) + b(30) >= 50 → drop a
    assert(deleted.map(p => new java.io.File(p).getName) == Seq("a.ss"))
    assert(graft.ss.spark.SsDataSource.listFiles(dir).map(_.getName).toSet ==
      Set("b.ss", "c.ss"))
  }

  test("kafka security option mapping") {
    val opts = KafkaOptions.securityOptions(
      KafkaOptions.SecurityProtocol.SaslSsl,
      Some(KafkaOptions.SaslOptions(
        KafkaOptions.SaslMechanism.ScramSha256, Some("u"), Some("p"))),
      custom = Map("session.timeout.ms" -> "9000", "kafka.fetch.min.bytes" -> "1"))
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "SCRAM-SHA-256")
    assert(opts("kafka.sasl.jaas.config").contains("""username="u""""))
    assert(opts("kafka.session.timeout.ms") == "9000")
    assert(opts("kafka.fetch.min.bytes") == "1")
  }
}
