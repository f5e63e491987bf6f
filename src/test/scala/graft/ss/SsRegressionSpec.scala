package graft.ss

import java.nio.file.Files

import graft.TestSession
import graft.facade.KafkaOptions
import graft.ops.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions from the round-1 code-review pass. */
class SsRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(n: Int, base: Int) = (0 until n).map { i =>
    ("s", 0L, (base + i).toLong, new java.sql.Timestamp(1000L + base + i),
      s"p${base + i}".getBytes("UTF-8"))
  }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")

  test("append-mode writes from separate jobs never truncate earlier parts") {
    val dir = Files.createTempDirectory("appendsafe").toString
    env(50, 0).write.format("ss").mode("append").save(dir)
    env(50, 50).write.format("ss").mode("append").save(dir)
    val back = spark.read.format("ss").load(dir)
    assert(back.count() == 100)
    assert(back.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 100L))
  }

  test("in-flight and aborted writers leave no visible part") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ss.spark.{SsDataSource, SsDataWriter}
    val dir = Files.createTempDirectory("abortsafe").toFile
    val w = new SsDataWriter(new java.io.File(dir, "part-x-00000-1.ss"),
      new java.io.File(dir, "part-x-00000.ss"), 1024, Long.MaxValue)
    (0 until 20).foreach { i =>
      w.write(InternalRow(UTF8String.fromString("s"), 0L, i.toLong,
        1000000L + i, s"p$i".getBytes("UTF-8")))
    }
    // staged but uncommitted: readers must not see it
    assert(SsDataSource.listFiles(dir.toString).isEmpty,
      "uncommitted part visible to listFiles")
    w.abort()
    assert(dir.listFiles().isEmpty, "abort left files behind")
  }

  test("replayed epoch publish is idempotent (exactly-once sink)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ss.spark.{SsDataSource, SsDataWriter, SsWriteReconcile}
    val dir = Files.createTempDirectory("epochreplay").toFile

    // two attempts of the SAME epoch/partition (a restart replaying epoch 3):
    // different attempt names, one canonical destination
    def attempt(taskId: Long, payloadTag: String) = {
      val w = new SsDataWriter(
        new java.io.File(dir, f"part-qabc-e3-p0-t$taskId.ss"),
        new java.io.File(dir, "part-qabc-e3-p0.ss"),
        1024, Long.MaxValue)
      (0 until 10).foreach { i =>
        w.write(InternalRow(UTF8String.fromString("s"), 0L, i.toLong,
          1000000L + i, s"$payloadTag$i".getBytes("UTF-8")))
      }
      w.commit()
    }

    val m1 = attempt(1L, "first")
    SsWriteReconcile.publish(Array(m1))
    val afterFirst = SsDataSource.listFiles(dir.toString).map(_.getName)
    assert(afterFirst == Seq("part-qabc-e3-p0.ss"))

    val m2 = attempt(2L, "replay")
    SsWriteReconcile.publish(Array(m2))
    val afterReplay = SsDataSource.listFiles(dir.toString).map(_.getName)
    assert(afterReplay == Seq("part-qabc-e3-p0.ss"),
      s"replay duplicated parts: $afterReplay")
    // content is the FIRST attempt's (replay discarded), and nothing staged
    val back = spark.read.format("ss").load(dir.toString)
    assert(back.count() == 10)
    import org.apache.spark.sql.functions.{col => c}
    val payload = back.filter(c("sequence") === 0L)
      .select(c("payload").cast("string")).as[String].head()
    assert(payload == "first0")
    assert(!dir.listFiles().exists(_.getName.endsWith(".staged")),
      "replayed staged part not cleaned up")
  }

  test("a failed write job leaves no visible or staged parts") {
    val dir = Files.createTempDirectory("jobabort").toString
    val boom = udf { (seq: Long) =>
      if (seq == 199L) throw new RuntimeException("boom")
      Array[Byte](1)
    }
    val df = env(200, 0).repartition(8)
      .withColumn("payload", boom(col("sequence")))
    intercept[Exception] {
      df.write.format("ss").mode("append").save(dir)
    }
    // the hard contract: nothing visible to readers (a task killed after
    // the driver's sweep may leave an invisible .staged straggler)
    assert(graft.ss.spark.SsDataSource.listFiles(dir).isEmpty,
      s"failed job left visible parts: " +
        Option(new java.io.File(dir).listFiles()).fold("")(
          _.map(_.getName).mkString(",")))
  }

  test("writing to a path that is a regular file fails loudly") {
    val f = Files.createTempFile("notadir", ".ss").toFile
    val ex = intercept[Exception] {
      env(5, 0).repartition(1).write.format("ss").mode("append")
        .save(f.getPath)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => String.valueOf(t.getMessage).contains("directory")))
  }

  test("offset json roundtrips hostile paths") {
    import graft.ss.spark.SsOffset
    val nasty = Map(
      "/a,\"/b.ss" -> 1L,
      "/tab\t/x.ss" -> 2L,
      "/quote\"back\\slash/p.ss" -> 3L,
      "/comma,end,/p.ss" -> -4L)
    assert(SsOffset.fromJson(SsOffset(nasty).json()) == SsOffset(nasty))
  }

  test("trimMinTimestamp is sound when beacons lack full coverage") {
    // interval 1024 → numMarkers = 1, so no beacon ever has full coverage;
    // newest message is in the middle of the file (out-of-order tail)
    val dir = Files.createTempDirectory("trimsound").toString
    val w = new SsWriter(new java.io.FileOutputStream(s"$dir/odd.ss"),
      "odd.ss", 1024, 0L)
    (0 until 30).foreach { i =>
      val ts = if (i == 15) 999999L else 1000L + i // newest in the middle
      w.write(graft.core.SeaMessage("s", 0, i.toLong,
        new java.sql.Timestamp(ts), ("x" * 80 + i).getBytes))
    }
    w.close()
    // cutoff between the bulk (≈1030) and the mid-file max (999999):
    // the file must survive because one message is newer than the cutoff
    assert(SsAdmin.trimMinTimestamp(dir, 500000L).isEmpty)
    assert(graft.ss.spark.SsDataSource.listFiles(dir).nonEmpty)
  }

  test("saltedJoin rejects right/full outer joins") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "w")
    assertThrows[IllegalArgumentException](
      Salting.saltedJoin(a, b, "k", 4, "right"))
    assertThrows[IllegalArgumentException](
      Salting.saltedJoin(a, b, "k", 4, "full_outer"))
  }

  test("scram mechanisms get the scram login module") {
    val opts = KafkaOptions.securityOptions(
      KafkaOptions.SecurityProtocol.SaslSsl,
      Some(KafkaOptions.SaslOptions(
        KafkaOptions.SaslMechanism.ScramSha512, Some("u"), Some("p"))))
    assert(opts("kafka.sasl.jaas.config").contains("ScramLoginModule"))
    val plain = KafkaOptions.securityOptions(
      KafkaOptions.SecurityProtocol.SaslPlaintext,
      Some(KafkaOptions.SaslOptions(
        KafkaOptions.SaslMechanism.Plain, Some("u"), Some("p"))))
    assert(plain("kafka.sasl.jaas.config").contains("PlainLoginModule"))
  }

  test("file-size quota rotates part files, nothing lost") {
    val dir = Files.createTempDirectory("rotate").toString
    env(500, 0).repartition(1)
      .write.format("ss")
      .option("beaconInterval", "512")
      .option("fileSizeLimit", "4096") // tiny quota → many rotations
      .mode("append").save(dir)
    val parts = graft.ss.spark.SsDataSource.listFiles(dir)
    assert(parts.size > 3, s"expected rotations, got ${parts.map(_.getName)}")
    assert(parts.forall(_.length() <= 4096 + 2048),
      "each part stays near the quota")
    val back = spark.read.format("ss").load(dir)
    assert(back.count() == 500)
    assert(back.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 500L))
  }

  test("stdio formatLine survives pre-epoch timestamps") {
    val line = graft.ops.StdioParser.formatLine(
      new java.sql.Timestamp(-1L), "k", 0, "old")
    assert(line.startsWith("[1969-12-31T23:59:59.999"))
  }
}
