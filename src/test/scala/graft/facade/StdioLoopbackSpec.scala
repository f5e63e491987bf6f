package graft.facade

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.core.SeaStreamErr
import graft.facade.SeaStreamer.ConsumerOptions

/** Port of the reference's stdio loopback suite
  * (sea-streamer-stdio/tests/loopback.rs; option surface
  * streamer.rs:14,95-107): producers on a loopback connection dispatch to
  * the SAME process's consumers; default connections do not loop back.
  */
class StdioLoopbackSpec extends AnyFunSuite {

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(key: String, n: Int) = (0 until n).map { i =>
    (key, 0L, i.toLong, new java.sql.Timestamp(1000L + i),
      s"$i".getBytes("UTF-8"))
  }.toDF("stream_key", "shard_id", "sequence", "timestamp", "payload")

  private def silenced(f: => Unit): Unit = {
    // producer lines still go to stdout (the stdio contract); keep the
    // test log clean
    val sink = new java.io.PrintStream(
      java.io.OutputStream.nullOutputStream())
    Console.withOut(sink)(f)
  }

  test("default connection does NOT loop back: sends print but this " +
      "process's consumers never see them (loopback.rs:22-29)") {
    val f = Files.createTempFile("loopback0", ".log").toFile
    val conn = SeaStreamer.connect(s"stdio://${f.getPath}", spark)
    silenced(conn.createProducer("hello").send(env("hello", 5)))
    assert(conn.createConsumer(Seq("hello"),
      ConsumerOptions(live = false)).count() == 0)
  }

  test("loopback connection: a producer's sends come back to the same " +
      "connection's consumer, sequences exact (loopback.rs:32-48)") {
    val f = Files.createTempFile("loopback1", ".log").toFile
    val conn = SeaStreamer.connect(s"stdio://${f.getPath}", spark,
      Map("stdio.loopback" -> "true"))
    silenced(conn.createProducer("hello").send(env("hello", 5)))
    val got = conn.createConsumer(Seq("hello"),
      ConsumerOptions(live = false))
    assert(got.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 5L))
    assert(got.select($"payload".cast("string")).as[String]
      .collect().map(_.toInt).sorted.toSeq == (0 until 5))
  }

  test("group dispatch over loopbacked lines keeps the deterministic " +
      "round-robin split (group.rs:31-55 over a loopback bus)") {
    val f = Files.createTempFile("loopback2", ".log").toFile
    val conn = SeaStreamer.connect(s"stdio://${f.getPath}", spark,
      Map("stdio.loopback" -> "true"))
    silenced(conn.createProducer("hello").send(env("hello", 10)))
    val Seq(m0, m1) = conn.createGroupConsumers(Seq("hello"), "g",
      members = 2, ConsumerOptions(live = false))
    assert(m0.select("sequence").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 4L, 6L, 8L))
    assert(m1.select("sequence").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("option surface is typed: stray keys, non-boolean values, and " +
      "loopback on a file-less node all refuse") {
    intercept[SeaStreamErr.Unsupported](
      SeaStreamer.connect("stdio://-", spark, Map("stdio.lopback" -> "true")))
    intercept[SeaStreamErr.Unsupported](
      SeaStreamer.connect("stdio://-", spark, Map("stdio.loopback" -> "yes")))
    val dash = SeaStreamer.connect("stdio://-", spark,
      Map("stdio.loopback" -> "true"))
    val e = intercept[SeaStreamErr.Unsupported](dash.createProducer("hello"))
    assert(e.getMessage.contains("line-file node"), e.getMessage)
  }
}
