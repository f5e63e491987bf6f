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

  test("complex.rs behavior (sea-streamer-stdio/src/bin/complex.rs:31-75): " +
      "two LoadBalanced members of one group split the input and relay " +
      "their halves tagged with their member ordinal; after the drop, a " +
      "REGROUPED single member receives the whole stream and relays it " +
      "tagged 0") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val f = Files.createTempFile("loopback-complex", ".log").toFile
    val conn = SeaStreamer.connect(s"stdio://${f.getPath}", spark,
      Map("stdio.loopback" -> "true"))
    silenced(conn.createProducer("input").send(env("input", 10)))
    // phase 1 (complex.rs:38-58): consumer1/consumer2 in group "abc"
    // alternate deliveries; each inserts its relay ordinal into the
    // payload and produces to the output stream
    val producer = conn.createProducer("output")
    val members = conn.createGroupConsumers(Seq("input"), "abc",
      members = 2, ConsumerOptions(live = false))
    members.zipWithIndex.foreach { case (m, i) =>
      silenced(producer.send(m.withColumn("payload",
        concat(lit(s"""{"relay":${i + 1},"v":"""),
          col("payload").cast("string"), lit("}")).cast("binary"))))
    }
    val phase1 = conn.createConsumer(Seq("output"),
      ConsumerOptions(live = false))
    val tagged = phase1.select(col("payload").cast("string"))
      .as[String].collect().toSeq
    assert(tagged.filter(_.startsWith("""{"relay":1"""))
      .map(_.split(",\"v\":")(1).stripSuffix("}").toInt).sorted ==
      Seq(0, 2, 4, 6, 8), tagged)
    assert(tagged.filter(_.startsWith("""{"relay":2"""))
      .map(_.split(",\"v\":")(1).stripSuffix("}").toInt).sorted ==
      Seq(1, 3, 5, 7, 9), tagged)
    // phase 2 (complex.rs:61-75): the consumers drop (fresh connection),
    // ONE member re-joins the same group — the regroup assigns it the
    // WHOLE stream, and the new connection needs its own new producer
    val conn2 = SeaStreamer.connect(s"stdio://${f.getPath}", spark,
      Map("stdio.loopback" -> "true"))
    val producer2 = conn2.createProducer("output")
    val regrouped = conn2.createGroupConsumers(Seq("input"), "abc",
      members = 1, ConsumerOptions(live = false)).head
    assert(regrouped.select("sequence").as[Long].collect().sorted.toSeq ==
      (0L until 10L), "regrouped single member must own every message")
    silenced(producer2.send(regrouped.withColumn("payload",
      concat(lit("""{"relay":0,"v":"""),
        col("payload").cast("string"), lit("}")).cast("binary"))))
    val all = conn2.createConsumer(Seq("output"),
      ConsumerOptions(live = false))
      .select(col("payload").cast("string")).as[String].collect().toSeq
    assert(all.count(_.startsWith("""{"relay":0""")) == 10, all)
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
