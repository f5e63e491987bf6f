package graft.ss

import java.io.FileOutputStream
import java.nio.file.Files
import java.util

import graft.TestSession
import graft.core.SeaMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

class SsPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** 2048-interval file, monotonically increasing ts/seq, ~40 beacons. */
  private def mkFile(): String = {
    val dir = Files.createTempDirectory("prune").toFile
    val path = s"$dir/p.ss"
    val w = new SsWriter(new FileOutputStream(path), "p.ss", 2048, 0L)
    (0 until 2000).foreach { i =>
      w.write(SeaMessage("s", 0, i.toLong,
        new java.sql.Timestamp(1000000L + i * 1000L), ("x" * 40 + i).getBytes))
    }
    w.close()
    path
  }

  private def partitions(path: String, filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
    val builder = new graft.ss.spark.SsScanBuilder(
      path, new CaseInsensitiveStringMap(new util.HashMap[String, String]()))
    builder.pushFilters(filters)
    builder.build().toBatch.planInputPartitions().length
  }

  test("seek-shaped filters prune beacon splits") {
    val path = mkFile()
    // shrink split size so there are many splits to prune
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8 * 2048).toString)
    try {
      val all = partitions(path, Array.empty)
      assert(all > 5, s"expected many splits, got $all")
      // threshold above every message: everything but the unbounded tail
      // split (and splits whose end beacon is truncated) must go
      val lastTs = new java.sql.Timestamp(1000000L + 1999 * 1000L)
      val pruned = partitions(path, Array(GreaterThan("timestamp", lastTs)))
      assert(pruned < all / 2, s"pruned=$pruned all=$all")
      // mid threshold prunes roughly half
      val midTs = new java.sql.Timestamp(1000000L + 1000 * 1000L)
      val mid = partitions(path, Array(GreaterThan("timestamp", midTs)))
      assert(mid < all && mid > pruned)
      // sequence rewind law prunes too
      val seqPruned = partitions(path, Array(GreaterThanOrEqual("sequence", 1990L)))
      assert(seqPruned < all / 2)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("pruned scans still return exact results end-to-end") {
    val path = mkFile()
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8 * 2048).toString)
    try {
      val df = spark.read.format("ss").load(path)
        .filter($"timestamp" > new java.sql.Timestamp(1000000L + 1949 * 1000L))
      val seqs = df.select("sequence").as[Long].collect().sorted.toSeq
      assert(seqs == (1950L until 2000L))
      val df2 = spark.read.format("ss").load(path)
        .filter($"sequence" >= 1990L)
      assert(df2.count() == 10)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }
}
