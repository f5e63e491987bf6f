package graft

import org.apache.spark.sql.functions._

/** Layout receipt for the redis file shipper (round 16; not part of the
  * driver contract): the SAME 1M × 256 B frame volume shipped via
  * [[ss.SsEosShip.shipRedisAll]] from two `.ss` directory layouts —
  * INTERLEAVED (every part file carries every (stream, shard), the
  * default unpartitioned `format("ss")` write: every sibling commit
  * conflicts, the adaptive gate flips the destination to serialized
  * commits) vs KEY-DISJOINT (the envelope repartitioned by
  * (stream_key, shard_id) before the write: sibling key sets never
  * overlap, the optimistic ungated path keeps queue/parse parallel
  * across connections). The delta prices exactly what the round-16
  * correctness fix costs on the adversarial layout and that a
  * key-local layout — one `repartition` at dump time — gets it back.
  * Usage: `runMain graft.ShipLayoutProbe [rows]`.
  */
object ShipLayoutProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.get()
    val payload = ("lorem ipsum dolor sit amet " * 10).take(256)
    val env = spark.range(rows)
      .select(
        concat(lit("sl_"), (col("id") % 5).cast("string")).as("stream_key"),
        (col("id") % 4).as("shard_id"),
        col("id").as("sequence"),
        timestamp_millis(lit(1700000000000L) + col("id")).as("timestamp"),
        lit(payload.getBytes("UTF-8")).as("payload"))
    def run(tag: String, dir: String): Unit = {
      val srv = new redis.EmbeddedRedis
      try {
        val paths = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".ss")).map(_.getAbsolutePath).toSeq
        val t0 = System.nanoTime()
        val n = ss.SsEosShip.shipRedisAll(spark, paths, identity,
          srv.host, srv.port, s"slp_$tag")
        val dt = (System.nanoTime() - t0) / 1e9
        require(n == rows, s"$tag shipped $n of $rows")
        println(f"[shiplayout] $tag files=${paths.size} rows=$rows " +
          f"dt=$dt%.2f s (${rows / dt / 1000}%.0f k frames/s)")
      } finally srv.close()
    }
    val inter = "/tmp/graft/shiplayout_inter"
    val disj = "/tmp/graft/shiplayout_disj"
    env.write.format("ss").mode("overwrite").save(inter)
    env.repartition(col("stream_key"), col("shard_id"))
      .write.format("ss").mode("overwrite").save(disj)
    // disjoint first, then interleaved: the contended flag is sticky per
    // (host, port) within a JVM, and each run uses a fresh server/port
    run("disjoint", disj)
    run("interleaved", inter)
    run("disjoint2", disj)
    spark.stop()
  }
}
