package graft

import org.apache.spark.sql.functions._

import graft.redis.{EmbeddedRedis, RedisCluster, RedisSource}

/** Per-master wall-division receipt for the cluster-sharded exactly-once
  * writer (VERDICT r15 ask #5; not part of the driver contract). r9's
  * four-scale row (BENCH_SF1) shows the sf10 wall at 59.3 s on TWO
  * masters vs r8's 172.9 s on one; this probe pins the claim directly:
  * the SAME fixed volume through [[RedisSource.writeExactlyOnceCluster]]
  * against 1, 2 and 4 embedded masters (equal slot splits), one epoch,
  * same envelope shape as r9 (16 stream keys × 4 shards). The apply
  * wall is each node's single mutation thread, so seconds should divide
  * ~by the master count until the Spark-side produce path floors it.
  * Usage: `runMain graft.ClusterScaleProbe [rows] [masters...]`.
  */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val fans = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 2, 4)
    val spark = GraftSession.get()
    val payload = ("lorem ipsum dolor sit amet " * 10).take(64)
    val env = spark.range(rows)
      .select(
        concat(lit("cs_"), (col("id") % 16).cast("string")).as("stream_key"),
        (col("id") % 4).as("shard_id"),
        col("id").as("sequence"),
        timestamp_millis(lit(1700000000000L) + col("id")).as("timestamp"),
        lit(payload.getBytes("UTF-8")).as("payload"))
      .localCheckpoint(true) // price the writer, not the range projection
    fans.foreach { n =>
      val nodes = Seq.fill(n)(new EmbeddedRedis)
      try {
        val per = RedisCluster.HashSlots / n
        val slots = nodes.zipWithIndex.map { case (srv, i) =>
          (i * per,
            if (i == n - 1) RedisCluster.HashSlots - 1 else (i + 1) * per - 1,
            srv.host, srv.port)
        }
        nodes.foreach(_.slots = slots)
        val seeds = nodes.map(srv => (srv.host, srv.port))
        val t0 = System.nanoTime()
        RedisSource.writeExactlyOnceCluster(env, seeds, s"csp$n", 0L)
        val dt = (System.nanoTime() - t0) / 1e9
        val landed = nodes.map(srv =>
          (0 until 16).map(k => (0L until 4L).map(sh => srv.entries(
            redis.RedisStreams.shardedKey(s"cs_$k", sh, sharded = true))
            .length.toLong).sum).sum).sum
        require(landed == rows, s"landed $landed of $rows")
        println(f"[clusterscale] masters=$n rows=$rows dt=$dt%.2f s " +
          f"(${rows / dt / 1000}%.0f k entries/s)")
      } finally nodes.foreach(_.close())
    }
    spark.stop()
  }
}
