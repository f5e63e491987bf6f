package graft

import org.apache.spark.sql.functions._

/** Isolated receipt for the `xp_redis_produce_100k` drift (VERDICT r15
  * ask #1; not part of the driver contract): the EXACT Bench workload —
  * 100k × 256 B through [[redis.RedisSource.write]] (pipeline 500) into
  * a fresh [[redis.EmbeddedRedis]], then a bounded read back — run N
  * times in ONE warm JVM so the number isolates the wire+server path
  * from the full suite's cache/GC neighborhood AND from cold-JVM
  * codegen (an isolated cold run reads 1.8 s where the warm path reads
  * well under 1 s — most of the committed-artifact spread is
  * neighborhood, not code). Round 1 is warmup; report the median of
  * the rest. Usage: `runMain graft.RedisXpProbe [rounds]`.
  */
object RedisXpProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.get()
    val payload = ("lorem ipsum dolor sit amet " * 10).take(256)
    val results = (1 to rounds).map { round =>
      val srv = new redis.EmbeddedRedis
      try {
        val env = spark.range(100000)
          .select(
            lit("bench").as("stream_key"),
            (col("id") % 4).as("shard_id"),
            col("id").as("sequence"),
            timestamp_millis(lit(1700000000000L) + col("id")).as("timestamp"),
            lit(payload.getBytes("UTF-8")).as("payload"))
        val t0 = System.nanoTime()
        redis.RedisSource.write(env, srv.host, srv.port, pipelineSize = 500)
        val p = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = redis.RedisSource.boundedRead(spark, srv.host, srv.port,
          (0L until 4L).map(sh => ("bench", sh))).count()
        require(n == 100000L, s"expected 100k messages, got $n")
        val c = (System.nanoTime() - t1) / 1e9
        println(f"[redisxp] round=$round produce=$p%.3f s " +
          f"(${100 / p}%.0f k/s) consume=$c%.3f s (${100 / c}%.0f k/s)" +
          (if (round == 1) " [warmup]" else ""))
        (p, c)
      } finally srv.close()
    }
    val warm = results.drop(1)
    if (warm.nonEmpty) {
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      println(f"[redisxp] MEDIAN produce=${med(warm.map(_._1))}%.3f s " +
        f"(${100 / med(warm.map(_._1))}%.0f k/s) " +
        f"consume=${med(warm.map(_._2))}%.3f s")
    }
    spark.stop()
  }
}
