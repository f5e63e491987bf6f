package graft

/** Apply-lock cost receipt (BENCH_LOCAL; not part of the driver
  * contract): the embedded RESP server serializes every command apply
  * under one lock (real redis's single-threaded model — required for
  * WATCH/MULTI correctness against concurrent readers). This prices
  * that choice: N connections pipeline a fixed XADD volume
  * concurrently; compare against a build with the lock relaxed to see
  * whether the serialized apply, not the socket layer, bounds the
  * embedded producer path. Usage:
  * `runMain graft.RedisLockProbe [totalXadds] [conns]`.
  */
object RedisLockProbe {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(400000)
    val conns = args.lift(1).map(_.toInt).getOrElse(8)
    val srv = new redis.EmbeddedRedis
    val payload = Array.fill(64)('x'.toByte)
    try {
      (1 to 3).foreach { round =>
        val per = total / conns
        val t0 = System.nanoTime()
        val ts = (0 until conns).map(ci => new Thread(() => {
          val c = new redis.RedisClient(srv.host, srv.port)
          // ms advances per ROUND: the embedded server now shares real
          // redis's refusal of an id at/below the key's top, so re-adding
          // round 1's ids would measure refusal throughput, not appends
          try (0 until per).grouped(200).foreach { chunk =>
            val cmds = chunk.map(i => redis.RedisStreams.xadd(
              s"lk:$ci", round * 10000000L + i, payload))
            // pipelineRaw so the refusal check actually fires (pipeline
            // throws on the first Err with replies left unread)
            c.pipelineRaw(cmds).collectFirst { case redis.Resp.Err(m) =>
              throw new IllegalStateException(s"XADD refused: $m")
            }
          } finally c.close()
        }))
        ts.foreach(_.start()); ts.foreach(_.join())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[redislock] round=$round conns=$conns xadds=$total " +
          f"dt=$dt%.3f s (${total / dt / 1000}%.0f k/s)")
      }
    } finally srv.close()
  }
}
