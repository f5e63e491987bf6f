package graft

/** Socket-scaling receipt for the k-family's sf10 decade attribution
  * (BENCH_SF1; not part of the driver contract). BENCH_SF1 attributes
  * k7/k8's second-decade growth to "bytes over the embedded broker" —
  * this harness tests whether the broker actually SERIALIZES concurrent
  * transport (in which case a multi-connection client would read flat
  * seconds regardless of fan-in) or scales with connections
  * (per-connection accept threads + per-partition locks, in which case
  * the decade cost is single-MACHINE byte volume: CRC32C, batch codec,
  * copies — exactly the part a real cluster partitions across brokers
  * and executors).
  *
  * Pushes a fixed record volume through N parallel connections for
  * N ∈ {1, 2, 4, 8} (each connection owning 8/N of the topic's 8
  * partitions), then fetches it all back the same way, and prints one
  * receipt line per N. Usage:
  * `runMain graft.SocketScaleProbe [records] [recordBytes]`.
  */
object SocketScaleProbe {
  def main(args: Array[String]): Unit = {
    val totalRecs = args.headOption.map(_.toInt).getOrElse(2000000)
    val recBytes = args.lift(1).map(_.toInt).getOrElse(100)
    val parts = 8
    val srv = new kafka.EmbeddedKafka(autoCreatePartitions = parts)
    val admin = new kafka.KafkaClient(srv.host, srv.port)
    val payload = Array.fill(recBytes)('x'.toByte)
    val perPart = totalRecs / parts
    val mb = totalRecs.toLong * recBytes / 1e6
    try {
      Seq(1, 2, 4, 8).foreach { n =>
        val topic = s"scale$n"
        admin.metadata(Seq(topic)) // auto-create with 8 partitions
        val groups = (0 until parts).grouped(parts / n).toSeq
        def run(work: (kafka.KafkaClient, Int) => Unit): Double = {
          val t0 = System.nanoTime()
          val ts = groups.map(g => new Thread(() => {
            val c = new kafka.KafkaClient(srv.host, srv.port)
            try g.foreach(p => work(c, p)) finally c.close()
          }))
          ts.foreach(_.start()); ts.foreach(_.join())
          (System.nanoTime() - t0) / 1e9
        }
        val prodDt = run { (c, p) =>
          var off = 0
          while (off < perPart) {
            val m = math.min(1000, perPart - off)
            c.produce(topic, p,
              (0 until m).map(i => ((off + i).toLong, null, payload)))
            off += m
          }
        }
        val fetchDt = run { (c, p) =>
          var next = 0L
          var done = false
          while (!done) {
            val (_, page, _) = c.fetchIso(topic, p, next, 1 << 20)
            if (page <= next || page >= perPart) done = true
            next = page
          }
        }
        println(f"[sockscale] conns=$n produce=$prodDt%.2f s " +
          f"(${mb / prodDt}%.0f MB/s) fetch=$fetchDt%.2f s " +
          f"(${mb / fetchDt}%.0f MB/s)")
      }
    } finally { admin.close(); srv.close() }
  }
}
