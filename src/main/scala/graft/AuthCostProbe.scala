package graft

/** Micro-attribution harness for the r11/r12 transport-bench movements
  * (VERDICT r11 ask #2 — measured attribution, not assertion):
  *
  *   - kafka: per-connection cost of the KIP-152 auth handshake, measured
  *     directly — none vs PLAIN (2 extra round trips) vs SCRAM-SHA-256
  *     (3 extra round trips + a PBKDF2-4096 derivation on EACH side).
  *     k1–k4's short-lived per-task connections each pay this price.
  *   - iggy: per-message cost of the published polled-message layout's
  *     CRC32-verified decode (the r11 i1/i3 movement's suspect), split
  *     into the full decode and the CRC update alone, over i1-sized
  *     256 B payloads.
  *
  * Prints one line per measurement; numbers land in BENCH_LOCAL.md's
  * receipts section. Usage: `runMain graft.AuthCostProbe`.
  */
object AuthCostProbe {
  def main(args: Array[String]): Unit = {
    val creds = ("u", "p")

    def cycles(srv: kafka.EmbeddedKafka, sasl: Option[(String, String)],
        mech: String, n: Int,
        tls: Option[kafka.KafkaTls.Client] = None): Double = {
      val t0 = System.nanoTime()
      (0 until n).foreach { _ =>
        val c = new kafka.KafkaClient(srv.host, srv.port, sasl = sasl,
          saslMechanism = mech, tls = tls)
        c.apiVersions()
        c.close()
      }
      (System.nanoTime() - t0) / 1e6 / n
    }

    val (tlsServer, tlsClient) = kafka.KafkaTls.ephemeral
    val authSrv = new kafka.EmbeddedKafka(credentials = Some(creds))
    val openSrv = new kafka.EmbeddedKafka()
    val sslSrv = new kafka.EmbeddedKafka(credentials = Some(creds),
      tls = Some(tlsServer))
    try {
      // JIT + socket warmup on every path before any timed pass
      cycles(openSrv, None, "PLAIN", 30)
      cycles(authSrv, Some(creds), "PLAIN", 30)
      cycles(authSrv, Some(creds), "SCRAM-SHA-256", 30)
      cycles(sslSrv, Some(creds), "SCRAM-SHA-256", 30, Some(tlsClient))
      val none = cycles(openSrv, None, "PLAIN", 200)
      val plain = cycles(authSrv, Some(creds), "PLAIN", 200)
      val scram = cycles(authSrv, Some(creds), "SCRAM-SHA-256", 200)
      // SASL_SSL: a fresh TLS 1.3 handshake (EC key exchange, no session
      // resumption — every short-lived task connection is a cold client)
      // wrapping the same SCRAM exchange
      val saslSsl = cycles(sslSrv, Some(creds), "SCRAM-SHA-256", 200,
        Some(tlsClient))
      println(f"[authcost] kafka per-connection ms (connect+auth+" +
        f"ApiVersions): none=$none%.3f plain=$plain%.3f " +
        f"scram256=$scram%.3f sasl_ssl_scram256=$saslSsl%.3f  " +
        f"(plain adds ${plain - none}%.3f, scram adds ${scram - none}%.3f, " +
        f"tls adds ${saslSsl - scram}%.3f)")
    } finally { authSrv.close(); openSrv.close(); sslSrv.close() }

    // redis per-connection AUTH attribution (round 12's credential
    // surface): connect + PING with and without the constructor AUTH —
    // the price every short-lived task connection pays on a secured
    // server is ONE extra round trip
    {
      def rcycles(srv: redis.EmbeddedRedis,
          auth: Option[redis.RedisClient.Auth], n: Int): Double = {
        val t0 = System.nanoTime()
        (0 until n).foreach { _ =>
          val c = new redis.RedisClient(srv.host, srv.port, auth = auth)
          c.commandS("PING")
          c.close()
        }
        (System.nanoTime() - t0) / 1e6 / n
      }
      val open = new redis.EmbeddedRedis()
      val gated = new redis.EmbeddedRedis(auth = Some(("u", "p")))
      try {
        rcycles(open, None, 30)
        rcycles(gated, Some(redis.RedisClient.Auth(Some("u"), "p")), 30)
        val none = rcycles(open, None, 200)
        val authd = rcycles(gated,
          Some(redis.RedisClient.Auth(Some("u"), "p")), 200)
        println(f"[authcost] redis per-connection ms (connect+PING): " +
          f"none=$none%.3f auth=$authd%.3f (AUTH adds ${authd - none}%.3f)")
      } finally { open.close(); gated.close() }
    }

    // iggy decode attribution: encode one polled message once, decode it
    // N times (fresh Reader per decode, as the client does per message)
    val payload = Array.tabulate[Byte](256)(i => (i * 31).toByte)
    val w = new iggy.IggyWire.Writer()
    iggy.IggyWire.writePolledMessage(w, 7L, 1234567L, payload)
    val bytes = w.result()
    val n = 2000000
    // warmup
    (0 until 200000).foreach { _ =>
      iggy.IggyWire.readPolledMessage(new iggy.IggyWire.Reader(bytes))
    }
    val t0 = System.nanoTime()
    (0 until n).foreach { _ =>
      iggy.IggyWire.readPolledMessage(new iggy.IggyWire.Reader(bytes))
    }
    val decodeNs = (System.nanoTime() - t0).toDouble / n
    // CRC alone over the same payload size
    (0 until 200000).foreach { _ =>
      val c = new java.util.zip.CRC32; c.update(payload); c.getValue
    }
    val t1 = System.nanoTime()
    (0 until n).foreach { _ =>
      val c = new java.util.zip.CRC32; c.update(payload); c.getValue
    }
    val crcNs = (System.nanoTime() - t1).toDouble / n
    println(f"[authcost] iggy published-layout decode: $decodeNs%.0f ns/msg " +
      f"(CRC32 alone $crcNs%.0f ns/msg) -> 100k msgs = " +
      f"${decodeNs * 100000 / 1e9}%.3f s decode, " +
      f"${crcNs * 100000 / 1e9}%.3f s CRC")
  }
}
