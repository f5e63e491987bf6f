package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** Client ↔ embedded-broker laws over real sockets: the API surface the
  * reference adapter drives through librdkafka (metadata/list-offsets/
  * fetch/produce + offsets_for_times seek), executed end-to-end.
  */
class KafkaSpec extends AnyFunSuite {

  private def withBroker[T](f: (EmbeddedKafka, KafkaClient) => T): T = {
    val srv = new EmbeddedKafka
    val c = new KafkaClient(srv.host, srv.port)
    try f(srv, c) finally { c.close(); srv.close() }
  }

  test("SASL PLAIN: good credentials open the channel, bad ones fail typed, " +
      "unauthenticated data requests are cut") {
    val srv = new EmbeddedKafka(credentials = Some(("alice", "s3cret")))
    try {
      // good: the KIP-152 handshake (SaslHandshake v1 → SaslAuthenticate
      // v0 with the RFC 4616 PLAIN token) runs in the constructor, then
      // the channel serves data APIs normally
      val c = new KafkaClient(srv.host, srv.port,
        sasl = Some(("alice", "s3cret")))
      try {
        assert(c.apiVersions().contains(KafkaWire.Api.SaslHandshake))
        assert(c.metadata(Seq("t"))("t") == Seq(0, 1, 2, 3))
      } finally c.close()
      // bad password: SaslAuthenticationFailed (58) surfaces typed from
      // the constructor — no half-authenticated client escapes
      val e = intercept[RuntimeException] {
        new KafkaClient(srv.host, srv.port, sasl = Some(("alice", "wrong")))
      }
      assert(e.getMessage.contains(
        s"kafka error ${KafkaWire.Err.SaslAuthenticationFailed}"),
        s"unexpected failure: ${e.getMessage}")
      // no credentials at all: ApiVersions still serves (bootstrap), but
      // the first data request is cut without a reply — the SASL
      // listener's terminate-on-unauthenticated behavior
      val c2 = new KafkaClient(srv.host, srv.port)
      try {
        assert(c2.apiVersions().nonEmpty)
        intercept[java.io.IOException] { c2.metadata(Seq("t")) }
      } finally c2.close()
    } finally srv.close()
  }

  test("SSL: TLS listener round-trips produce/fetch with a trusting " +
      "client; plaintext and untrusting clients never reach the protocol") {
    val (server, trust) = KafkaTls.ephemeral
    val srv = new EmbeddedKafka(tls = Some(server))
    try {
      // trusting client: eager handshake in the constructor, then the
      // whole wire protocol runs inside the channel unchanged
      val c = new KafkaClient(srv.host, srv.port, tls = Some(trust))
      try {
        assert(c.tlsProtocol.exists(_.startsWith("TLSv1")),
          s"not a TLS channel: ${c.tlsProtocol}")
        val base = c.produce("t", 0, Seq((1000L, null, "x".getBytes)))
        assert(base == 0L)
        val (hw, recs) = c.fetch("t", 0, 0L)
        assert(hw == 1L && recs.map(r => new String(r.value)) == Seq("x"))
      } finally c.close()
      // plaintext client: its first frame is not a TLS hello — the
      // listener answers with a TLS alert / close, which the plaintext
      // client can only see as a dead channel (IOException) or a
      // garbage frame (the alert bytes fail frame validation) — never a
      // parseable kafka reply it could mistake for success
      val failure = intercept[Exception] {
        val c2 = new KafkaClient(srv.host, srv.port)
        try c2.apiVersions() finally c2.close()
      }
      assert(failure.isInstanceOf[java.io.IOException] ||
        failure.isInstanceOf[IllegalArgumentException],
        s"unexpected: $failure")
      // untrusting client: a DIFFERENT trust root (fresh generated pair)
      // must fail the handshake at construction — certificate trust is
      // the configured truststore's, never the JVM default CAs
      val (_, wrongTrust) = KafkaTls.generate()
      intercept[javax.net.ssl.SSLHandshakeException] {
        new KafkaClient(srv.host, srv.port, tls = Some(wrongTrust))
      }
    } finally srv.close()
  }

  test("mutual TLS: an ssl.client.auth=required listener serves only " +
      "clients presenting a trusted certificate") {
    val (server, client) = graft.core.TlsChannel.generateMutual()
    val srv = new EmbeddedKafka(tls = Some(server))
    try {
      // certificate presented: full round trip
      val c = new KafkaClient(srv.host, srv.port, tls = Some(client))
      try {
        assert(c.tlsProtocol.exists(_.startsWith("TLSv1")))
        assert(c.produce("t", 0, Seq((1L, null, "x".getBytes))) == 0L)
      } finally c.close()
      // trusting client WITHOUT a certificate: refused. Under TLS 1.3
      // the server's certificate_required alert can land at the
      // handshake OR on the first read after it — either way no kafka
      // bytes are ever served
      val bare = client.copy(keystore = None)
      intercept[Exception] {
        val c2 = new KafkaClient(srv.host, srv.port, tls = Some(bare))
        try c2.apiVersions() finally c2.close()
      }
      // a certificate the listener does NOT trust (fresh key pair) is
      // equally refused — client auth verifies the chain, not presence
      val (_, rogue) = graft.core.TlsChannel.generateMutual()
      val rogueCert = client.copy(keystore = rogue.keystore)
      intercept[Exception] {
        val c3 = new KafkaClient(srv.host, srv.port, tls = Some(rogueCert))
        try c3.apiVersions() finally c3.close()
      }
    } finally srv.close()
  }

  test("SASL_SSL: the KIP-152 SCRAM exchange runs unchanged inside the " +
      "TLS channel; bad credentials still fail typed over TLS") {
    val (server, trust) = KafkaTls.ephemeral
    val srv = new EmbeddedKafka(credentials = Some(("alice", "s3cret")),
      tls = Some(server))
    try {
      val c = new KafkaClient(srv.host, srv.port,
        sasl = Some(("alice", "s3cret")),
        saslMechanism = KafkaWire.Scram.Sha512, tls = Some(trust))
      try {
        assert(c.tlsProtocol.exists(_.startsWith("TLSv1")))
        assert(c.metadata(Seq("t"))("t") == Seq(0, 1, 2, 3))
      } finally c.close()
      val e = intercept[RuntimeException] {
        new KafkaClient(srv.host, srv.port, sasl = Some(("alice", "nope")),
          saslMechanism = KafkaWire.Scram.Sha512, tls = Some(trust))
      }
      assert(e.getMessage.contains(
        s"kafka error ${KafkaWire.Err.SaslAuthenticationFailed}"),
        s"unexpected failure: ${e.getMessage}")
      // TLS alone is not authentication: an unauthenticated-but-trusting
      // client bootstraps ApiVersions and is cut on its first data request
      val c3 = new KafkaClient(srv.host, srv.port, tls = Some(trust))
      try {
        assert(c3.apiVersions().nonEmpty)
        intercept[java.io.IOException] { c3.metadata(Seq("t")) }
      } finally c3.close()
    } finally srv.close()
  }

  test("SASL SCRAM-SHA-256/512: full RFC 5802 exchange, bad credentials " +
      "fail typed, wrong mechanism rejected at handshake") {
    val srv = new EmbeddedKafka(credentials = Some(("alice", "s3cret")))
    try {
      for (mech <- KafkaWire.Scram.Mechanisms) {
        // good: client-first/server-first/client-final/server-final with
        // proof verified broker-side and the server signature verified
        // client-side (mutual auth) — then the channel serves data APIs
        val c = new KafkaClient(srv.host, srv.port,
          sasl = Some(("alice", "s3cret")), saslMechanism = mech)
        try assert(c.metadata(Seq("t"))("t") == Seq(0, 1, 2, 3),
          s"$mech channel did not open") finally c.close()
        // bad password: the PROOF fails (the password never crosses the
        // wire — unlike PLAIN there is no token to compare, only crypto)
        val e = intercept[RuntimeException] {
          new KafkaClient(srv.host, srv.port,
            sasl = Some(("alice", "wrong")), saslMechanism = mech)
        }
        assert(e.getMessage.contains(
          s"kafka error ${KafkaWire.Err.SaslAuthenticationFailed}"),
          s"$mech unexpected failure: ${e.getMessage}")
      }
      // unknown mechanism: UnsupportedSaslMechanism (33) at the handshake
      val e2 = intercept[RuntimeException] {
        new KafkaClient(srv.host, srv.port,
          sasl = Some(("alice", "s3cret")), saslMechanism = "SCRAM-SHA-1")
      }
      assert(e2.getMessage.contains("SCRAM-SHA-1") ||
        e2.getMessage.contains("not a SCRAM mechanism"),
        s"unexpected failure: ${e2.getMessage}")
    } finally srv.close()
  }

  test("SASL OAUTHBEARER: unsecured bearer flow authenticates the right " +
      "principal; wrong principal walks the RFC 7628 failure rounds") {
    val srv = new EmbeddedKafka(credentials = Some(("svc-etl", "unused")))
    try {
      // right principal: one round, empty server auth bytes, channel open
      val c = new KafkaClient(srv.host, srv.port,
        sasl = Some(("svc-etl", "")), saslMechanism = "OAUTHBEARER")
      try assert(c.metadata(Seq("t"))("t") == Seq(0, 1, 2, 3))
      finally c.close()
      // wrong principal: the error challenge arrives as a SUCCESSFUL
      // round (RFC 7628 §3.2.3), the client answers the dummy 0x01, and
      // the NEXT round fails with SaslAuthenticationFailed (58)
      val e = intercept[RuntimeException] {
        new KafkaClient(srv.host, srv.port, sasl = Some(("intruder", "")),
          saslMechanism = "OAUTHBEARER")
      }
      assert(e.getMessage.contains(
        s"kafka error ${KafkaWire.Err.SaslAuthenticationFailed}"),
        s"unexpected failure: ${e.getMessage}")
    } finally srv.close()
  }

  test("OAUTHBEARER token laws: frame + unsecured-JWS codec round-trips; " +
      "expired and signed tokens are refused") {
    import KafkaWire.OAuth._
    val tok = unsecuredJwt("alice", nowSec = 1000L, lifetimeSec = 60L)
    // frame round-trip
    assert(parseInitialResponse(initialResponse(tok)).contains(tok))
    assert(parseInitialResponse("garbage".getBytes).isEmpty)
    // claims round-trip
    assert(parseUnsecured(tok).contains(("alice", 1060L)))
    // a SIGNED token (non-empty third part) must be refused by the
    // unsecured validator — Kafka's behavior, and the safety line that
    // keeps alg-none validation from ever accepting a real token
    assert(parseUnsecured(tok + "c2ln").isEmpty)
    // alg != none refused
    val hs256 = b64url("""{"alg":"HS256"}""".getBytes) + "." +
      tok.split("\\.", -1)(1) + "."
    assert(parseUnsecured(hs256).isEmpty)
    // malformed base64 never throws out of the validator
    assert(parseUnsecured("!!.!!.").isEmpty)
    // expiry is enforced broker-side: an EXPIRED token for the RIGHT
    // principal walks the same failure rounds (error challenge → dummy
    // response → 58). KafkaClient mints live tokens only, so hand-drive
    // the KIP-152 exchange over a raw socket
    val srv = new EmbeddedKafka(credentials = Some(("alice", "")))
    val sock = new java.net.Socket(srv.host, srv.port)
    try {
      val in = KafkaWire.buffered(sock.getInputStream)
      val out = KafkaWire.buffered(sock.getOutputStream)
      var corr = 0
      def call(api: Int)(body: KafkaWire.Writer => Unit): KafkaWire.Reader = {
        corr += 1
        val w = new KafkaWire.Writer; body(w)
        KafkaWire.writeRequest(out, api, KafkaWire.Versions(api).toInt,
          corr, "spec", w.result())
        out.flush()
        val (id, rep) = KafkaWire.readResponse(in)
        assert(id == corr)
        new KafkaWire.Reader(rep)
      }
      val hs = call(KafkaWire.Api.SaslHandshake)(_.str("OAUTHBEARER"))
      assert(hs.i16v() == KafkaWire.Err.None)
      val expired = unsecuredJwt("alice", nowSec = 1000L, lifetimeSec = 1L)
      val r1 = call(KafkaWire.Api.SaslAuthenticate)(
        _.nullableBytes(initialResponse(expired)))
      assert(r1.i16v() == KafkaWire.Err.None); r1.nullableStr()
      assert(new String(r1.nullableBytes()).contains("invalid_token"),
        "expired token must draw the RFC 7628 error challenge")
      val r2 = call(KafkaWire.Api.SaslAuthenticate)(
        _.nullableBytes(DummyResponse))
      assert(r2.i16v() == KafkaWire.Err.SaslAuthenticationFailed)
    } finally { sock.close(); srv.close() }
  }

  test("SCRAM crypto laws: proof verifies, tampered proof and forged " +
      "server signature do not") {
    val scram = KafkaWire.Scram(KafkaWire.Scram.Sha256)
    val salt = Array.tabulate[Byte](16)(_.toByte)
    val sp = scram.hi("s3cret", salt, 4096)
    val cfb = KafkaWire.Scram.clientFirstBare("alice", "cnonce1")
    val sf = KafkaWire.Scram.serverFirst("cnonce1snonce2", salt, 4096)
    val auth = KafkaWire.Scram.authMessage(cfb, sf,
      KafkaWire.Scram.clientFinalWithoutProof("cnonce1snonce2"))
    val proof = scram.clientProof(sp, auth)
    assert(scram.verifyClientProof(scram.storedKey(sp), auth, proof))
    // any flipped bit in the proof must fail the StoredKey check
    val bad = proof.clone(); bad(0) = (bad(0) ^ 1).toByte
    assert(!scram.verifyClientProof(scram.storedKey(sp), auth, bad))
    // a different password derives a different server signature — the
    // client's mutual-auth check would reject a forging broker
    val spWrong = scram.hi("wrong", salt, 4096)
    assert(!java.util.Arrays.equals(
      scram.serverSignature(sp, auth), scram.serverSignature(spWrong, auth)))
    // saslname escaping round-trips the RFC's two special characters
    assert(KafkaWire.Scram.unescapeName(
      KafkaWire.Scram.escapeName("a=b,c")) == "a=b,c")
  }

  test("SASL PLAIN round-trips the produce/fetch path end-to-end") {
    val srv = new EmbeddedKafka(credentials = Some(("u", "p")))
    try {
      val c = new KafkaClient(srv.host, srv.port, sasl = Some(("u", "p")))
      try {
        c.metadata(Seq("t"))
        assert(c.produce("t", 0, Seq((10L, null, "a".getBytes))) == 0L)
        val (hw, recs) = c.fetch("t", 0, 0L)
        assert(hw == 1L && recs.map(r => new String(r.value)) == Seq("a"))
      } finally c.close()
    } finally srv.close()
  }

  test("api versions negotiation lists the pinned surface") {
    withBroker { (_, c) =>
      val vs = c.apiVersions()
      for ((k, v) <- KafkaWire.Versions)
        assert(vs(k) == (v.toInt, v.toInt), s"api $k")
    }
  }

  test("metadata auto-creates topics with the broker's partition count") {
    withBroker { (srv, c) =>
      assert(srv.partitionCount("clicks") == 0)
      assert(c.metadata(Seq("clicks"))("clicks") == Seq(0, 1, 2, 3))
      assert(srv.partitionCount("clicks") == 4)
    }
  }

  test("produce assigns dense offsets and fetch round-trips the records") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      assert(c.produce("t", 2, Seq((10L, null, "a".getBytes),
        (20L, "k".getBytes, "b".getBytes))) == 0L)
      assert(c.produce("t", 2, Seq((30L, null, "c".getBytes))) == 2L)
      val (hw, recs) = c.fetch("t", 2, 0L)
      assert(hw == 3L)
      assert(recs.map(_.offset) == Seq(0L, 1L, 2L))
      assert(recs.map(_.tsMs) == Seq(10L, 20L, 30L))
      assert(recs.map(r => new String(r.value)) == Seq("a", "b", "c"))
      assert(recs(0).key == null && new String(recs(1).key) == "k")
      // other partitions unaffected
      assert(c.fetch("t", 0, 0L)._2.isEmpty)
    }
  }

  test("gzip produce: records round-trip over the socket, the log keeps " +
      "the producer's codec, and a plain consumer never notices") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      // gzip and plain batches interleave in one partition's log — the
      // broker stores each AS PRODUCED (compression.type=producer default)
      assert(c.produce("t", 1,
        (0 until 50).map(i => (i * 10L, null, s"payload $i padding".getBytes)),
        KafkaWire.Codec.Gzip) == 0L)
      assert(c.produce("t", 1, Seq((999L, null, "plain".getBytes))) == 50L)
      assert(srv.storedBatchCodecs("t", 1) ==
        Seq(KafkaWire.Codec.Gzip, KafkaWire.Codec.None))
      // the SAME fetch path decodes both transparently
      val (hw, recs) = c.fetch("t", 1, 0L)
      assert(hw == 51L && recs.size == 51)
      assert(recs.map(_.offset) == (0L to 50L))
      assert(new String(recs(7).value) == "payload 7 padding")
      assert(new String(recs(50).value) == "plain")
      // mid-offset fetch still lands inside the compressed batch: the
      // broker serves the whole stored batch, the client trims the prefix
      assert(c.fetch("t", 1, 30L)._2.map(_.offset) == (30L to 50L))
    }
  }

  test("fetch from a mid offset starts exactly there") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      c.produce("t", 0, (0 until 10).map(i => (i * 100L, null,
        s"m$i".getBytes)))
      val (_, recs) = c.fetch("t", 0, 7L)
      assert(recs.map(_.offset) == Seq(7L, 8L, 9L))
    }
  }

  test("fetch beyond the high watermark is OffsetOutOfRange") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      c.produce("t", 0, Seq((1L, null, "x".getBytes)))
      assert(c.fetch("t", 0, 1L)._2.isEmpty) // at hw: empty, not an error
      val e = intercept[c.KafkaServerErr](c.fetch("t", 0, 5L))
      assert(e.code == KafkaWire.Err.OffsetOutOfRange)
    }
  }

  test("list offsets: earliest, latest, and first-ts>=target law") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      c.produce("t", 1, Seq((100L, null, "a".getBytes),
        (200L, null, "b".getBytes), (200L, null, "c".getBytes),
        (350L, null, "d".getBytes)))
      assert(c.listOffset("t", 1, KafkaWire.Ts.Earliest) == Some(0L))
      assert(c.listOffset("t", 1, KafkaWire.Ts.Latest) == Some(4L))
      assert(c.listOffset("t", 1, 100L) == Some(0L))
      assert(c.listOffset("t", 1, 101L) == Some(1L)) // first ts >= 101
      assert(c.listOffset("t", 1, 200L) == Some(1L)) // ties → earliest
      assert(c.listOffset("t", 1, 201L) == Some(3L))
      assert(c.listOffset("t", 1, 351L) == None)     // nothing that late yet
    }
  }

  test("byte-capped fetch pages at batch granularity, never zero mid-log") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      val big = Array.fill[Byte](4096)('x')
      // one produce per record = one stored batch per record (fetch serves
      // whole stored batches, like a real broker's log segments)
      (0 until 8).foreach(i => c.produce("t", 0, Seq((i.toLong, null, big))))
      val (_, page) = c.fetch("t", 0, 0L, maxBytes = 5000)
      assert(page.nonEmpty && page.size < 8, s"got ${page.size}")
      // pagedFetch walks the whole range through the cap
      val s = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port))
      try {
        val all = KafkaSource.pagedFetch(s, "t", 0, 0L, 8L,
          maxBytes = 5000).toSeq
        assert(all.map(_.sequence) == (0L until 8L))
      } finally s.close()
    }
  }

  test("fetch serves the WHOLE stored batch; the client trims the prefix") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      // 10 records in ONE batch: a mid-batch fetch offset means the broker
      // replies with the full batch (zero-copy law) and KafkaClient.fetch
      // must drop the pre-asked records
      c.produce("t", 1, (0 until 10).map(i => (i * 10L, null, s"m$i".getBytes)))
      val (hw, recs) = c.fetch("t", 1, 6L)
      assert(hw == 10L)
      assert(recs.map(_.offset) == (6L until 10L))
      assert(recs.map(r => new String(r.value)) == Seq("m6", "m7", "m8", "m9"))
    }
  }

  test("unknown topic partitions error instead of silently serving") {
    withBroker { (_, c) =>
      val e = intercept[c.KafkaServerErr](c.fetch("nope", 0, 0L))
      assert(e.code == KafkaWire.Err.UnknownTopicOrPartition)
      val e2 = intercept[c.KafkaServerErr](c.listOffset("nope", 9, 0L))
      assert(e2.code == KafkaWire.Err.UnknownTopicOrPartition)
    }
  }

  test("group offsets: coordinator lookup, commit, fetch, absence") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      assert(c.findCoordinator("g1") == (srv.nodeId, srv.host, srv.port))
      // nothing committed yet → empty
      assert(c.fetchOffsets("g1", Map("t" -> Seq(0, 1, 2, 3))).isEmpty)
      c.commitOffsets("g1", Map(("t", 0) -> 5L, ("t", 2) -> 9L))
      assert(c.fetchOffsets("g1", Map("t" -> Seq(0, 1, 2, 3))) ==
        Map(("t", 0) -> 5L, ("t", 2) -> 9L))
      // groups are independent; re-commit overwrites
      assert(c.fetchOffsets("g2", Map("t" -> Seq(0))).isEmpty)
      c.commitOffsets("g1", Map(("t", 0) -> 7L))
      assert(c.fetchOffsets("g1", Map("t" -> Seq(0)))(("t", 0)) == 7L)
      assert(srv.committedOffset("g1", "t", 0) == Some(7L))
    }
  }

  test("unsupported api version is rejected at the wire") {
    withBroker { (srv, _) =>
      // raw socket: ApiVersions v3 (a flexible version this surface pins out)
      val s = new java.net.Socket(srv.host, srv.port)
      try {
        val out = s.getOutputStream
        KafkaWire.writeRequest(out, KafkaWire.Api.ApiVersions, 3, 42, "x",
          Array.emptyByteArray)
        out.flush()
        val (cid, body) = KafkaWire.readResponse(s.getInputStream)
        assert(cid == 42)
        assert(new KafkaWire.Reader(body).i16v() ==
          KafkaWire.Err.UnsupportedVersion)
      } finally s.close()
    }
  }
}
