package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** KIP-98 transactions-on-the-wire laws (VERDICT r12 #4): the reference
  * producer's init/begin/commit/abort/send_offsets surface
  * (sea-streamer-kafka/src/producer.rs:236-301) spoken via InitProducerId /
  * AddPartitionsToTxn / AddOffsetsToTxn / TxnOffsetCommit / EndTxn v1,
  * transactional record batches, and the read_committed consumer half
  * (LSO bounds + aborted-range filtering off the broker's index).
  */
class KafkaTxnSpec extends AnyFunSuite {

  private def withBroker[T](f: (EmbeddedKafka, KafkaClient) => T): T = {
    val srv = new EmbeddedKafka
    val c = new KafkaClient(srv.host, srv.port)
    try f(srv, c) finally { c.close(); srv.close() }
  }

  private def values(recs: Seq[KafkaWire.KRecord]): Seq[String] =
    recs.map(r => new String(r.value, "UTF-8"))

  test("committed txn is visible; aborted txn is invisible under " +
      "read_committed but present (data only) under read_uncommitted") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      val good = new KafkaTxnProducer(c, "good").initTransactions()
      val bad = new KafkaTxnProducer(c, "bad").initTransactions()
      // interleave: aborted data sits BETWEEN committed batches, so the
      // filter walks open/close ranges mid-log, not just a suffix
      good.begin()
      good.send("t", 0, Seq((1L, null, "c1".getBytes)))
      bad.begin()
      bad.send("t", 0, Seq((2L, null, "x1".getBytes),
        (3L, null, "x2".getBytes)))
      good.send("t", 0, Seq((4L, null, "c2".getBytes)))
      bad.abort()
      good.send("t", 0, Seq((5L, null, "c3".getBytes)))
      good.commit()
      // read_committed: exactly the committed values, in offset order
      val (lso, _, rc) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(values(rc) == Seq("c1", "x1", "x2", "c2", "c3")
        .filterNot(_.startsWith("x")), s"leaked: ${values(rc)}")
      // LSO == hw once every txn ended: markers occupy offsets
      // (3 data + 2 aborted + 2 markers = 7 log slots)
      assert(lso == 7L, s"lso $lso")
      // read_uncommitted sees aborted DATA too, but never control rows
      val (_, ru) = c.fetch("t", 0, 0L)
      assert(values(ru) == Seq("c1", "x1", "x2", "c2", "c3"))
    }
  }

  test("LSO blocks read_committed at an open transaction; commit releases") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      val p = new KafkaTxnProducer(c, "open").initTransactions()
      p.begin()
      p.send("t", 0, Seq((1L, null, "pending".getBytes)))
      // open txn: nothing stable — read_committed serves no records and
      // reports LSO 0 (the txn's first offset)
      val (lso0, next0, rc0) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(lso0 == 0L && rc0.isEmpty && next0 == 0L,
        s"unstable data leaked: lso=$lso0 recs=${values(rc0)}")
      // read_uncommitted sees it immediately
      assert(values(c.fetch("t", 0, 0L)._2) == Seq("pending"))
      p.commit()
      val (lso1, _, rc1) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(lso1 == 2L && values(rc1) == Seq("pending"))
    }
  }

  test("fencing: re-init bumps the epoch, the zombie's produce and endTxn " +
      "die with INVALID_PRODUCER_EPOCH, and its open txn is aborted") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      val (pid, e0) = c.initProducerId("app-1")
      c.addPartitionsToTxn("app-1", pid, e0, Seq(("t", 0)))
      c.produceTxn("t", 0, Seq((1L, null, "zombie".getBytes)),
        "app-1", pid, e0, 0)
      // the crashed producer's successor re-initializes: same pid, epoch+1,
      // and the orphaned open txn is aborted by the coordinator
      val (pid2, e1) = c.initProducerId("app-1")
      assert(pid2 == pid && e1 == e0 + 1, s"got ($pid2, $e1)")
      val (_, _, rc) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(rc.isEmpty, s"orphaned txn leaked: ${values(rc)}")
      // zombie produce: fenced
      val ep = intercept[RuntimeException] {
        c.addPartitionsToTxn("app-1", pid, e0, Seq(("t", 0)))
      }
      assert(ep.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidProducerEpoch}"),
        ep.getMessage)
      val ee = intercept[RuntimeException] {
        c.endTxn("app-1", pid, e0, commit = true)
      }
      assert(ee.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidProducerEpoch}"), ee.getMessage)
    }
  }

  test("fence-error fidelity: a producer fenced AFTER registering reads " +
      "47 on produce (never 48 — re-init cleared the partition set, but " +
      "the fence is the cause), and a zombie's staged offsets never ride " +
      "the new incarnation's commit") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      val (pid, e0) = c.initProducerId("app-f")
      c.addPartitionsToTxn("app-f", pid, e0, Seq(("t", 0)))
      c.findCoordinator("g-f")
      c.addOffsetsToTxn("app-f", pid, e0, "g-f")
      c.txnOffsetCommit("app-f", "g-f", pid, e0, Map(("src", 0) -> 42L))
      // the rival re-init clears parts + staged offsets and bumps
      val (_, e1) = c.initProducerId("app-f")
      assert(e1 == e0 + 1)
      // zombie produce to its FORMERLY-registered partition: the fence
      // (47), not "partition never added" (48) — retryFenced keys on 47
      val ep = intercept[RuntimeException] {
        c.produceTxn("t", 0, Seq((1L, null, "z".getBytes)),
          "app-f", pid, e0, 0)
      }
      assert(ep.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidProducerEpoch}"), ep.getMessage)
      // zombie staging: refused with the fence too
      val eo = intercept[RuntimeException] {
        c.txnOffsetCommit("app-f", "g-f", pid, e0, Map(("src", 0) -> 43L))
      }
      assert(eo.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidProducerEpoch}"), eo.getMessage)
      // the new incarnation's commit publishes NOTHING of the zombie's
      // staging (the re-init dropped it)
      c.addPartitionsToTxn("app-f", pid, e1, Seq(("t", 0)))
      c.produceTxn("t", 0, Seq((2L, null, "live".getBytes)),
        "app-f", pid, e1, 0)
      c.endTxn("app-f", pid, e1, commit = true)
      assert(c.fetchOffsets("g-f", Map("src" -> Seq(0))).isEmpty,
        "a zombie's staged offsets rode the new incarnation's commit")
    }
  }

  test("produce to a partition never added to the txn is INVALID_TXN_STATE; " +
      "so is a transactional batch with no transactional id") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      val (pid, e) = c.initProducerId("app-2")
      val err = intercept[RuntimeException] {
        c.produceTxn("t", 0, Seq((1L, null, "early".getBytes)),
          "app-2", pid, e, 0)
      }
      assert(err.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidTxnState}"), err.getMessage)
      val err2 = intercept[RuntimeException] {
        c.endTxn("nobody", 1L, 0, commit = true)
      }
      assert(err2.getMessage.contains(
        s"kafka error ${KafkaWire.Err.InvalidTxnState}"), err2.getMessage)
    }
  }

  test("send_offsets_to_transaction: staged group offsets publish at " +
      "commit and vanish on abort") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      c.findCoordinator("g")
      val p = new KafkaTxnProducer(c, "etl").initTransactions()
      // abort path: the staged read position must NOT appear
      p.begin()
      p.send("t", 0, Seq((1L, null, "a".getBytes)))
      p.sendOffsetsToTransaction("g", Map(("src", 0) -> 41L))
      p.abort()
      assert(c.fetchOffsets("g", Map("src" -> Seq(0))).isEmpty,
        "aborted txn leaked its staged offsets")
      // commit path: offset + data land atomically
      p.begin()
      p.send("t", 0, Seq((2L, null, "b".getBytes)))
      p.sendOffsetsToTransaction("g", Map(("src", 0) -> 42L))
      p.commit()
      assert(c.fetchOffsets("g", Map("src" -> Seq(0))) ==
        Map(("src", 0) -> 42L))
      val (_, _, rc) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(values(rc) == Seq("b"))
    }
  }

  test("paged read_committed scan advances through all-aborted pages " +
      "instead of stalling (batch-extent cursor)") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      val bad = new KafkaTxnProducer(c, "bulk-abort").initTransactions()
      bad.begin()
      // a large aborted run: enough bytes that a small-maxBytes pager
      // must cross multiple pages containing ZERO committed records
      (0 until 50).foreach { i =>
        bad.send("t", 0, Seq((i.toLong, null,
          ("junk" + i).getBytes)))
      }
      bad.abort()
      val good = new KafkaTxnProducer(c, "tail-commit").initTransactions()
      good.begin()
      good.send("t", 0, Seq((100L, null, "real".getBytes)))
      good.commit()
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port))
      try {
        val got = KafkaSource.pagedFetch(session, "t", 0, 0L,
          srv.logSize("t", 0), maxBytes = 64, readCommitted = true).toSeq
        assert(got.map(m => new String(m.payload, "UTF-8")) == Seq("real"),
          s"got ${got.size} messages")
      } finally session.close()
    }
  }

  test("aborted-txn index is marker-scoped: a page starting AFTER a " +
      "producer's abort marker must not re-open the range and drop the " +
      "same producer's later COMMITTED data") {
    // the consume-transform-produce reuse pattern: ONE producer aborts a
    // txn, then commits the next on the same partition. A paged
    // read_committed scan whose page begins past the abort marker would,
    // under an unscoped index, see (pid, first=0), mark the pid open with
    // no closing marker in the page, and silently drop the committed data
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      val p = new KafkaTxnProducer(c, "reuse").initTransactions()
      p.begin()
      p.send("t", 0, Seq((1L, null, "bad".getBytes("UTF-8"))))
      p.abort() // data@0, marker@1
      p.begin()
      p.send("t", 0, Seq((2L, null, "good".getBytes("UTF-8"))))
      p.commit() // data@2, marker@3
      // page starting exactly at the committed data (past the marker)
      val (_, _, page) = c.fetchIso("t", 0, 2L, readCommitted = true)
      assert(values(page) == Seq("good"),
        s"committed data dropped by a re-opened aborted range: " +
          s"${values(page)}")
      // a tiny-page scan over the whole log also yields exactly the
      // committed record
      val session = new KafkaClient.Session(
        () => new KafkaClient(srv.host, srv.port))
      try {
        val got = KafkaSource.pagedFetch(session, "t", 0, 0L,
          srv.logSize("t", 0), maxBytes = 1, readCommitted = true).toSeq
        assert(got.map(m => new String(m.payload, "UTF-8")) == Seq("good"),
          s"paged scan diverged: ${got.size} messages")
      } finally session.close()
    }
  }

  test("idempotent producer: an exact batch resend deduplicates (same " +
      "base offset, nothing re-appended); a gap is 45; a stale duplicate " +
      "is 46; an epoch bump resets sequences") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      val (pid, e) = c.initProducerId("idem")
      c.addPartitionsToTxn("idem", pid, e, Seq(("t", 0)))
      val recs = Seq((1L, null: Array[Byte], "a".getBytes("UTF-8")),
        (2L, null: Array[Byte], "b".getBytes("UTF-8")))
      val base1 = c.produceTxn("t", 0, recs, "idem", pid, e, 0)
      // the produce-retry path: the SAME batch again (seq 0..1) must
      // answer the ORIGINAL base offset and append nothing
      val again = c.produceTxn("t", 0, recs, "idem", pid, e, 0)
      assert(again == base1, s"resend re-appended: $base1 vs $again")
      assert(srv.logSize("t", 0) == 2L,
        s"dedup failed: log grew to ${srv.logSize("t", 0)}")
      // next-in-order continues
      val base2 = c.produceTxn("t", 0,
        Seq((3L, null: Array[Byte], "c".getBytes("UTF-8"))),
        "idem", pid, e, 2)
      assert(base2 == 2L)
      // a GAP (skipping sequence 3) is OutOfOrderSequenceNumber
      val gap = intercept[RuntimeException] {
        c.produceTxn("t", 0,
          Seq((9L, null: Array[Byte], "z".getBytes("UTF-8"))),
          "idem", pid, e, 7)
      }
      assert(gap.getMessage.contains(
        s"kafka error ${KafkaWire.Err.OutOfOrderSequenceNumber}"),
        gap.getMessage)
      // a STALE duplicate (older than the cached batch) is
      // DuplicateSequenceNumber — too old to dedup safely
      val stale = intercept[RuntimeException] {
        c.produceTxn("t", 0, recs, "idem", pid, e, 0)
      }
      assert(stale.getMessage.contains(
        s"kafka error ${KafkaWire.Err.DuplicateSequenceNumber}"),
        stale.getMessage)
      c.endTxn("idem", pid, e, commit = true)
      // epoch bump (re-init) RESETS sequences to 0 — the new incarnation
      // starts its own numbering
      val (pid2, e2) = c.initProducerId("idem")
      assert(pid2 == pid && e2 == e + 1)
      c.addPartitionsToTxn("idem", pid2, e2, Seq(("t", 0)))
      val b3 = c.produceTxn("t", 0,
        Seq((4L, null: Array[Byte], "d".getBytes("UTF-8"))),
        "idem", pid2, e2, 0)
      c.endTxn("idem", pid2, e2, commit = true)
      assert(b3 >= 3L)
      // the committed view holds exactly one copy of everything
      val (_, _, rc) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(values(rc) == Seq("a", "b", "c", "d"), values(rc).toString)
    }
  }

  test("transaction.timeout.ms: the coordinator aborts a crashed " +
      "producer's open txn — LSO releases without a restart, the zombie " +
      "dies fenced") {
    withBroker { (_, c) =>
      c.metadata(Seq("t"))
      c.produce("t", 0, Seq((1L, null, "before".getBytes("UTF-8"))))
      val p = new KafkaTxnProducer(c, "crashed", txnTimeoutMs = 120)
        .initTransactions()
      p.begin()
      p.send("t", 0, Seq((2L, null, "orphan".getBytes("UTF-8"))))
      // open txn: the stable region stops at its first offset
      val (lso0, _, rc0) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(lso0 == 1L && values(rc0) == Seq("before"))
      // the producer now CRASHES (no abort, no re-init). Past the
      // timeout, any fetch sweeps the coordinator: the txn aborts,
      // markers land, the LSO releases WITHOUT anyone restarting
      Thread.sleep(250)
      val (lso1, _, rc1) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(values(rc1) == Seq("before"),
        s"expired txn's data leaked: ${values(rc1)}")
      assert(lso1 == 3L, // data + orphan + abort marker, all stable now
        s"expiry did not release the LSO (lso=$lso1)")
      // the expiry bumped the epoch: the crashed incarnation is fenced
      val err = intercept[KafkaClient#KafkaServerErr] {
        p.send("t", 0, Seq((3L, null, "late".getBytes("UTF-8"))))
      }
      assert(err.code == KafkaWire.Err.InvalidProducerEpoch,
        s"zombie must die fenced after expiry, got $err")
      // a fresh init recovers the id and can transact again
      p.initTransactions()
      p.begin()
      p.send("t", 0, Seq((4L, null, "recovered".getBytes("UTF-8"))))
      p.commit()
      val (_, _, rc2) = c.fetchIso("t", 0, 0L, readCommitted = true)
      assert(values(rc2) == Seq("before", "recovered"))
    }
  }

  test("streaming read_committed: an OPEN transaction bounds the stream " +
      "at the LSO without wedging it; EndTxn releases the region on the " +
      "next trigger") {
    val spark = graft.TestSession.spark
    val srv = new EmbeddedKafka
    val c = new KafkaClient(srv.host, srv.port)
    try {
      c.metadata(Seq("t"))
      // committed prefix, then an OPEN transaction on the same partition
      c.produce("t", 0, Seq((1L, null, "before".getBytes("UTF-8"))))
      val p = new KafkaTxnProducer(c, "open-stream").initTransactions()
      p.begin()
      p.send("t", 0, Seq((2L, null, "pending".getBytes("UTF-8"))))
      val q = spark.readStream.format("kafka-wire")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("topics", "t")
        .option("startingOffsets", "earliest")
        .option("isolation.level", "read_committed")
        .load()
        .selectExpr("cast(payload as string) AS v")
        .writeStream.outputMode("append")
        .format("memory").queryName("k7_open_txn_sink").start()
      try {
        // the open txn must NOT wedge processAllAvailable: the LSO bounds
        // what latestOffset admits, so the stream drains and idles
        q.processAllAvailable()
        assert(spark.table("k7_open_txn_sink").collect()
          .map(_.getString(0)).toSeq == Seq("before"),
          "unstable data crossed the LSO into the stream")
        p.commit()
        q.processAllAvailable()
        assert(spark.table("k7_open_txn_sink").orderBy("v").collect()
          .map(_.getString(0)).toSeq == Seq("before", "pending"),
          "committing did not release the region to the next trigger")
      } finally q.stop()
    } finally { c.close(); srv.close() }
  }

  test("mixed-codec multi-batch produce keeps every batch's own codec on " +
      "the log (never re-labeled under the first batch's attributes)") {
    withBroker { (srv, c) =>
      c.metadata(Seq("t"))
      // one produce request carrying TWO batches with different codecs
      val b1 = KafkaWire.encodeBatch(
        Seq(KafkaWire.KRecord(0L, 1L, null, "plain".getBytes)),
        KafkaWire.Codec.None)
      val b2 = KafkaWire.encodeBatch(
        Seq(KafkaWire.KRecord(0L, 2L, null, "zipped".getBytes)),
        KafkaWire.Codec.Gzip)
      // hand-built produce v3 with the concatenated record set
      val w = new KafkaWire.Writer
      w.nullableStr(null).i16(-1).i32(30000)
      w.array(Seq("t")) { (ww, t) =>
        ww.str(t)
        ww.array(Seq(0))((www, p) => www.i32(p).nullableBytes(b1 ++ b2))
      }
      val sock = new java.net.Socket(srv.host, srv.port)
      try {
        val out = KafkaWire.buffered(sock.getOutputStream)
        KafkaWire.writeRequest(out, KafkaWire.Api.Produce, 3, 1, "spec",
          w.result())
        out.flush()
        val (_, body) = KafkaWire.readResponse(
          KafkaWire.buffered(sock.getInputStream))
        val r = new KafkaWire.Reader(body)
        r.arrayCount(); r.str(); r.arrayCount(); r.i32()
        assert(r.i16v() == KafkaWire.Err.None)
      } finally sock.close()
      assert(srv.storedBatchCodecs("t", 0) ==
        Seq(KafkaWire.Codec.None, KafkaWire.Codec.Gzip),
        s"codecs: ${srv.storedBatchCodecs("t", 0)}")
      assert(values(c.fetch("t", 0, 0L)._2) == Seq("plain", "zipped"))
    }
  }
}
