package graft.redis

import org.scalatest.funsuite.AnyFunSuite

/** Direct laws of the ONE redis-destination commit protocol
  * ([[EosCommit]]) — the engine specs (pump/relay/ship) pin it
  * end-to-end; these pin the round-17 ADVICE closures at the protocol
  * seam itself.
  */
class EosCommitSpec extends AnyFunSuite {

  private def dstKey = RedisStreams.shardedKey("ec", 0L, sharded = true)

  private def entriesOf(srv: EmbeddedRedis): Seq[String] =
    srv.entries(dstKey).map(e => new String(e._2.head._2, "UTF-8"))

  private def ledgerOf(srv: EmbeddedRedis, name: String): Option[Long] =
    srv.kvGet(name).map(new String(_, "UTF-8").toLong)

  test("advance-only commits watch the LEDGER alone: a legal foreign " +
      "producer appending to the destination key in every pre-EXEC " +
      "window cannot nil a pure cursor advance (ADVICE r16 — the old " +
      "dstKey watch tripped maxNils with no batch to shrink)") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    val foreign = new RedisClient(srv.host, srv.port)
    try {
      var pushes = 0
      def hook(): Unit = {
        pushes += 1
        foreign.command(RedisStreams.xadd(dstKey, 5000L + pushes,
          s"f$pushes".getBytes("UTF-8")): _*)
        graft.ops.Failpoints.armHook("ec-adv")(() => hook())
      }
      graft.ops.Failpoints.armHook("ec-adv")(() => hook())
      // maxNils=1: ONE nil fails the law — the ledger-only watch must
      // make the foreign append invisible to the advance
      val n = EosCommit.commit(rc, "ecl", dstKey, Vector.empty,
        finalCursor = 10L, label = "adv", raceBeforeExec = Some("ec-adv"),
        maxNils = 1)
      assert(n == 0L)
      assert(ledgerOf(srv, "ecl").contains(10L), "advance did not land")
      assert(pushes == 1, s"one EXEC window expected, saw $pushes")
    } finally { rc.close(); foreign.close(); srv.close() }
  }

  test("mid-call de-escalation: when a rival's cursor already covers " +
      "every entry and only the trailing advance pends, the key watch " +
      "drops and foreign appends still cannot nil it") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    val foreign = new RedisClient(srv.host, srv.port)
    try {
      // rival state: cursor past both entries but short of finalCursor
      rc.command(RedisStreams.set("ecl2", "3"): _*)
      var pushes = 0
      def hook(): Unit = {
        pushes += 1
        foreign.command(RedisStreams.xadd(dstKey, 6000L + pushes,
          s"g$pushes".getBytes("UTF-8")): _*)
        graft.ops.Failpoints.armHook("ec-deesc")(() => hook())
      }
      graft.ops.Failpoints.armHook("ec-deesc")(() => hook())
      val n = EosCommit.commit(rc, "ecl2", dstKey,
        Vector((1L, 100L, "a".getBytes("UTF-8")),
          (2L, 101L, "b".getBytes("UTF-8"))),
        finalCursor = 9L, label = "deesc",
        raceBeforeExec = Some("ec-deesc"), maxNils = 1)
      assert(n == 0L, "a rival's share must not count as ours")
      assert(ledgerOf(srv, "ecl2").contains(9L))
      assert(entriesOf(srv).forall(_.startsWith("g")),
        "covered entries must not re-apply")
    } finally { rc.close(); foreign.close(); srv.close() }
  }

  test("a refused ledger read fails LOUD, never as cursor 0: a foreign " +
      "process squatting the ledger name with a stream makes GET reply " +
      "WRONGTYPE — treating that as 0 would re-ship the whole batch " +
      "(silent exactly-once violation, round-17 review)") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    try {
      // squat the ledger name with a stream: GET now replies WRONGTYPE
      rc.command(RedisStreams.xadd("ecl4", 100L, "squat".getBytes("UTF-8")): _*)
      val e = intercept[IllegalStateException] {
        EosCommit.commit(rc, "ecl4", dstKey,
          Vector((0L, 100L, "a".getBytes("UTF-8"))),
          finalCursor = 1L, label = "squat")
      }
      assert(e.getMessage.contains("ledger GET refused"), e.getMessage)
      assert(entriesOf(srv).isEmpty, "nothing may land on a refused read")
    } finally { rc.close(); srv.close() }
  }

  test("a refused destination tip probe fails LOUD with the protocol's " +
      "own diagnostic: a foreign process squatting the destination key " +
      "with a string makes XREVRANGE reply WRONGTYPE — that must read " +
      "'tip probe refused', not leak a decoder error (round-17 advice)") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    try {
      rc.command(RedisStreams.set(dstKey, "squatter"): _*)
      val e = intercept[IllegalStateException] {
        EosCommit.commit(rc, "ecl5", dstKey,
          Vector((0L, 100L, "a".getBytes("UTF-8"))),
          finalCursor = 1L, label = "tipsquat")
      }
      assert(e.getMessage.contains("tip probe refused"), e.getMessage)
      assert(ledgerOf(srv, "ecl5").isEmpty,
        "nothing may land on a refused probe")
    } finally { rc.close(); srv.close() }
  }

  test("the batch limit regrows after a landed commit: an early " +
      "contention burst must not degrade the rest of the drain to " +
      "single-entry transactions (ADVICE r16) — pre-EXEC windows stay " +
      "near 2·log2(n) + burst, not n") {
    val srv = new EmbeddedRedis
    val rc = new RedisClient(srv.host, srv.port)
    val foreign = new RedisClient(srv.host, srv.port)
    try {
      var windows = 0
      def hook(): Unit = {
        windows += 1
        // contend the first 6 windows only — then count quietly
        if (windows <= 6)
          foreign.command(RedisStreams.xadd(dstKey, 7000L + windows,
            s"h$windows".getBytes("UTF-8")): _*)
        graft.ops.Failpoints.armHook("ec-regrow")(() => hook())
      }
      graft.ops.Failpoints.armHook("ec-regrow")(() => hook())
      val entries = (0 until 64).map(i =>
        (i.toLong, 100L + i, s"e$i".getBytes("UTF-8"))).toVector
      val n = EosCommit.commit(rc, "ecl3", dstKey, entries,
        finalCursor = 64L, label = "regrow",
        raceBeforeExec = Some("ec-regrow"))
      assert(n == 64L)
      assert(entriesOf(srv).filter(_.startsWith("e")) ==
        (0 until 64).map("e" + _), "exactly-once order violated")
      // 6 nils shrink 64→1; regrow lands 1,2,4,8,16,32,1 → ~13 windows.
      // Without regrow the tail runs at limit 1: 6 + 58 = 64 windows.
      assert(windows <= 20,
        s"$windows pre-EXEC windows — the limit did not regrow")
      val ids = srv.entries(dstKey).map(e => RedisStreams.parseEntryId(e._1))
      assert(ids == ids.sorted, s"non-monotone ids: $ids")
    } finally { rc.close(); foreign.close(); srv.close() }
  }
}
