package graft.redis

import java.nio.charset.StandardCharsets.UTF_8

import graft.TestSession
import graft.facade.SeaStreamer
import graft.facade.SeaStreamer.{ConsumerMode, ConsumerOptions}
import org.scalatest.funsuite.AnyFunSuite

/** Redis shared-shard load balancing through the facade — the reference's
  * laws (sea-streamer-redis/tests/load-balanced.rs:18-160, resumable.rs):
  * group members split the stream first-ask-first-served via the
  * server-side group cursor (NOT by any client-side filter), a member's
  * fresh unacked deliveries are protected from claim by the 60 s idle
  * default, and a failover member with a zero idle threshold reclaims a
  * dead sibling's pending entries.
  */
class RedisLoadBalancedSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def send(srv: EmbeddedRedis, from: Int, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((from until from + n).map(i =>
      RedisStreams.xadd("lb", 300000L + i, s"b$i".getBytes(UTF_8))))
    finally c.close()
  }

  test("members share the group cursor; fresh pending is claim-protected; stale pending fails over") {
    import spark.implicits._
    val srv = new EmbeddedRedis
    try {
      send(srv, 0, 100)
      val conn = SeaStreamer.connect(s"redis://${srv.host}:${srv.port}", spark)
      def opts(member: String) =
        ConsumerOptions(mode = ConsumerMode.LoadBalanced,
          group = Some("lbg"),
          autoStreamReset = SeaStreamer.AutoStreamReset.Earliest,
          consumerId = Some(member))
      def drain(member: String, sink: String,
          claimIdleMs: Option[Long] = None): Set[String] = {
        val base = conn.createConsumer(Seq("lb"), opts(member))
        val df = claimIdleMs match {
          // rebuild with an explicit idle threshold for the failover member
          case Some(ms) => spark.readStream.format("redis-stream")
            .option("host", srv.host).option("port", srv.port.toString)
            .option("streams", "lb").option("startingOffsets", "earliest")
            .option("group", "lbg").option("consumerName", member)
            .option("claimMinIdleMs", ms.toString)
            .load()
          case None => base
        }
        val q = df.writeStream.outputMode("append")
          .format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
        spark.table(sink).select($"payload".cast("string")).as[String]
          .collect().toSet
      }

      // member A takes the whole first wave (first-ask-first-served)
      val a = drain("member-a", "lb_sink_a")
      assert(a == (0 until 100).map(i => s"b$i").toSet)
      val pendingAfterA = srv.pendingIds("lb", "lbg")
      assert(pendingAfterA.nonEmpty, "A's final batch is unacked (Rolling lag)")
      assert(pendingAfterA.values.forall(_ == "member-a"))

      // member B joins the SAME group: the server-side cursor hands it only
      // the second wave — A's work is not repeated, and A's fresh unacked
      // deliveries are NOT claimable (60 s idle default)
      send(srv, 100, 50)
      val b = drain("member-b", "lb_sink_b")
      assert(b == (100 until 150).map(i => s"b$i").toSet,
        "B must continue from the shared group cursor, nothing more")
      assert(srv.pendingIds("lb", "lbg").values.toSet
        .contains("member-a"), "A's pending survived B's run")

      // union-of-receipts law: every message delivered to exactly one member
      assert((a ++ b) == (0 until 150).map(i => s"b$i").toSet)
      assert((a & b).isEmpty)

      // failover: a member with idle threshold 0 treats its siblings as
      // dead and reclaims exactly the stranded pending entries (A's and
      // B's unacked tails) — nothing else
      val strandedIds = srv.pendingIds("lb", "lbg").keySet
      assert(strandedIds.nonEmpty)
      val c = drain("member-c", "lb_sink_c", claimIdleMs = Some(0L))
      val strandedPayloads = srv.entries("lb")
        .filter { case (id, _) => strandedIds.contains(id) }
        .map { case (_, fields) => new String(fields.head._2, UTF_8) }.toSet
      assert(c == strandedPayloads,
        s"failover member must re-deliver exactly the stranded PEL, got $c")
    } finally srv.close()
  }
}
