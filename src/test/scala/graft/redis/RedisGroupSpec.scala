package graft.redis

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Group delivery laws (consumer/node.rs:348-430,647-744): balanced
  * delivery, at-least-once until XACK, failover via XAUTOCLAIM.
  */
class RedisGroupSpec extends AnyFunSuite {

  private def seed(srv: EmbeddedRedis, n: Int): Unit = {
    val c = new RedisClient(srv.host, srv.port)
    try c.pipeline((0 until n).map(i =>
      RedisStreams.xadd("g:0", 1000L + i, s"m$i".getBytes(UTF_8))))
    finally c.close()
  }

  private def payloads(ms: Seq[RedisGroupConsumer.Delivered]): Seq[String] =
    ms.map(d => new String(d.message.payload, UTF_8))

  test("XREADGROUP partitions undelivered entries across group members") {
    val srv = new EmbeddedRedis
    try {
      seed(srv, 20)
      val c1 = new RedisGroupConsumer(srv.host, srv.port, "g", 0, true, "grp", "c1")
      val c2 = new RedisGroupConsumer(srv.host, srv.port, "g", 0, true, "grp", "c2")
      try {
        c1.create()
        val b1 = c1.fetch(10)
        val b2 = c2.fetch(100)
        assert(payloads(b1) == (0 until 10).map(i => s"m$i"))
        assert(payloads(b2) == (10 until 20).map(i => s"m$i"),
          "second member must get only undelivered entries")
        assert(c1.fetch(10).isEmpty, "nothing undelivered remains")
      } finally { c1.close(); c2.close() }
    } finally srv.close()
  }

  test("unacked entries stay pending; ack settles them") {
    val srv = new EmbeddedRedis
    try {
      seed(srv, 10)
      val c1 = new RedisGroupConsumer(srv.host, srv.port, "g", 0, true, "grp", "c1")
      try {
        c1.create()
        val batch = c1.fetch(10)
        c1.ack(batch.take(4))
        val still = c1.pending(100)
        assert(payloads(still) == (4 until 10).map(i => s"m$i"))
        assert(c1.ack(batch.drop(4)) == 6)
        assert(c1.pending(100).isEmpty)
        assert(srv.pendingIds("g:0", "grp").isEmpty)
      } finally c1.close()
    } finally srv.close()
  }

  test("auto-claim steals a dead member's pending entries (failover)") {
    val srv = new EmbeddedRedis
    try {
      seed(srv, 8)
      val dead = new RedisGroupConsumer(srv.host, srv.port, "g", 0, true, "grp", "dead")
      val live = new RedisGroupConsumer(srv.host, srv.port, "g", 0, true, "grp", "live")
      try {
        dead.create()
        val lost = dead.fetch(5) // delivered but never acked
        assert(lost.size == 5)
        dead.close()

        val claimed = live.claimStale(0L)
        assert(payloads(claimed) == (0 until 5).map(i => s"m$i"))
        live.ack(claimed)
        val rest = live.fetch(100)
        live.ack(rest)
        assert(srv.pendingIds("g:0", "grp").isEmpty)
        assert(srv.ackedIds("g:0", "grp").size == 8, "every entry settled once")
      } finally live.close()
    } finally srv.close()
  }
}
