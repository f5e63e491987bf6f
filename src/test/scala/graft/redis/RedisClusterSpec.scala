package graft.redis

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Cluster routing law (cluster.rs:1-135): a MOVED reply re-routes the
  * command to the named node, the ownership is cached, and later commands
  * for the key go straight to the owner.
  */
class RedisClusterSpec extends AnyFunSuite {

  test("MOVED redirects are followed and cached per key") {
    val owner = new EmbeddedRedis
    val seed = new EmbeddedRedis
    try {
      seed.redirects = Map("hot:0" -> s"${owner.host}:${owner.port}")
      val cluster = new RedisClusterClient(Seq((seed.host, seed.port)))
      try {
        // first command bounces off the seed, lands on the owner
        cluster.command("hot:0",
          RedisStreams.xadd("hot:0", 1000L, "a".getBytes(UTF_8)): _*)
        assert(cluster.ownerOf("hot:0").contains((owner.host, owner.port)))
        assert(owner.entries("hot:0").size == 1, "entry must land on the owner")
        assert(seed.entries("hot:0").isEmpty)

        // cached ownership: subsequent reads hit the owner directly
        val msgs = RedisStreams.decodeEntries(
          cluster.command("hot:0", RedisStreams.xrange("hot:0"): _*),
          "hot", 0L)
        assert(msgs.map(m => new String(m.payload, UTF_8)) == Seq("a"))

        // un-redirected keys stay on the seed
        cluster.command("cold:0",
          RedisStreams.xadd("cold:0", 1000L, "b".getBytes(UTF_8)): _*)
        assert(seed.entries("cold:0").size == 1)
        assert(cluster.ownerOf("cold:0").contains((seed.host, seed.port)))
      } finally cluster.close()
    } finally { owner.close(); seed.close() }
  }

  test("non-MOVED errors propagate; redirect loops are bounded") {
    val a = new EmbeddedRedis
    val b = new EmbeddedRedis
    try {
      // a and b bounce the key to each other forever
      a.redirects = Map("loop:0" -> s"${b.host}:${b.port}")
      b.redirects = Map("loop:0" -> s"${a.host}:${a.port}")
      val cluster = new RedisClusterClient(Seq((a.host, a.port)))
      try {
        val e = intercept[RedisClient.RedisError] {
          cluster.command("loop:0",
            RedisStreams.xadd("loop:0", 1L, "x".getBytes(UTF_8)): _*)
        }
        assert(e.msg.startsWith("MOVED"))
        val e2 = intercept[RedisClient.RedisError] {
          cluster.command("ok:0", "NOPE".getBytes(UTF_8))
        }
        assert(e2.msg.contains("unknown command"))
      } finally cluster.close()
    } finally { a.close(); b.close() }
  }
}
