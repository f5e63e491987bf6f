package graft

/** Test-scope helper main: park all three embedded brokers on ephemeral
  * ports and write `kafka=<p> redis=<p> iggy=<p>` to the given file, then
  * hold them open for N seconds — the stand-in endpoint set that lets
  * [[LiveBrokerSpec]] be exercised end-to-end in the sandbox:
  *
  * {{{
  * sbt "Test/runMain graft.BrokerPark /tmp/park.txt 90" &   # brokers up
  * eval $(awk '{print "KAFKA_BROKERS_URL=kafka://127.0.0.1:"$1 ...}' ...)
  * KAFKA_BROKERS_URL=... sbt "testOnly graft.LiveBrokerSpec"
  * }}}
  *
  * The day a real broker exists, skip this and set BROKERS_URL directly.
  */
object BrokerPark {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val holdSec = if (args.length > 1) args(1).toInt else 60
    val k = new kafka.EmbeddedKafka
    val r = new redis.EmbeddedRedis
    val i = new iggy.EmbeddedIggy
    // a two-node cluster topology split at the slot midpoint, for the
    // REDIS_CLUSTER_BROKERS_URL leg
    val ca = new redis.EmbeddedRedis
    val cb = new redis.EmbeddedRedis
    val mid = redis.RedisCluster.HashSlots / 2
    val slots = Seq((0, mid - 1, ca.host, ca.port),
      (mid, redis.RedisCluster.HashSlots - 1, cb.host, cb.port))
    ca.slots = slots
    cb.slots = slots
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"kafka=${k.port} redis=${r.port} iggy=${i.port} " +
          s"rediscluster=${ca.host}:${ca.port},${cb.host}:${cb.port}\n")
      println(s"[park] kafka=${k.port} redis=${r.port} iggy=${i.port} " +
        s"rediscluster=${ca.host}:${ca.port},${cb.host}:${cb.port}")
      Thread.sleep(holdSec * 1000L)
    } finally { k.close(); r.close(); i.close(); ca.close(); cb.close() }
  }
}
