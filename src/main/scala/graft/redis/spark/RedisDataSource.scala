package graft.redis.spark

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Envelope
import graft.redis.{RedisClient, RedisStreams, Resp}
import graft.ss.spark.SsRows

/** `spark.readStream.format("redis-stream")` — live micro-batch consumer
  * over Redis Streams, the reference's XREAD loop re-expressed in Spark's
  * offset model (sea-streamer-redis/src/consumer/node.rs:448-610):
  *
  *   - an offset is the last-delivered entry id per `stream:shard` key;
  *   - latestOffset asks each key for its tip (`XREVRANGE key + - COUNT 1`);
  *   - each micro-batch reads `(lastId, tip]` per key with exclusive-start
  *     XRANGE — one partition per key, executor-side connections, so 32k
  *     shard keys fan out to 32k parallel tasks;
  *   - `startingOffsets` earliest replays from 0-0, latest anchors at each
  *     key's current tip (AutoStreamReset law).
  *
  * Delivery is at-least-once under the checkpoint like every Spark source;
  * ack/commit is the checkpointed epoch (SURVEY §2.6 mapping).
  *
  * Options: `host`, `port`, `streams` (comma-separated), `shards` (per
  * stream; keys are `stream:N`, or the bare stream when shards=1).
  */
class RedisDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "redis-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Envelope.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = true
}

class RedisTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"redis-stream:${options.get("host")}:${options.get("streams")}"
  override def schema(): StructType = Envelope.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    val all = new CaseInsensitiveStringMap(merged)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Envelope.schema
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new RedisMicroBatchStream(all)
      }
    }
  }
}

/** `{"ids":{"<key>":"<ms>-<seq>"}}`; "0-0" = nothing delivered yet. */
final case class RedisOffset(ids: Map[String, String]) extends Offset {
  override def json(): String =
    ids.toSeq.sorted
      .map { case (k, v) => s""""${k}":"${v}"""" }
      .mkString("{\"ids\":{", ",", "}}")
}

object RedisOffset {
  /** Keys are redis stream names ([a-zA-Z0-9._-] plus the `:shard` suffix),
    * which cannot contain `"` or `,` — so pairs split on `,` and each pair
    * on the `":"` QUOTE-colon-QUOTE separator (a bare ':' inside the key,
    * e.g. `events:3`, never matches it).
    */
  def fromJson(json: String): RedisOffset = {
    val inner = json.trim.stripPrefix("{\"ids\":{").stripSuffix("}}")
    if (inner.isEmpty) RedisOffset(Map.empty)
    else RedisOffset(inner.split(',').map { pair =>
      val sep = pair.indexOf("\":\"")
      if (sep < 0)
        throw new IllegalArgumentException(s"bad RedisOffset pair: $pair")
      pair.substring(0, sep).stripPrefix("\"") ->
        pair.substring(sep + 3).stripSuffix("\"")
    }.toMap)
  }
}

final case class RedisInputPartition(
    host: String, port: Int, key: String, stream: String, shard: Long,
    afterId: String, untilId: String, batch: Int) extends InputPartition

class RedisMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val host = Option(options.get("host")).getOrElse("127.0.0.1")
  private val port = options.getInt("port", 6379)
  private val streams = Option(options.get("streams"))
    .getOrElse(throw new IllegalArgumentException(
      "redis-stream requires a `streams` option"))
    .split(',').map(_.trim).filter(_.nonEmpty).toSeq
  private val shards = options.getInt("shards", 1)
  private val batch = options.getInt("batchSize", 1000)

  private def keys: Seq[(String, String, Long)] =
    streams.flatMap(st => (0L until shards.toLong).map(sh =>
      (RedisStreams.shardedKey(st, sh, shards > 1), st, sh)))

  /** All tips in ONE pipelined flush — 32k shard keys cost one round trip
    * per micro-batch, not 32k serialized ones.
    */
  private def tips(): Map[String, String] = {
    val client = new RedisClient(host, port)
    try {
      val ks = keys
      val replies = client.pipeline(ks.map { case (k, _, _) =>
        Seq("XREVRANGE", k, "+", "-", "COUNT", "1")
          .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
      ks.zip(replies).map {
        case ((k, _, _), Resp.Arr(Seq(Resp.Arr(Seq(id: Resp.Bulk, _))))) =>
          k -> id.utf8
        case ((k, _, _), _) => k -> "0-0"
      }.toMap
    } finally client.close()
  }

  override def initialOffset(): Offset = {
    val latest = options.getOrDefault("startingOffsets", "earliest")
      .equalsIgnoreCase("latest")
    if (!latest) RedisOffset(keys.map { case (k, _, _) => k -> "0-0" }.toMap)
    else RedisOffset(tips())
  }

  override def latestOffset(): Offset = RedisOffset(tips())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RedisOffset].ids
    val e = end.asInstanceOf[RedisOffset].ids
    keys.flatMap { case (k, stream, shard) =>
      val after = s.getOrElse(k, "0-0")
      val until = e.getOrElse(k, "0-0")
      if (after == until) None
      else Some(RedisInputPartition(host, port, k, stream, shard,
        after, until, batch))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new RedisPartitionReader(p.asInstanceOf[RedisInputPartition])
    }

  override def deserializeOffset(json: String): Offset = RedisOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Paged exclusive-start XRANGE over `(afterId, untilId]` — the page cursor
  * is the RAW last entry id (a packed-seq reconstruction loses sub-sequence
  * bits past 64k entries/ms and would loop).
  */
class RedisPartitionReader(p: RedisInputPartition)
    extends PartitionReader[InternalRow] {

  private val client = new RedisClient(p.host, p.port)
  private var page: Iterator[(String, graft.core.SeaMessage)] = Iterator.empty
  private var cursor = if (p.afterId == "0-0") "-" else s"(${p.afterId}"
  private var exhausted = false
  private var current: graft.core.SeaMessage = _

  private def fetch(): Unit = {
    val entries = RedisStreams.decodeEntriesWithIds(
      client.command(RedisStreams.xrange(p.key, cursor, p.untilId,
        Some(p.batch)): _*),
      p.stream, p.shard)
    if (entries.isEmpty) exhausted = true
    else {
      cursor = s"(${entries.last._1}"
      if (entries.size < p.batch) exhausted = true
      page = entries.iterator
    }
  }

  override def next(): Boolean = {
    if (!page.hasNext && !exhausted) fetch()
    if (page.hasNext) { current = page.next()._2; true } else false
  }

  override def get(): InternalRow = SsRows.toInternalRow(current)
  override def close(): Unit = client.close()
}
