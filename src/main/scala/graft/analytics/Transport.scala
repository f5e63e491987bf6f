package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transport-path queries: drive the `.ss` DataSource end-to-end inside the
  * correctness gate. Each query replays the `events` table through the
  * envelope (write → read → decode payload → aggregate) so the DuckDB oracle
  * on the raw parquet checks the whole codec + source/sink path.
  */
object Transport {

  private def scratch(dir: String, tag: String): String =
    s"/tmp/graft/${tag}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** events → envelope rows (key = event_type, shard = user_id % 4,
    * seq = event_id, payload = JSON of (event_id, value)).
    */
  private def envelopeOf(t: Tables): DataFrame =
    t.events.select(
      col("event_type").as("stream_key"),
      pmod(col("user_id"), lit(4)).cast("long").as("shard_id"),
      col("event_id").as("sequence"),
      col("ts").as("timestamp"),
      to_json(struct(col("event_id"), col("value"))).cast("binary").as("payload"))

  /** `distinct` is batch-only in streaming aggs, so it's optional here. */
  private def aggregate(envelope: DataFrame, withDistinct: Boolean): DataFrame = {
    val base = envelope
      .withColumn("j",
        from_json(col("payload").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL("event_id LONG, value DOUBLE")))
      .groupBy("stream_key")
    val common = Seq(
      count(lit(1)).as("n"),
      sum(col("j.value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      max(col("j.event_id")).as("max_event_id"))
    val aggs =
      if (withDistinct) common :+ countDistinct(col("shard_id")).as("n_shards")
      else common
    base.agg(aggs.head, aggs.tail: _*)
  }

  private def aggregateOracle(withDistinct: Boolean) = {
    val distinctCol =
      if (withDistinct) ",\n  CAST(COUNT(DISTINCT user_id % 4) AS BIGINT) AS n_shards"
      else ""
    s"""SELECT event_type AS stream_key, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       |  MAX(event_id) AS max_event_id$distinctCol
       |FROM events GROUP BY event_type""".stripMargin
  }

  val queries: Map[String, Relational.Q] = Map(
    // Batch path: ss sink (one part per task) → beacon-split ss scan.
    "t1_ss_roundtrip" -> { (s, dir) =>
      val t = Tables(s, dir)
      val out = scratch(dir, "ssrt")
      envelopeOf(t).write.format("ss").mode("overwrite").save(out)
      aggregate(s.read.format("ss").load(out), withDistinct = true)
    },

    // Streaming path: same data through the MicroBatchStream (frame-exact
    // offsets) into a memory sink, drained synchronously.
    "t2_ss_stream" -> { (s, dir) =>
      val t = Tables(s, dir)
      val out = scratch(dir, "ssstream")
      envelopeOf(t).write.format("ss").mode("overwrite").save(out)
      val q = aggregate(s.readStream.format("ss").load(out), withDistinct = false)
        .writeStream.outputMode("complete")
        .format("memory").queryName("t2_ss_stream_sink")
        .start()
      try q.processAllAvailable() finally q.stop()
      s.table("t2_ss_stream_sink")
    },

    // Fuse merge (batch form): split events into one stream per type, merge
    // back in global (timestamp, key, seq) order, stamp positions.
    "t3_fuse_merge" -> { (s, dir) =>
      val env = envelopeOf(Tables(s, dir))
      val streams = Seq("click", "view", "purchase", "signup", "error")
        .map(k => env.filter(col("stream_key") === k))
      val merged = graft.ops.StreamJoin.merge(streams)
      merged.select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("timestamp"), col("stream_key"), col("sequence")))
          .cast("long").as("position"),
        unix_micros(col("timestamp")).as("ts_us"),
        col("stream_key"), col("sequence"))
    },

    // Producer-side sharding laws: round-robin (seq % n) and hash sharder
    // (xxhash64 has no DuckDB twin, so assert its invariants instead).
    "t4_sharders" -> { (s, dir) =>
      val env = envelopeOf(Tables(s, dir))
      val rr = graft.ops.Sharders.applyShard(env,
        graft.ops.Sharders.roundRobin(3))
      rr.groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n"), max(col("sequence")).as("max_seq"))
    })

  val oracles: Map[String, String] = Map(
    "t1_ss_roundtrip" -> aggregateOracle(withDistinct = true),
    "t2_ss_stream" -> aggregateOracle(withDistinct = false),
    "t3_fuse_merge" ->
      """SELECT ROW_NUMBER() OVER (ORDER BY epoch_us(date_trunc('microseconds', ts)),
        |                          event_type, event_id) AS position,
        |  epoch_us(date_trunc('microseconds', ts)) AS ts_us,
        |  event_type AS stream_key, event_id AS sequence
        |FROM events""".stripMargin,
    "t4_sharders" ->
      """SELECT event_id % 3 AS shard_id, COUNT(*) AS n,
        |  MAX(event_id) AS max_seq
        |FROM events GROUP BY 1""".stripMargin)
}
