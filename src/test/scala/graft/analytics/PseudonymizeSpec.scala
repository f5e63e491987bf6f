package graft.analytics

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** a7_pseudonymize + t25_stream_pseudonymize laws. a7 de-identifies a
  * structured event log: salted-hash pseudonyms keep the log joinable
  * while the raw id leaves the dataset, digits are masked char-level in
  * the payload, and the email/IPv4/digit-run battery is counted per row.
  * The 100 TB shape is the law worth pinning: ONE map-only codegen'd
  * projection — no shuffle, no join, no UDF — so the scan is the cost.
  */
class PseudonymizeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def a7() = TextAnalysis.queries("a7_pseudonymize")(spark, dir)

  test("a7 plan law: map-only — zero exchanges, zero joins, one scan, " +
      "whole-stage codegen (no UDF breaks the pipeline)") {
    val plan = a7().queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("Exchange"), s"a7 shuffles:\n$s")
    assert(!s.contains("Join"), s"a7 joins:\n$s")
    assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"),
      s"a7 left codegen for a UDF:\n$s")
    // the `*(n)` prefix is the whole-stage-codegen marker in the plan's
    // string form; the scan must also prune to exactly the 3 used columns
    assert(s.contains("*(1) Project"), s"a7 not codegen'd:\n$s")
    assert(s.contains("ReadSchema: struct<event_id:bigint,user_id:bigint," +
      "props:string>"), s"a7 scan not pruned to 3 columns:\n$s")
  }

  test("a7 pseudonym law: consistent per user (joins survive), " +
      "collision-free on the id domain, and never the raw id") {
    val out = a7().cache()
    try {
      val events = Tables(spark, dir).events
        .select(col("event_id"), col("user_id"))
      val joined = out.join(events, "event_id")
      // one pseudonym per user id, one user id per pseudonym
      assert(joined.groupBy("user_id")
        .agg(countDistinct("pseudo_user").as("n"))
        .filter(col("n") =!= 1L).count() == 0L, "pseudonym not consistent")
      assert(joined.groupBy("pseudo_user")
        .agg(countDistinct("user_id").as("n"))
        .filter(col("n") =!= 1L).count() == 0L, "pseudonym collision")
      // 16 lowercase hex chars, never equal to the raw id's string form
      assert(out.filter(!col("pseudo_user").rlike("^[0-9a-f]{16}$"))
        .count() == 0L, "pseudonym shape")
      assert(joined.filter(col("pseudo_user") ===
        col("user_id").cast("string")).count() == 0L)
    } finally out.unpersist()
  }

  test("a7 masking law: masked payload carries no digit, length is " +
      "preserved (char-level), and the battery counted what it masked") {
    val out = a7()
    val events = Tables(spark, dir).events
      .select(col("event_id"), col("props"))
    val j = out.join(events, "event_id")
    assert(j.filter(col("props_masked").rlike("[0-9]")).count() == 0L,
      "a digit survived the scrub")
    assert(j.filter(length(col("props_masked")) =!= length(col("props")))
      .count() == 0L, "masking changed payload length")
    // rows whose payload had a digit run are exactly the has_pii rows here
    // (emails/ipv4 don't occur in this corpus — their zero counts are the
    // clean-corpus receipt, not the exercise; digit runs are the exercise)
    assert(j.filter(col("props").rlike("[0-9]") =!= col("has_pii"))
      .count() == 0L, "has_pii disagrees with the payload")
  }

  test("a8 k-anonymity laws: every event accounted exactly once across " +
      "the lattice, k holds on every released group, suppression is " +
      "loud, and the plan joins nothing") {
    val out = TextAnalysis.queries("a8_k_anonymity")(spark, dir).cache()
    try {
      val k = 50L
      val total = Tables(spark, dir).events.count()
      // accounting: level-0 groups + level-1 regroups partition the log
      assert(out.agg(sum("n")).head().getLong(0) == total,
        "lattice lost or double-counted events")
      // k law: released (unsuppressed) groups are crowds of >= k; every
      // sub-k group is flagged, never silently dropped
      assert(out.filter(!col("suppressed") && col("n") < k).count() == 0L)
      assert(out.filter(col("suppressed") &&
        (col("n") >= k || col("level") =!= 1)).count() == 0L)
      // level-0 released at hour granularity, level-1 at day: a level-1
      // bucket is always midnight-aligned
      assert(out.filter(col("level") === 1 &&
        pmod(col("bucket_epoch"), lit(86400L)) =!= 0L).count() == 0L)
      // group-sized output: the report is bounded by the QI grid (types ×
      // hour buckets + types × day buckets), never by the event count —
      // the scales-as-groups claim (at sf0.001 the grid itself is ~15% of
      // the log; at sf1 it is ~0.1%)
      val grid = Tables(spark, dir).events
        .select(col("event_type"), date_trunc("hour", col("ts"))).distinct()
        .count() +
        Tables(spark, dir).events
          .select(col("event_type"), date_trunc("day", col("ts"))).distinct()
          .count()
      assert(out.count() <= grid && out.count() < total,
        "a8 output is event-sized, not group-sized")
      // plan law: two hash-agg rungs, no join, no window
      val s = out.queryExecution.executedPlan.toString
      assert(!s.contains("Join") && !s.contains("Window"),
        s"a8 plan joins/windows:\n$s")
    } finally out.unpersist()
  }

  test("a9 dp-release laws: true counts never leave, noise is real and " +
      "per-group, the release is replayable, the plan is one hash-agg") {
    val rel = TextAnalysis.queries("a9_dp_release")(spark, dir)
    // the release schema carries NO raw count — the privacy contract
    assert(rel.columns.toSeq == Seq("event_type", "epsilon", "n_noisy"))
    val truth = Tables(spark, dir).events
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
    val j = rel.join(truth, "event_type")
      .select(col("event_type"), (col("n_noisy") - col("n_true")).as("z"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // every group is actually perturbed, within Laplace(1)'s practical
    // range (the 52-bit seed cannot reach the ±36 tail), and the seeded
    // draws differ across groups
    assert(j.forall { case (_, z) => z != 0.0 && math.abs(z) < 36.0 },
      s"noise out of range: ${j.toSeq}")
    assert(j.map(_._2).distinct.length == j.length, "noise reused across groups")
    // replayable: the seeded mechanism is deterministic run-to-run
    val again = TextAnalysis.queries("a9_dp_release")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(rel.collect().map(_.toSeq).toSet == again)
    // plan: one hash-agg rung, no join, no window; noise math is
    // projection-side
    val s = rel.queryExecution.executedPlan.toString
    assert(!s.contains("Join") && !s.contains("Window"),
      s"a9 plan joins/windows:\n$s")
  }

  test("t26 ingest k-anonymity audit == a8 batch audit bit-for-bit " +
      "after end-of-log") {
    val streamRows = Transport.queries("t26_stream_k_anonymity")(spark, dir)
      .orderBy("event_type", "bucket_epoch", "level")
      .collect().map(_.toSeq).toSeq
    val batchRows = TextAnalysis.queries("a8_k_anonymity")(spark, dir)
      .orderBy("event_type", "bucket_epoch", "level")
      .collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t26 returned no rows")
    assert(streamRows == batchRows,
      "the live audit diverged from the batch lattice")
  }

  test("t25 ingest scrub == a7 batch scrub, multi-batch, zero state") {
    var batches = 0
    var stateRows = -1L
    val out = Transport.t25PseudonymizeStream(spark, dir, q => {
      batches = q.recentProgress.count(_.numInputRows > 0)
      stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    })
    val streamRows = out.orderBy("event_id").collect().map(_.toSeq).toSeq
    val batchRows = a7().orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t25 returned no rows")
    assert(streamRows == batchRows,
      "ingest-time scrub diverged from the batch scrub")
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    assert(stateRows == 0L,
      s"the stateless scrub stage held $stateRows state rows")
  }

  test("t28 ingest dp release == a9 batch release bit-for-bit after " +
      "end-of-log") {
    val streamRows = Transport.queries("t28_stream_dp_release")(spark, dir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val batchRows = TextAnalysis.queries("a9_dp_release")(spark, dir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t28 returned no rows")
    assert(streamRows == batchRows,
      "the live release diverged from the batch release")
  }
}
