package graft.analytics

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("chunkWindows covers every token with the pinned stride/overlap") {
    import spark.implicits._
    // 100 tokens at stride 48 / size 64 → 3 chunks: [0,64), [48,100), [96,100)
    val text = (0 until 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text), (8L, "solo")).toDF("doc_id", "text")
    val got = Pipeline.chunkWindows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(c => (c._1, c._2))
    val doc7 = got.filter(_._1 == 7L)
    assert(doc7.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 64L), (1L, 48L, 52L), (2L, 96L, 4L)))
    // overlap law: chunk i's last 16 tokens == chunk i+1's first 16
    val c0 = doc7(0)._5.split(" "); val c1 = doc7(1)._5.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // coverage law: the stride-prefixes of all chunks reassemble the doc
    assert(doc7.flatMap(c => c._5.split(" ").take(48)).toSeq ==
      (0 until 100).map(i => s"w$i"))
    // a short doc is exactly one whole-document chunk
    assert(got.filter(_._1 == 8L).toSeq == Seq((8L, 0L, 0L, 1L, "solo")))
  }

  test("bpeMerges learns frequency-weighted merges with deterministic ties") {
    import spark.implicits._
    // "banana" x3 + "bandana" x1 + "ab" x2; non-[a-z] words contribute no
    // symbols. The repeated-pair word pins the merge rule: canonical
    // leftmost non-overlapping application, so in ' b a n a n a ' BOTH
    // ' a n ' occurrences merge in one round (the rule the DuckDB oracle
    // replays via list_reduce).
    val docs = Seq(
      "banana banana banana bandana",
      "ab ab Zz 7x"
    ).toDF("text")
    val got = Pipeline.bpeMerges(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 1: (a,n) = 2x3 (banana) + 2 (bandana) = 8; beats (n,a) = 7.
    assert(got(0) == (1L, "a", "n", 8L))
    // banana -> ' b an an a ' (both occurrences), bandana -> ' b an d an a '.
    // round 2: (an,a) = 3+1 ties (b,an) = 3+1; 'an' < 'b' -> (an,a) wins.
    assert(got(1) == (2L, "an", "a", 4L))
    // banana -> ' b an ana ' (the SECOND an absorbs a — non-overlap keeps
    // the first an intact), bandana -> ' b an d ana '.
    // round 3: (b,an) = 3+1 = 4 beats (an,ana) = 3 and (a,b) = 2.
    assert(got(2) == (3L, "b", "an", 4L))
  }

  test("p24 profile laws: one corpus scan for the whole census, every " +
      "column reported, counts consistent, min <= max in native order") {
    val spark2 = graft.TestSession.spark
    val out = Pipeline.queries("p24_profile")(spark2,
      graft.TestSession.sfDir)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    val total = Tables(spark2, graft.TestSession.sfDir).events.count()
    assert(rows.forall(_.getLong(1) == total), "n_rows inconsistent")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= total)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= total)
      assert(r.getString(4) != null && r.getString(5) != null)
    }
    // id columns: distinct count of the key column equals the row count
    assert(rows.find(_.getString(0) == "event_id").get.getLong(3) == total)
    // the entire multi-distinct census reads the corpus ONCE (Spark
    // plans the N countDistincts via a single Expand over one scan)
    // AQE prints Final and Initial plans; count scans in the final only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"p24 scanned the corpus $scans times:\n$plan")
    assert(plan.contains("Expand"), "expected the multi-distinct Expand")
  }

  test("p25 weighted-sample laws: 10 per source, the draw replays, and " +
      "quality genuinely biases selection upward") {
    val spark2 = graft.TestSession.spark
    val dir2 = graft.TestSession.sfDir
    val out = Pipeline.queries("p25_weighted_sample")(spark2, dir2).cache()
    try {
      // fixed-size without replacement, per stratum
      val sizes = out.groupBy("source").count().collect()
      assert(sizes.nonEmpty && sizes.forall(_.getLong(1) == 10L))
      assert(out.select("doc_id").distinct().count() == out.count())
      // replayable: the seeded draw is deterministic run-to-run
      val again = Pipeline.queries("p25_weighted_sample")(spark2, dir2)
        .collect().map(_.toSeq).toSet
      assert(out.collect().map(_.toSeq).toSet == again)
      // the weight does its job: the sampled docs' mean quality exceeds
      // the corpus mean (A-ES inclusion probability rises with w)
      import org.apache.spark.sql.functions.{avg, col}
      val sampled = out.agg(avg(col("quality_score"))).head().getDouble(0)
      val corpus = TextAnalysis
        .qualityTokens(Tables(spark2, dir2).documents)
        .agg(avg(col("quality_score"))).head().getDouble(0)
      assert(sampled > corpus,
        s"weighted draw not biased: sample mean $sampled vs corpus $corpus")
    } finally out.unpersist()
  }

  test("t27 ingest sample == p25 batch draw bit-for-bit after end-of-log") {
    // A-ES is one-pass by construction: the running top-k of the ingest
    // stream must BE the batch draw — same keys, same ranks, same docs
    val spark2 = graft.TestSession.spark
    val dir2 = graft.TestSession.sfDir
    val streamRows = Transport.queries("t27_stream_sample")(spark2, dir2)
      .orderBy("source", "rank").collect().map(_.toSeq).toSeq
    val batchRows = Pipeline.queries("p25_weighted_sample")(spark2, dir2)
      .select("source", "doc_id", "quality_score", "sample_key", "rank")
      .orderBy("source", "rank").collect().map(_.toSeq).toSeq
    assert(streamRows.nonEmpty, "t27 returned no rows")
    assert(streamRows == batchRows,
      "the ingest-time draw diverged from the batch draw")
  }

  test("p26 decontamination tiers: wholesale copy drops, a partial quoter " +
      "strips, exactly-at-threshold strips (strict >), clean and " +
      "too-short-to-window docs keep, eval docs never report") {
    import spark.implicits._
    // the sf0.01 oracle fixture exercises keep+drop (planted near-dups
    // cross the %7 eval split) but contains no PARTIAL quoter at 8-gram
    // specificity — this constructed corpus pins all three tiers and both
    // boundary cases
    val e = (1 to 20).map(i => s"e$i") // the eval doc's tokens
    val docs = Seq(
      // eval suite member (id % 7 == 0)
      (7L, "eval", e.mkString(" ")),
      // wholesale eval copy + one token: nearly every window seen -> drop
      (1L, "train", (e :+ "x").mkString(" ")),
      // 100 clean tokens then ONE full 8-token eval quote: exactly one of
      // its 101 windows is seen (boundary-spanning windows mix clean and
      // eval tokens and match nothing) -> strip
      (2L, "train",
        ((1 to 100).map(i => s"c$i") ++ e.take(8)).mkString(" ")),
      // exactly AT the 1/5 threshold: 12 tokens = quote + 4 clean gives
      // 5 windows, 1 seen -> 1*5 > 5*1 is FALSE -> strip, not drop (the
      // drop test is strictly greater)
      (3L, "train", (e.take(8) ++ Seq("z1", "z2", "z3", "z4")).mkString(" ")),
      // clean 20 tokens -> keep
      (4L, "train", (1 to 20).map(i => s"k$i").mkString(" ")),
      // 5 tokens: no 8-token window exists -> keep with zero windows
      (5L, "train", "a b c d e"),
      // a second eval member that is itself a copy of E (id % 7 == 0):
      // eval docs are the SUITE, never reported rows
      (14L, "eval", e.mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Pipeline.ngramDecontam(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L),
      s"spine must be exactly the train docs, got ${got.keySet}")
    assert(got(1L)._4 == "drop", s"wholesale copy: ${got(1L)}")
    assert(got(1L)._1 == 14L && got(1L)._2 == 13L,
      s"copy shares all but the x-spanning windows: ${got(1L)}")
    assert(got(2L) == ((101L, 1L, 0.009901, "strip")), s"${got(2L)}")
    assert(got(3L) == ((5L, 1L, 0.2, "strip")),
      s"at-threshold must strip (strict >): ${got(3L)}")
    assert(got(4L)._4 == "keep" && got(4L)._2 == 0L)
    assert(got(5L) == ((0L, 0L, 0.0, "keep")),
      s"short doc must keep with zero windows: ${got(5L)}")
  }
}
