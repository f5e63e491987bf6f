package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface: the
  * curation stages a 100 TB corpus pass runs between ingest and tokenizer.
  * All pure map/agg/window shapes — no driver-side loops, no collects; the
  * only windows are partitioned by a bounded key (doc, shard bucket), never
  * global.
  */
object Pipeline {

  /** Deterministic per-document hash in [0, 100) — md5-derived so the
    * DuckDB oracle computes the identical value (the same trick as the LSH
    * plane grid). Sampling by content-stable hash (not rand()) is what makes
    * a 100 TB sampling pass reproducible and retry-safe.
    */
  private def hashPct(c: Column): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(100L))

  /** A word 8-gram present in more than this many documents is cross-doc
    * boilerplate (headers, license banners, templated spans). Production
    * pipelines tune it per corpus; pinned so the oracle mirrors it.
    */
  private val SpanDfCap = 2

  /** p16 context-window chunking: `ChunkSize`-token windows every
    * `ChunkStride` tokens (overlap = 64 − 48 = 16). Pinned so the oracle
    * replays the same windows.
    */
  private val ChunkSize = 64
  private val ChunkStride = 48

  /** p17 output shard count. Real pipelines size this to the target file
    * count (corpus bytes / ~1 GB); pinned so the oracle replays it.
    */
  private val ShuffleShards = 8

  /** p20: held-out eval docs per source. */
  private[analytics] val HoldoutK = 5

  /** p19's per-source token budget — ~half of each sf0.01 source's ~1350
    * tokens, so the selection genuinely bisects (production would set this
    * from the target mixture's per-domain token allocation). */
  private val BudgetTokens = 700L

  /** p16 body: ChunkSize-token windows every ChunkStride tokens over
    * whitespace-split documents. Chunk count = ceil(n/stride) so windows
    * cover every token; the trailing window is short rather than
    * re-anchored at n−size (re-anchoring would make a chunk's identity
    * depend on document length — this rule is stateless). Pure map +
    * explode on one scan: zero shuffles at any corpus size.
    */
  private[analytics] def chunkWindows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("a"),
        explode(expr(s"sequence(0L, (size(a) + ${ChunkStride - 1}) " +
          s"div $ChunkStride - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkStride).as("start_token"),
        expr(s"slice(a, chunk_id * $ChunkStride + 1, $ChunkSize)").as("w"))
      .select(col("doc_id"), col("chunk_id"), col("start_token"),
        size(col("w")).cast("long").as("n_tokens"),
        array_join(col("w"), " ").as("chunk"))

  /** Merge rounds for `p14_bpe_merges`; pinned so the oracle replays the
    * same training run.
    */
  private val BpeMerges = 10

  /** p26: contaminated-window fraction above which a training doc is a
    * wholesale eval copy and DROPS; any contamination below it STRIPS
    * (remove the seen spans, keep the doc) — the GPT-3/PaLM two-tier
    * decontamination policy. Kept as an exact RATIONAL (num/den = 1/5 ≡
    * 0.2) so the threshold test is integer arithmetic in BOTH engines —
    * never a comparison against a rounded double.
    */
  private[analytics] val DecontamDropNum = 1L
  private[analytics] val DecontamDropDen = 5L

  /** p26's eval-suite membership: doc_id % 7 == 0 — wide enough that the
    * corpus's planted near-dups cross the split (the oracle fixture then
    * exercises both keep and drop; the strip tier — a partial quoter —
    * does not occur in the synthetic corpus at 8-gram specificity and is
    * law-pinned on a constructed fixture in PipelineSpec).
    */
  private[analytics] val DecontamEvalMod = 7L

  /** p26's body over any (doc_id, source, text) frame — the real corpus
    * for the oracle, constructed fixtures for the tier-boundary spec.
    */
  private[analytics] def ngramDecontam(docs: DataFrame): DataFrame = {
    // doc-local distinct (Dedup.shingles' law at window width 8): duplicate
    // (doc_id, s) rows only arise within one doc's own window list, so
    // array_distinct before the explode replaces the global exchange
    val g = docs
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 8)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, least(size(tok)-8, 1022)), " +
          "i -> concat_ws(' ', slice(tok, i+1, 8))))")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = g.filter(pmod(col("doc_id"), lit(DecontamEvalMod)) === 0L)
      .select(col("s")).distinct()
    val train = g.filter(pmod(col("doc_id"), lit(DecontamEvalMod)) =!= 0L)
    val nw = train.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    // bench is distinct on s, so the semi-join keeps each contaminated
    // window exactly once — n_contam counts WINDOWS, not pairs
    val nc = train.join(bench.hint("shuffle_hash"), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contam"))
    decontamVerdict(
      docs.filter(pmod(col("doc_id"), lit(DecontamEvalMod)) =!= 0L)
        .select(col("doc_id"), col("source"))
        .join(nw.hint("shuffle_hash"), Seq("doc_id"), "left")
        .withColumn("n_windows", coalesce(col("n_windows"), lit(0L))),
      nc)
  }

  /** p26's verdict tail over a (doc_id, source, n_windows) spine and a
    * (doc_id, n_contam) hit sliver — shared by the batch op and its
    * streaming twin (t30), so the two tiers can never drift.
    */
  private[analytics] def decontamVerdict(spine: DataFrame,
      hits: DataFrame): DataFrame =
    spine
      .join(hits.hint("shuffle_hash"), Seq("doc_id"), "left")
      .withColumn("n_contam", coalesce(col("n_contam"), lit(0L)))
      .withColumn("contam_frac",
        when(col("n_windows") === 0L, lit(0.0))
          .otherwise(round(col("n_contam") * lit(1.0) / col("n_windows"), 6)))
      // the drop test is INTEGER arithmetic (5·contam > windows ≡
      // frac > 1/5) — never a comparison against a rounded double,
      // which could flip at the threshold between engines
      .withColumn("verdict",
        when(col("n_contam") * lit(DecontamDropDen) >
            col("n_windows") * lit(DecontamDropNum), lit("drop"))
          .when(col("n_contam") > 0L, lit("strip"))
          .otherwise(lit("keep")))
      .select(col("doc_id"), col("source"), col("n_windows"),
        col("n_contam"), col("contam_frac"), col("verdict"))

  /** BPE merge training over a document corpus. One corpus pass builds the
    * word-frequency table; each merge round aggregates adjacent-symbol pair
    * counts over the VOCABULARY (Heaps-law bounded — orders of magnitude
    * smaller than the corpus) and applies the (count DESC, pair) argmax as
    * a greedy left-to-right literal replace on the spaced-symbol form. The
    * per-round argmax is a 1-row collect (the d6 convergence-sum pattern);
    * the result IS the merge table.
    *
    * Merge application is CANONICAL BPE: each round's argmax pair merges
    * every leftmost non-overlapping occurrence in one pass (a run
    * ' a n a n a ' becomes ' an an a ', ' a a a a a ' becomes
    * ' aa aa a '), implemented as the same left fold on all three
    * evaluation paths — [[mergeCanonical]] on the driver, an
    * `aggregate()` higher-order function distributed, `list_reduce` in
    * the DuckDB oracle. (Earlier rounds used a literal
    * scan-original replace whose consumed separator skipped alternate
    * occurrences in same-pair runs — a declared divergence, now closed.)
    */
  /** Above this vocabulary size the merge loop stays distributed; below it
    * the loop runs ON THE DRIVER over the collected (word, freq) table.
    * The merge-count ceiling (VERDICT r7 #4: one driver round-trip per
    * merge) only binds when the vocab CANNOT fit — at web-corpus scale a
    * Heaps-law vocab of ~10M words is a few hundred MB, so in practice
    * the corpus pass is the only distributed stage and a 30k-merge
    * production vocabulary costs 30k LOCAL rounds, not 30k Spark jobs.
    * Both paths share the argmax law bit-for-bit (BpeLocalFinishSpec pins
    * the equality; Spark UTF8String, DuckDB and java.lang.String order
    * the [a-z]-only symbols identically, and all three `replace`s share
    * scan-original-continue-after-match semantics). The cap bounds ONE
    * query; concurrent sessions serialize the collect+merge-loop PEAK via
    * [[graft.ops.DriverBudget]] (each query's segmented vocab remains
    * resident until consumed — see the budget's scaladoc).
    */
  private[analytics] val LocalFinishVocabCap = 2000000L

  /** The training loop itself; returns (merge table rows, final vocab with
    * its spaced-symbol segmentation — columns (word, freq, s)) so
    * [[bpeMerges]] reports the merges and p15 applies the segmentation
    * corpus-wide. `localCap` exists for the equality spec.
    */
  private[analytics] def bpeTrain(docs: org.apache.spark.sql.DataFrame,
      rounds: Int, localCap: Long = LocalFinishVocabCap)
      : (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    // materialize the word table: this is the ONE corpus pass — without it
    // every merge round would silently replay the corpus scan through the
    // vocab lineage (measured: 8.6 s -> ~2 s at sf0.1)
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$")) // symbol guard: merge
      .groupBy("word").agg(count(lit(1)).as("freq")) // literals stay clean
      .localCheckpoint(true)
    if (words.count() <= localCap) bpeLocalFinish(words, rounds)
    else bpeDistributedRounds(words, rounds)
  }

  /** Canonical leftmost non-overlapping application of one merge (x, y) to
    * a spaced-symbol segmentation " a b c ": left fold — append y directly
    * when the accumulator ends with an unmerged ` x` and the next symbol is
    * y, else append ` symbol`. A just-merged xy can never re-match as x
    * (x ≠ xy), which IS the non-overlap rule; the space guard means only a
    * whole trailing symbol equal to x matches (symbols are space-separated
    * and merges concatenate without a space). Shared rule-for-rule with the
    * distributed `aggregate()` fold and the oracle's `list_reduce` —
    * [a-z]-only symbols compare identically in java.lang.String,
    * UTF8String and DuckDB.
    */
  private[analytics] def mergeCanonical(seg: String, x: String, y: String): String =
    seg.trim.split(" ").foldLeft("") { (acc, t) =>
      if (t == y && acc.endsWith(" " + x)) acc + t else acc + " " + t
    } + " "

  /** Local finish: the checkpointed vocab collects once and every merge
    * round is driver-local array work — no per-merge Spark jobs.
    */
  private def bpeLocalFinish(words: org.apache.spark.sql.DataFrame,
      rounds: Int)
      : (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame) =
    // resident section under the JVM-wide DriverBudget permit — concurrent
    // sessions serialize their driver peaks instead of stacking them
    graft.ops.DriverBudget.withPermit {
    val spark = words.sparkSession
    import spark.implicits._
    val rows = words.as[(String, Long)].collect()
    // " a b c " spaced-symbol form — identical to the distributed
    // concat(" ", regexp_replace(word, "(.)", "$1 "))
    var segs = rows.map { case (w, _) => " " + w.flatMap(c => s"$c ") }
    val freqs = rows.map(_._2)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < segs.length) {
        val a = segs(i).trim.split(" ")
        // BpePairCap: first 63 adjacent pairs, same bound as the
        // distributed least(size(a)-2, 62) and the oracle's range(1, 64)
        val until = math.min(a.length - 1, 63)
        var j = 0
        while (j < until) {
          val k = (a(j), a(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freqs(i))
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) {
        // fully merged vocab: nothing left to pair — mirror the
        // distributed path, which would throw on the empty argmax
        throw new java.util.NoSuchElementException(
          s"BPE round $r: no pairs left to merge")
      }
      val ((x, y), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      merges += ((r.toLong, x, y, cnt))
      i = 0
      while (i < segs.length) { segs(i) = mergeCanonical(segs(i), x, y); i += 1 }
    }
    val vocab = rows.indices
      .map(i => (rows(i)._1, rows(i)._2, segs(i)))
      .toDF("word", "freq", "s")
    (merges.result(), vocab)
    }

  /** Distributed merge rounds — the fallback when the vocab outgrows the
    * driver: one vocabulary-sized aggregation + 1-row argmax collect per
    * merge (the d6 convergence-sum pattern).
    */
  private def bpeDistributedRounds(words: org.apache.spark.sql.DataFrame,
      rounds: Int)
      : (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    var vocab = words.withColumn("s",
      concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val best = vocab
        .select(col("freq"), split(trim(col("s")), " ").as("a"))
        .filter(size(col("a")) >= 2) // fully-merged words pair nothing
        // BpePairCap: count only the first 63 adjacent pairs per word,
        // mirrored in the oracle's range(1, 64) (the Dedup.shingles
        // convention: any per-word cap must be identical on both sides).
        // Words are letter-runs so 64+ symbols never occurs in practice,
        // but an uncapped Spark count against a capped oracle would train
        // different argmax merges the round a long word appears.
        .select(col("freq"), explode(expr(
          "transform(sequence(0, least(size(a)-2, 62)), " +
            "i -> struct(a[i] AS x, a[i+1] AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()(0)
      val (x, y, cnt) =
        (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((r.toLong, x, y, cnt))
      // the distributed half of mergeCanonical: same left fold as an
      // aggregate() higher-order function (x/y are [a-z]+ — safe to inline)
      vocab = vocab.withColumn("s", expr(
        s"concat(aggregate(split(trim(s), ' '), '', (acc, t) -> " +
          s"CASE WHEN t = '$y' AND endswith(acc, ' $x') " +
          s"THEN concat(acc, t) ELSE concat(acc, ' ', t) END), ' ')"))
    }
    (merges.toSeq, vocab)
  }

  private[analytics] def bpeMerges(
      docs: org.apache.spark.sql.DataFrame,
      rounds: Int): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bpeTrain(docs, rounds)._1.toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** p23's seed labels: positive = curated sources, negative = raw. */
  private[analytics] val P23Pos = Seq("src0", "src1", "src2", "src3", "src4")
  private[analytics] val P23Neg =
    Seq("src15", "src16", "src17", "src18", "src19")
  private[analytics] val P23Seeds: Seq[String] = P23Pos ++ P23Neg

  /** (doc_id, source, token) rows — p23's shared tokenization. */
  private[analytics] def p23Tokens(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"),
      explode(expr("filter(split(text, ' '), t -> length(t) > 0)")).as("w"))

  /** Train the classifier: the vocabulary table (w, cp, cn) and its
    * 1-row stats frame (np, nn, v). Both sides of the full-outer count
    * join are vocabulary-sized — shuffled, never broadcast.
    */
  private[analytics] def p23Train(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val toks = p23Tokens(Tables(s, dir).documents)
    val posTf = toks.filter(col("source").isin(P23Pos: _*))
      .groupBy("w").agg(count(lit(1)).as("cp"))
    val negTf = toks.filter(col("source").isin(P23Neg: _*))
      .groupBy("w").agg(count(lit(1)).as("cn"))
    val vocab = posTf.join(negTf.hint("shuffle_hash"), Seq("w"),
      "full_outer")
    val stats = vocab.agg(
      sum(coalesce(col("cp"), lit(0L))).as("np"),
      sum(coalesce(col("cn"), lit(0L))).as("nn"),
      count(lit(1)).as("v"))
    (vocab, stats)
  }

  /** Score (doc_id, source, w) token rows against the trained model —
    * the ONE scoring expression p23 (batch) and t23 (ingest) share, so
    * the two can never drift: add-1-smoothed per-token LLR, rounded to 6
    * digits BEFORE the decimal-exact per-doc sum (the p10/p18 ulp
    * discipline), keep = score > 0.
    */
  private[analytics] def p23Score(toks: org.apache.spark.sql.DataFrame,
      vocab: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    toks.join(vocab.hint("shuffle_hash"), Seq("w"), "left")
      .crossJoin(stats)
      .withColumn("llr", round(
        log((coalesce(col("cp"), lit(0L)) + lit(1L)).cast("double") /
          (col("np") + col("v"))) -
          log((coalesce(col("cn"), lit(0L)) + lit(1L)).cast("double") /
            (col("nn") + col("v"))), 6).cast("decimal(30,15)"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("llr")).cast("double"), 6).as("llr_score"))
      .withColumn("keep", col("llr_score") > 0.0)

  /** p25's A-ES sampling key ln(u)/w — monotone in u^(1/w) without the
    * pow; u is the hash-seeded 52-bit uniform (a9's discipline), rounded
    * 6dp so an engine ulp in ln can never flip a rank. Shared verbatim by
    * the t27 ingest sampler.
    */
  private[analytics] def aesKey(docId: Column, w: Column): Column = {
    val u = (conv(substring(md5(concat(lit("ws"),
      docId.cast("string"))), 1, 13), 16, 10).cast("long") +
      lit(0.5)) / lit(4503599627370496.0)
    round(log(u) / w, 6)
  }

  val queries: Map[String, Relational.Q] = Map(
    // Context-window chunking — the prep step that turns documents into
    // overlapping token windows for pretraining sequence packing or RAG
    // indexing. Windows start every ChunkStride tokens (chunk count =
    // ceil(n/stride), so the whole document is covered); the trailing
    // window is simply short rather than re-anchored at n−size —
    // re-anchoring would make a chunk's identity depend on document
    // length, this rule is stateless and oracle-replayable. 100 TB shape:
    // pure map + explode on one corpus scan — zero shuffles, zero joins,
    // output rows carry (doc_id, chunk_id) so any downstream op can
    // repartition on whichever it needs.
    "p16_chunking" -> { (s, dir) =>
      chunkWindows(Tables(s, dir).documents)
    },

    // Quality-ranked token-budget selection — per-source corpus mixing
    // (the FineWeb/Gopher "keep the best N tokens of every dump" step):
    // within each source, documents are ranked by a COARSE quality bucket
    // (a2's score rounded to 2 dp; doc_id tie-break) and the ranked prefix
    // fitting BudgetTokens survives. The coarse bucket is what makes the
    // selection scale-exact WITHOUT a corpus-wide sort: a naive
    // `sum over (partition by source order by quality)` window funnels
    // each source's full corpus slice through one task (the s4/s5
    // scale-killer). Instead: (1) one map pass scores docs; (2) a
    // (source, bucket) histogram — ≤101 rows per source by construction —
    // takes the per-source cumulative window (bounded partitions);
    // (3) buckets wholly under budget admit their docs via a shuffled
    // semi-join; (4) only the ONE straddling bucket per source runs a
    // doc-level prefix window, partitioned by (source, bucket) — bucket-
    // sized, never source-sized. Equivalence to the naive prefix is exact
    // because the grid order (bucket DESC, doc_id) IS the ranking order.
    "p19_budget_select" -> { (s, dir) =>
      // the scored table feeds three branches (histogram + both doc
      // attaches) — persist so the tokenize/score map runs once, not 3×
      // (the jaccardPairs discipline; MEMORY_AND_DISK spills, not OOMs)
      val d = TextAnalysis.qualityTokens(Tables(s, dir).documents, "source")
        .withColumn("quality_bucket", round(col("quality_score"), 2))
        .select("doc_id", "source", "n_tokens", "quality_bucket")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hist = d.groupBy("source", "quality_bucket")
        .agg(sum("n_tokens").as("btoks"))
      // bounded window: ≤101 rows per source (the 2-dp grid), never docs
      val wh = Window.partitionBy("source").orderBy(col("quality_bucket").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("cum_before",
        coalesce(sum("btoks").over(wh), lit(0L)))
      val full = cum.filter(col("cum_before") + col("btoks") <= BudgetTokens)
        .select("source", "quality_bucket")
      // histogram-derived tables are source-set-sized — unbounded at
      // 100 TB (source = domain), so the doc attaches shuffle
      val fullDocs = d.join(full.hint("shuffle_hash"),
        Seq("source", "quality_bucket"), "left_semi")
      val bnd = cum.filter(col("cum_before") < BudgetTokens &&
          col("cum_before") + col("btoks") > BudgetTokens)
        .select(col("source"), col("quality_bucket"),
          (lit(BudgetTokens) - col("cum_before")).as("remaining"))
      val wb = Window.partitionBy("source", "quality_bucket")
        .orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
      val bndDocs = d.join(bnd.hint("shuffle_hash"),
          Seq("source", "quality_bucket"))
        .withColumn("cum_in", sum("n_tokens").over(wb))
        .filter(col("cum_in") <= col("remaining"))
        .select("doc_id", "source", "n_tokens", "quality_bucket")
      fullDocs.unionByName(bndDocs)
    },

    // Training-order shuffle + output sharding — the step between curation
    // and writing tokenizer-ready shards: every document gets a
    // content-stable pseudo-random position so training never sees the
    // crawl/source order. The order key is an md5-derived hash (the p1/p7
    // trick), NOT rand(): re-running the job — or retrying one task —
    // yields byte-identical shards. 100 TB shape: ONE hash-partition
    // exchange on the shard id, then per-shard sort + row_number — each
    // window is corpus/nShards (a shard must fit its writer anyway; at
    // 100 TB you raise ShuffleShards, never the window width). Writing is
    // `partitionBy(shard)` + files sorted by pos, omitted here because the
    // oracle compares rows.
    "p17_shuffle_shards" -> { (s, dir) =>
      val h = conv(substring(md5(
        concat(lit("shuf:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("hv"), col("doc_id"))
      Tables(s, dir).documents
        .select(col("doc_id"), h.as("hv"))
        .withColumn("shard", pmod(col("hv"), lit(ShuffleShards.toLong)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    },

    // Deterministic eval-holdout carve-out — the train/eval split a corpus
    // needs BEFORE any filtering metric is trusted: exactly `HoldoutK`
    // docs per source, membership decided by a CONTENT-stable hash (the
    // p1/p7/p17 discipline, keyed on the text, not the id), so re-runs,
    // task retries, and re-sharded corpora carve the identical eval set —
    // and an exact duplicate of an eval document in the training split is
    // detectable by d1's fingerprint, because membership follows the text.
    // 100 TB shape: "lowest k hash keys per source" is a bounded top-k
    // AGGREGATION (TopKLongAgg — O(k) state per source, ObjectHashAggregate
    // with map-side partials), never `row_number over (partition by source
    // order by hash)`: that window sort-shuffles each source's entire
    // corpus slice through ONE task — the s4/s5 scale-killer shape
    // (VERDICT r8 #1) in stratified-sampling clothing. p1 keeps a RATE per
    // stratum; this keeps an exact COUNT — the eval-set contract.
    "p20_eval_holdout" -> { (s, dir) =>
      val h = conv(substring(md5(
        concat(lit("holdout:"), col("text"))), 1, 15), 16, 10).cast("long")
      Tables(s, dir).documents
        // a NULL text hashes to NULL, which the non-nullable (Long, Long)
        // TopK encoder rejects at runtime — filter identically on both
        // sides (oracle mirrors the predicate)
        .filter(col("text").isNotNull)
        .select(col("source"), col("doc_id"), h.as("h"))
        .groupBy(col("source"))
        .agg(graft.functions.TopKAggregator
          .topKLong(HoldoutK, col("h"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("i", "x")))
        .select(col("source"), col("x._2").as("doc_id"), col("x._1").as("h"),
          (col("i") + 1).cast("long").as("rank"))
    },

    // Temperature-adjusted sampling mix (the Gopher/PaLM pretraining
    // knob): per source, the raw token share p_i and the T=2 mixture
    // weight w_i = p_i^(1/T) / Σ p_j^(1/T) — temperature flattens the
    // distribution so small high-value domains are not drowned by the
    // web-crawl bulk; eff_epochs = how many times the source would be
    // seen under a fixed token budget at that weight (> 1 flags a source
    // the mix will over-repeat — the overfitting check run before every
    // mix change). 100 TB shape: one corpus token census (map-side keyed
    // agg), then everything is |sources|-sized with the totals broadcast;
    // the sqrt sum goes through DECIMAL(30,15) so partial-agg order can't
    // perturb low bits (the money-sum discipline).
    // Naive Bayes quality classifier — the fastText-style curation gate
    // (train on curated-vs-raw seed sources, score the unlabeled corpus
    // by token log-likelihood ratio, keep score > 0). This is the
    // supervised twin of p12's DSIR importance weights and the classifier
    // half of the classic quality-filter pipeline step. Everything is
    // integer counts + two smoothed log terms: per-token
    // llr = ln((cp+1)/(Np+V)) − ln((cn+1)/(Nn+V)), rounded to 6 digits
    // BEFORE the decimal-exact per-doc sum (the p10/p18 ulp discipline).
    // Shapes: the two class-count tables and their union vocabulary are
    // vocabulary-sized — shuffle-joined, never broadcast (the p2/p10
    // law); the 3-row stats frame rides a crossJoin literal; scoring is
    // one corpus pass + one keyed join + one per-doc agg. At 100 TB the
    // class counts train once over the seed slice and persist; scoring
    // cost is corpus-linear.
    "p23_quality_classifier" -> { (s, dir) =>
      val (vocab, stats) = p23Train(s, dir)
      val toks = p23Tokens(Tables(s, dir).documents)
        .filter(!col("source").isin(P23Seeds: _*))
      p23Score(toks, vocab, stats)
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    // the mixing-selection primitive: draw a fixed-size sample per source
    // with inclusion probability proportional to a2's quality score —
    // how a curated subcorpus gets drawn from a raw drop without a
    // global sort over quality). Each doc gets key = ln(u)/w (monotone
    // in u^(1/w), the A-ES key, without the pow); u is hash-SEEDED (the
    // a9 discipline: md5 → 52 mantissa bits → exact power-of-two
    // division) so the draw replays bit-for-bit — production swaps the
    // seed per draw. Keys round to 6dp BEFORE ranking with doc_id as the
    // tiebreak, so an engine ulp in ln can never flip a rank. Shape: one
    // map pass for w and the key, then a top-10-per-source rank window —
    // partitions are SOURCE-sized (the p2 precedent: bounded strata,
    // never a global sort), and only sample×sources rows leave.
    "p25_weighted_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val q = TextAnalysis
        .qualityTokens(Tables(s, dir).documents, "source")
        .select(col("doc_id"), col("source"), col("quality_score"))
      val keyed = q.withColumn("sample_key",
        aesKey(col("doc_id"), col("quality_score")))
      val w = Window.partitionBy("source")
        .orderBy(col("sample_key").desc, col("doc_id"))
      keyed
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("source"), col("doc_id"), col("quality_score"),
          col("sample_key"), col("rank"))
    },

    // Dataset profiler — the data-quality census every pipeline runs
    // before pointing a training job at a new drop: per-column row/null/
    // distinct counts and min/max, in ONE corpus scan. Rendering contract
    // (so the report is one homogeneous table): min/max computed in the
    // NATIVE type then rendered to string; timestamps render as epoch
    // micros (engine-portable — never a format string). Shape: a single
    // multi-aggregate pass (Spark plans the N countDistincts via one
    // Expand — scan once, not once per column) folded to a column-count-
    // sized report by stack(). At 100 TB the scan is the cost and it is
    // paid exactly once.
    "p24_profile" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      val colsR: Seq[(String, Column)] = Seq(
        "event_id" -> col("event_id"),
        "ts" -> unix_micros(col("ts")),
        "user_id" -> col("user_id"),
        "event_type" -> col("event_type"),
        "value" -> col("value"),
        "props" -> col("props"))
      val aggs = colsR.flatMap { case (n, c) => Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_$n"),
        countDistinct(c).as(s"nd_$n"),
        min(c).cast("string").as(s"mn_$n"),
        max(c).cast("string").as(s"mx_$n"))
      }
      val allAggs = count(lit(1)).as("n_rows") +: aggs
      val one = ev.agg(allAggs.head, allAggs.tail: _*)
      val stackArgs = colsR.map { case (n, _) =>
        s"'$n', nn_$n, nd_$n, mn_$n, mx_$n" }.mkString(", ")
      one.selectExpr("n_rows",
        s"stack(${colsR.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_s, max_s)")
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    },

    "p22_temperature_mix" -> { (s, dir) =>
      val tok = Tables(s, dir).documents
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val tot = tok.agg(
        sum(col("n_tokens")).as("tot"),
        sum(sqrt(col("n_tokens").cast("double")).cast("decimal(30,15)"))
          .cast("double").as("sroot"))
      tok.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          round(col("n_tokens") / col("tot"), 6).as("raw_share"),
          round(sqrt(col("n_tokens").cast("double")) / col("sroot"), 6)
            .as("temp_share"),
          round(lit(BudgetTokens.toDouble)
            * (sqrt(col("n_tokens").cast("double")) / col("sroot"))
            / col("n_tokens"), 6).as("eff_epochs"))
    },

    // Dedup SURVIVORSHIP report — the integration that closes the
    // dedup → curation loop: what does the corpus look like AFTER d6's
    // cluster dedup ships? Per source: docs and tokens before/after, the
    // kept-token ratio a data-mix planner feeds back into p7's domain
    // weights (dedup shifts the mix — a source that was 30% duplicates
    // contributes 30% fewer tokens than the raw census says). Keeper rule
    // is d6's (cluster = min reachable doc; singletons keep themselves).
    // 100 TB shape: the expensive part IS d6 (band-bounded pairs +
    // O(log n) contraction); the report adds one doc-keyed left join
    // (labels are component-sized, shuffled never broadcast) + one
    // map-side-combined source agg.
    "p21_dedup_survivorship" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val pairs = Dedup.jaccardPairs(Dedup.shingles(docs))
        .filter(col("jaccard") >= Dedup.JaccardThreshold)
        .select(col("doc_a"), col("doc_b"))
      val (labels, _) = Dedup.connectedComponents(pairs)
      docs
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(labels.withColumnRenamed("doc", "doc_id").hint("shuffle_hash"),
          Seq("doc_id"), "left")
        .withColumn("keeper",
          col("lbl").isNull || (col("lbl") === col("doc_id")))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keeper"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(when(col("keeper"), col("n_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("kept_ratio",
          round(col("tokens_kept") * lit(1.0) / col("tokens_total"), 6))
    },

    // BPE tokenizer TRAINING as corpus aggregation: one corpus pass builds
    // the word-frequency table, then every merge round is an aggregation
    // over the VOCABULARY (Heaps-law bounded — orders of magnitude smaller
    // than the corpus), never the corpus again. That asymmetry is the whole
    // 100 TB story: the expensive scan happens once; the iterative part
    // touches only (word, freq, symbols). Merge rule: count adjacent symbol
    // pairs weighted by word frequency, take the (count DESC, pair) argmax,
    // rewrite the spaced-symbol string — canonical leftmost non-overlapping
    // merge application (the mergeCanonical fold, which DuckDB replays via
    // list_reduce).
    // The per-round argmax is a 1-row collect (the d6 convergence-sum
    // pattern); the output IS the 10-row merge table.
    "p14_bpe_merges" -> { (s, dir) =>
      bpeMerges(Tables(s, dir).documents, BpeMerges)
    },

    // Tokenizer APPLICATION — the train -> tokenize loop closed: the
    // trained segmentation is a (word -> piece count) table, Heaps-law
    // bounded, so it BROADCASTS onto one corpus pass at any corpus size
    // (the same asymmetry p12 exploits with hashed features). Per-language
    // word and piece totals are the fertility report a tokenizer eval
    // produces.
    "p15_bpe_tokenize" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val (_, vocab) = bpeTrain(docs, BpeMerges)
      val pieces = vocab.select(col("word"),
        size(split(trim(col("s")), " ")).cast("long").as("np"))
      docs.select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .join(broadcast(pieces), "word")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
    },

    // Bloom-prefiltered contamination check — p6's complement for when the
    // EVAL side outgrows a set broadcast (a union of benchmark suites can
    // be GBs; a Bloom filter over it is fixed-size regardless). Shape:
    // bloom_filter_agg over the bench shingles → one binary blob broadcast
    // onto the corpus scan → might_contain prefilter (codegen'd, no
    // shuffle) → exact confirm join ONLY on the survivors (bloom has false
    // positives, never false negatives, so confirm-after-probe returns
    // exactly the p6 result). The corpus never shuffles; the confirm join
    // moves survivors ≈ true hits + fp, a sliver of the scan.
    "p13_bloom_contamination" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val sh = Dedup.shingles(docs)
      val bench = sh.filter(pmod(col("doc_id"), lit(97L)) === 0L)
        .select(col("s")).distinct()
      // the filter builds in its own (bench-sized) job and its ONE ~50 KB
      // blob becomes a literal in the probe plan — the same two-phase shape
      // Spark's InjectRuntimeFilter produces (might_contain requires a
      // constant/scalar-subquery filter). This is a scalar fetch, not a
      // corpus collect.
      val blob = bench.agg(graft.functions.BloomFunctions
        .bloomAgg(xxhash64(col("s")), 50000L, 400000L).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val candidates = sh.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
        .filter(graft.functions.BloomFunctions
          .mightContain(lit(blob), xxhash64(col("s"))))
      // the confirm side is eval-sized — too big to broadcast by premise,
      // so the join is pinned to the shuffle shape
      val hits = candidates
        .join(bench.hint("shuffle_hash"), Seq("s"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      hits.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_contam_docs"),
          sum(col("n_sh")).as("n_shared_shingles"))
    },

    // DSIR data selection (Xie et al. 2023, "Data Selection for Language
    // Models via Importance Resampling"): hashed-unigram importance
    // weights. Per-bucket log(p_target/p_raw) with add-1 smoothing over a
    // 1024-bucket hashed vocabulary (target = the 'src1' domain standing in
    // for the high-quality corpus); a document's weight is the sum over its
    // tokens. THE scale trick is the hashing: the feature table is 1024
    // rows at ANY corpus size, so scoring is one broadcast join onto the
    // token scan + a doc-keyed agg — the raw corpus shuffles once, by
    // doc_id. Per-bucket logs are rounded-then-decimal (p10's idiom) so the
    // oracle's libm agrees.
    "p12_dsir_weights" -> { (s, dir) =>
      val B = 1024L
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .withColumn("b", pmod(
          conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
            .cast("long"), lit(B)))
      // raw + target bucket counts in ONE pass over the tokens
      val rc = toks.groupBy("b").agg(count(lit(1)).as("cr"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("ct"))
      val tot = rc.agg(sum(col("cr")).as("rtot"), sum(col("ct")).as("ttot"))
      val table = rc.crossJoin(tot)
        .withColumn("lr", round(
          log((col("ct") + 1).cast("double") / (col("ttot") + B)) -
            log((col("cr") + 1).cast("double") / (col("rtot") + B)), 6)
          .cast("decimal(30,15)"))
        .select("b", "lr")
      toks.join(broadcast(table), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum(col("lr")).cast("double"), 6).as("dsir_weight"))
        .withColumn("selected", col("dsir_weight") > 0)
    },

    // Cross-document duplicated-span detection (Lee et al. 2021,
    // "Deduplicating Training Data Makes Language Models Better" — the
    // span-level pass that document-level dedup misses): word 8-grams per
    // position, document-frequency per distinct gram, every document
    // scored by how much of it is corpus-boilerplate. Shapes: one explode
    // scan, a gram-keyed hash agg, and a gram-keyed shuffle join (the gram
    // vocabulary is corpus-sized — NEVER broadcastable, same law as p2's
    // term table); per-doc final agg is keyed by doc_id. No window, no
    // all-pairs anything: span dedup at 100 TB is exactly these three
    // shuffles.
    "p11_span_dedup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val grams = docs
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .filter(size(col("tok")) >= 8)
        .select(col("doc_id"), explode(expr(
          // cap matches the oracle's range(1, 1024) (same convention as
          // Dedup.shingles)
          "transform(sequence(0, least(size(tok)-8, 1022)), i -> concat_ws(' ', slice(tok, i+1, 8)))"))
          .as("g"))
      // NOTE (r19): the doc-local array_distinct form measured ~2.5x
      // SLOWER here than this global distinct (8-gram strings are wide;
      // the per-row hash-set pass costs more than the partial-agg'd
      // exchange it saves) — deliberately left as-is, see OPTIMIZATION_r19
      val df8 = grams.distinct().groupBy("g").agg(count(lit(1)).as("df"))
      grams.join(df8.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") > SpanDfCap, 1L).otherwise(0L)).as("n_boilerplate"))
        .withColumn("boilerplate_ratio",
          round(col("n_boilerplate") * lit(1.0) / col("n_grams"), 6))
        .withColumn("keep", col("boilerplate_ratio") < 0.5)
    },

    // N-GRAM eval decontamination with a per-document VERDICT — the
    // GPT-3 / PaLM "seen-gram" method (GPT-3 App. C; PaLM App. D):
    // p6/p13 COUNT contaminated docs by 3-gram overlap, but production
    // decontamination keys on LONG n-grams (8–13 tokens — so specific
    // that one shared window proves an eval passage was seen) and must
    // emit a DECISION per training doc: DROP a wholesale eval copy
    // (contamination above the fraction threshold), STRIP a doc that
    // quotes an eval passage (remove those spans, keep the rest), KEEP
    // the clean majority. 8-token windows here (d15/p11's fingerprint
    // scheme — the window vocabulary is shared machinery). 100 TB shape:
    // one windows pass over the corpus, ONE semi-join against the
    // eval-side window set (eval-sized — too big to broadcast by p13's
    // premise, so shuffle-pinned; the LEFT side never re-shuffles
    // beyond its doc-keyed aggs), and the verdict is output-sized math
    // on the doc spine (docs too short to window are clean by
    // construction and stay in the report).
    "p26_ngram_decontam" -> { (s, dir) =>
      ngramDecontam(Tables(s, dir).documents)
    },

    // Stratified downsampling: keep 10% of the dominant language, 50% of the
    // rest — per-stratum rates over a content-stable hash, so the sample is
    // identical on every run/retry and never shuffles the corpus (pure
    // filter + agg).
    "p1_stratified_sample" -> { (s, dir) =>
      val rate = when(col("lang") === "en", 10L).otherwise(50L)
      Tables(s, dir).documents
        .filter(hashPct(col("doc_id")) < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("sum_chars"))
    },

    // TF-IDF top terms per document: tokenize, tf per (doc, term), df per
    // term, ln(N/df) idf, top-3 by (score, term). Shapes: two hash aggs and
    // a per-document window — all shuffles are keyed by doc/term, nothing
    // global.
    "p2_tfidf_topterms" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      // N stays inside the plan (1-row cross join, broadcast by Spark) — no
      // eager driver action, documents scans once per plan branch
      val n = docs.agg(countDistinct(col("doc_id")).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      // the per-term DF table is vocabulary-sized — unbounded at corpus
      // scale, so the tf×df join must shuffle on term, not broadcast
      // (locally AQE would broadcast the tiny df side and hide that shape)
      tf.join(df.hint("shuffle_hash"), "term")
        .crossJoin(n)
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        .drop("n")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rank"))
    },

    // Context-window packing: assign documents to fixed token-budget bins
    // (512) with first-fit-linear inside each of 32 hash buckets — the
    // cumulative-sum window is per-bucket, so packing a 100 TB corpus is 32×
    // (or 32k×) parallel, never one global scan.
    "p3_seq_packing" -> { (s, dir) =>
      val budget = 512L
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), pmod(col("doc_id"), lit(32L)).as("bucket"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
      val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("bin", ((col("cum") - col("tokens")) / budget)
          .cast("long"))
        .groupBy("bucket", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("sum_tokens"))
    },

    // Gopher-style quality rules (Rae et al. 2021, §A.1.1): word-count
    // bounds, mean-word-length bounds, type-token ratio — all in INTEGER
    // arithmetic (charsum vs 2n/10n, 10*distinct vs 3n) so Spark and the
    // oracle agree bit-for-bit without float thresholds. Pure map + one
    // hash agg; at 100 TB this is a single pass.
    "p5_gopher_quality" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      val scored = Tables(s, dir).documents.select(
        col("lang"),
        size(toks).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("charsum"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
        .withColumn("fail_nwords",
          col("n_words") < 10L || col("n_words") > 10000L)
        .withColumn("fail_wordlen", // mean word length outside [2, 10]
          col("charsum") < col("n_words") * 2L ||
            col("charsum") > col("n_words") * 10L)
        .withColumn("fail_ttr", // type-token ratio < 0.3
          col("n_distinct") * 10L < col("n_words") * 3L)
      scored.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("fail_nwords"), 1L).otherwise(0L)).as("n_fail_nwords"),
        sum(when(col("fail_wordlen"), 1L).otherwise(0L)).as("n_fail_wordlen"),
        sum(when(col("fail_ttr"), 1L).otherwise(0L)).as("n_fail_ttr"),
        sum(when(!col("fail_nwords") && !col("fail_wordlen") &&
          !col("fail_ttr"), 1L).otherwise(0L)).as("n_kept"))
    },

    // Benchmark-contamination check: does a training document share any
    // word-3gram with the benchmark set (here the deterministic 1/97
    // doc_id slice standing in for an eval suite)? Shape: the benchmark
    // shingle set is tiny by construction (eval suites are MBs against a
    // 100 TB corpus), so it BROADCASTS and contamination is a map-side
    // hash probe per corpus shingle — no shuffle of the corpus at all.
    "p6_contamination" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val sh = Dedup.shingles(docs)
      val bench = sh.filter(pmod(col("doc_id"), lit(97L)) === 0L)
        .select(col("s")).distinct()
      // no distinct needed: sh is distinct per (doc_id, s) and bench is
      // distinct on s, so the broadcast probe cannot produce duplicates —
      // a distinct here would re-shuffle every contaminated pair for nothing
      val hits = sh.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
        .join(broadcast(bench), "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      hits.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_contam_docs"),
          sum(col("n_sh")).as("n_shared_shingles"))
    },

    // Domain-mixture rebalancing: equal per-source share, capped at each
    // source's actual size — rates in integer percent over the SAME
    // content-stable hash as p1, so the mix is reproducible and retry-safe.
    // Two tiny aggregates broadcast back onto the corpus scan; the corpus
    // itself is touched once, filter-only.
    "p7_domain_mix" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("total"),
        count(lit(1)).as("nsrc"))
      val rates = counts.crossJoin(tot)
        .withColumn("rate_pct",
          least(lit(100L), expr("(100 * (total DIV nsrc)) DIV n_docs")))
        .select("source", "n_docs", "rate_pct")
      val kept = docs.join(broadcast(rates), "source")
        .filter(hashPct(col("doc_id")) < col("rate_pct"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      // both sides are per-source aggregates — #sources rows at any corpus
      // size, so the outer join broadcasts too
      rates.join(broadcast(kept), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("rate_pct"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    },

    // End-to-end curation chain — Gopher quality filter → exact-dedup
    // keeper → stratified sample → per-(lang, source) corpus stats — as ONE
    // Catalyst plan over ONE corpus scan. The keeper test is a min-over-
    // fingerprint-partition window (doc survives iff it holds its text
    // group's minimum id): one hash shuffle on the fingerprint, never a
    // second scan and never a join against a corpus-sized keeper set (a
    // groupBy+semi-join form here would re-scan AND try to broadcast the
    // distinct-texts table — locally fine, impossible at 100 TB). Quality
    // rules and the sample are map-side; the final rollup is a bounded-key
    // agg.
    "p9_curate_e2e" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      val flagged = Tables(s, dir).documents
        .withColumn("n_words", size(toks).cast("long"))
        .withColumn("charsum",
          length(regexp_replace(col("text"), " ", "")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
        .filter(
          !(col("n_words") < 10L || col("n_words") > 10000L) &&
          !(col("charsum") < col("n_words") * 2L ||
            col("charsum") > col("n_words") * 10L) &&
          !(col("n_distinct") * 10L < col("n_words") * 3L))
      val w = Window.partitionBy(md5(col("text").cast("binary")))
      val deduped = flagged
        .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
        .filter(col("keep"))
      val sampled = deduped.filter(hashPct(col("doc_id")) <
        when(col("lang") === "en", 10L).otherwise(50L))
      sampled.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"))
    },

    // Gopher-style repetition rules (Rae et al. 2021, §A.1.1): per-document
    // top-2gram coverage and duplicate-3gram fraction, flagged with INTEGER
    // comparisons (10*c2 > n_words ⇔ top-2gram covers >20% of positions;
    // 10*dup3 > 3*tot3 ⇔ >30% of 3-gram positions are repeats) so Spark and
    // the oracle agree bit-for-bit. Shapes: two explode→hash-agg passes
    // keyed by (doc, gram) then doc — at 100 TB both shuffles are on
    // bounded-cardinality keys, nothing global.
    "p8_repetition" -> { (s, dir) =>
      // MAP-ONLY per-doc stage (r19, guide §2.3/§2.4): the top-bigram
      // count and the duplicated-trigram mass are doc-local, so one
      // sorted run-length pass per window array (TextAnalysis.runStatsSql)
      // replaces the two explode → keyed-agg cascades and their doc join;
      // the only remaining exchange is the final lang-keyed agg. Same
      // 1023-position caps, same >= 3-token gate, same division math.
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tok"))
        .filter(size(col("tok")) >= 3)
        .withColumn("bg", expr(
          "transform(sequence(0, least(size(tok)-2, 1022)), " +
            "i -> concat_ws(' ', slice(tok, i+1, 2)))"))
        .withColumn("tg", expr(
          "transform(sequence(0, least(size(tok)-3, 1022)), " +
            "i -> concat_ws(' ', slice(tok, i+1, 3)))"))
        .select(col("lang"),
          size(col("tok")).cast("long").as("n_words"),
          expr(TextAnalysis.runStatsSql("bg")).getField("top").as("c2"),
          expr(TextAnalysis.runStatsSql("tg")).getField("dup").as("dup3"),
          size(col("tg")).cast("long").as("tot3"))
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("c2") * 10L > col("n_words"), 1L).otherwise(0L))
            .as("n_fail_top2"),
          sum(when(col("dup3") * 10L > col("tot3") * 3L, 1L).otherwise(0L))
            .as("n_fail_dup3"),
          round(sum(col("c2") * 2L) * lit(1.0) / sum(col("n_words")), 6)
            .as("top2_frac"),
          round(sum(col("dup3")) * lit(1.0) / sum(col("tot3")), 6)
            .as("dup3_frac"))
    },

    // Perplexity-style filtering (the CCNet-class curation stage): a
    // unigram LM from the corpus' own term frequencies, each document
    // scored by its mean negative log-likelihood — high-NLL docs are the
    // distribution outliers a perplexity filter drops. Per-term NLL is
    // rounded to 6 digits BEFORE the decimal-exact sum (ln differs by ulps
    // across libm implementations; the rounding makes Spark and the oracle
    // agree bit-for-bit, as in p2). Shapes: one vocab agg, one
    // shuffle-hinted term join (vocabulary is unbounded at corpus scale),
    // one per-doc agg.
    "p10_perplexity" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val tf = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      val tot = tf.agg(sum(col("tf")).as("total"))
      toks.join(tf.hint("shuffle_hash"), "term")
        .crossJoin(tot)
        .withColumn("nll",
          round(log(col("total").cast("double") / col("tf")), 6)
            .cast("decimal(30,15)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum(col("nll")).cast("double") / count(lit(1)), 6)
            .as("avg_nll"))
    },

    // Interpolated-bigram LM filtering (p10's production form — CCNet
    // trains a KenLM on a clean TARGET domain and drops documents the LM
    // finds surprising; here the target is a fixed source subset of the
    // corpus itself). Model: p(w2|w1) = 0.7·c12/c1 + 0.3·(c2+1)/(N+V) —
    // conditional bigram interpolated with an add-one-smoothed unigram
    // back-off, every count an integer over the target, so the only
    // float ops are two divisions, one add and ln — each per-term NLL is
    // rounded to 6 digits BEFORE the decimal-exact sum (the p10/p2 ulp
    // discipline). Per-doc bigrams cap at the first 1023 (the shingle-cap
    // convention, mirrored in the oracle's range(1, 1024)). Shapes: the
    // bigram/unigram tables are vocabulary-sized — shuffle-joined, never
    // broadcast (the p2/p10 law); scoring is one corpus pass + three
    // keyed joins + one per-doc agg. At 100 TB the target-domain counts
    // build once and persist; scoring cost is corpus-linear.
    "p18_bigram_lm" -> { (s, dir) =>
      val targetSources = Seq("src0", "src1", "src2", "src3", "src4")
      val keepNll = 8.0
      val docs2 = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          expr("filter(split(text, ' '), t -> length(t) > 0)").as("tok"))
        .filter(size(col("tok")) >= 2)
      val bg = docs2.select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(0, least(size(tok)-2, 1022))," +
            " i -> struct(tok[i] AS w1, tok[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
      val tgtDocs = docs2.filter(col("source").isin(targetSources: _*))
      val big = bg.filter(col("source").isin(targetSources: _*))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val uni = tgtDocs.select(explode(col("tok")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val nt = uni.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
      // exact op-order parity with the oracle: (0.7·c12)/c1 + (0.3·(c2+1))/(N+V)
      // — the oracle's literals carry explicit CAST(.. AS DOUBLE): a bare
      // 0.7 is DECIMAL(2,1) in DuckDB and the decimal×bigint product is
      // EXACT there while Spark multiplies doubles, a one-ulp divergence
      // that flips ROUND(..,6) whenever a term lands on a rounding boundary
      val p = when(col("c1").isNotNull && col("c12").isNotNull,
          lit(0.7) * col("c12") / col("c1")).otherwise(lit(0.0)) +
        lit(0.3) * (coalesce(col("c2"), lit(0L)) + lit(1L)) /
          (col("n") + col("v"))
      bg.join(big.hint("shuffle_hash"), Seq("w1", "w2"), "left")
        .join(uni.select(col("w").as("w1"), col("c").as("c1"))
          .hint("shuffle_hash"), Seq("w1"), "left")
        .join(uni.select(col("w").as("w2"), col("c").as("c2"))
          .hint("shuffle_hash"), Seq("w2"), "left")
        .crossJoin(nt)
        .withColumn("vterm",
          round(log(lit(1.0) / p), 6).cast("decimal(30,15)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("vterm")).cast("double") / count(lit(1)), 6)
            .as("avg_nll"))
        .withColumn("keep", col("avg_nll") <= keepNll)
    },

    // PII scrub: deterministic synthetic PII is injected per doc_id (the
    // test corpus is clean), then removed with the scrub regexes; the query
    // reports detection counts and the size delta — the audit a redaction
    // pass emits. regexp_replace is codegen'd, the whole op is a pure map.
    "p4_pii_scrub" -> { (s, dir) =>
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      val withPii = Tables(s, dir).documents
        .withColumn("dirty", concat(col("text"),
          when(pmod(col("doc_id"), lit(5L)) === 0L,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .when(pmod(col("doc_id"), lit(5L)) === 1L,
              concat(lit(" call 555-"),
                lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      withPii
        .withColumn("scrubbed",
          regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"))
        .groupBy("lang")
        .agg(
          sum(when(col("dirty").rlike(emailRe), 1L).otherwise(0L)).as("n_email"),
          sum(when(col("dirty").rlike(phoneRe), 1L).otherwise(0L)).as("n_phone"),
          sum(length(col("dirty")).cast("long")).as("len_dirty"),
          sum(length(col("scrubbed")).cast("long")).as("len_scrubbed"))
    })

  /** The 10-round BPE training replayed as chained CTEs: w{r} is the vocab
    * after round r's merge, b{r} the round's argmax pair. Merge application
    * is the same canonical leftmost non-overlapping fold as the Spark side
    * ([[mergeCanonical]]), expressed as DuckDB `list_reduce`.
    */
  private def bpeOracleSql: String = {
    val rows = (1 to BpeMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, x AS left_sym, y AS right_sym, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeTrainingCtes,
       |$bpeRoundCtes
       |$rows""".stripMargin
  }

  /** One p/b/w CTE trio per merge round, shared by the p14/p15 oracles.
    * range(1, 64) is the oracle half of BpePairCap: both sides count only
    * the first 63 adjacent pairs per vocabulary word (Spark:
    * least(size(a)-2, 62) in bpeTrain).
    */
  private def bpeRoundCtes: String =
    (1 to BpeMerges).map { r =>
      s"""p$r AS (SELECT t.x, t.y, CAST(SUM(t.freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, toks[g.i] AS x, toks[g.i+1] AS y
         |        FROM (SELECT freq, string_split(trim(s), ' ') AS toks
         |              FROM w${r - 1}) v,
         |             (SELECT unnest(range(1, 64)) AS i) g
         |        WHERE g.i + 1 <= len(toks)) t
         |  GROUP BY t.x, t.y),
         |b$r AS (SELECT x, y, cnt FROM p$r
         |        ORDER BY cnt DESC, x, y LIMIT 1),
         |w$r AS (SELECT w.word, w.freq,
         |          concat(list_reduce(
         |            list_prepend('', string_split(trim(w.s), ' ')),
         |            (acc, t) -> CASE WHEN t = b.y AND ends_with(acc, ' '||b.x)
         |                        THEN acc || t ELSE acc || ' ' || t END),
         |            ' ') AS s
         |        FROM w${r - 1} w CROSS JOIN b$r b)""".stripMargin
    }.mkString(",\n")

  /** The shared w0 vocabulary CTE (spaced-char segmentation + corpus
    * frequency) the p14/p15 oracles both start from.
    */
  private def bpeTrainingCtes: String =
    """w0 AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
      |    ' '||regexp_replace(word, '(.)', '\1 ', 'g') AS s
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE regexp_full_match(word, '[a-z]+')
      |  GROUP BY word)""".stripMargin

  /** p15: the same 10 training rounds, then piece counts per word joined
    * back onto the corpus word stream.
    */
  private def bpeTokenizeOracleSql: String = {
    s"""WITH $bpeTrainingCtes,
       |$bpeRoundCtes,
       |pieces AS (SELECT word,
       |             CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS np
       |           FROM w$BpeMerges),
       |corpus AS (SELECT lang, unnest(string_split(text, ' ')) AS word
       |           FROM documents)
       |SELECT c.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(p.np) AS BIGINT) AS n_pieces
       |FROM corpus c JOIN pieces p ON c.word = p.word
       |GROUP BY c.lang""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // The enumeration bound (4096 candidate windows/doc ≈ 196k tokens at
    // stride 48) is an ORACLE-side device only — the Spark side computes
    // the exact chunk count, the bound just has to exceed any document in
    // the test corpus (same convention as p11's range(1, 1024) gram walk).
    "p16_chunking" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
         |              FROM documents),
         |st AS (SELECT doc_id, a, g.i AS chunk_id
         |       FROM toks, (SELECT unnest(range(0, 4096)) AS i) g
         |       WHERE g.i < (len(a) + ${ChunkStride - 1}) // $ChunkStride)
         |SELECT doc_id, chunk_id,
         |  chunk_id * $ChunkStride AS start_token,
         |  CAST(len(a[chunk_id * $ChunkStride + 1 :
         |             chunk_id * $ChunkStride + $ChunkSize]) AS BIGINT)
         |    AS n_tokens,
         |  array_to_string(a[chunk_id * $ChunkStride + 1 :
         |                    chunk_id * $ChunkStride + $ChunkSize], ' ')
         |    AS chunk
         |FROM st""".stripMargin,
    // the NAIVE per-source ranked prefix (one cumulative window over
    // (bucket DESC, doc_id)) — p19's histogram/boundary split must equal
    // it exactly; qagg/qual come from TextAnalysis.qualityCte
    "p19_budget_select" ->
      s"""WITH ${TextAnalysis.qualityCte},
         |d AS (SELECT a.doc_id, doc.source, a.n_tokens,
         |        ROUND(q.quality_score, 2) AS quality_bucket
         |      FROM qagg a
         |      JOIN qual q ON a.doc_id = q.doc_id
         |      JOIN documents doc ON a.doc_id = doc.doc_id),
         |cum AS (SELECT doc_id, source, n_tokens, quality_bucket,
         |          SUM(n_tokens) OVER (PARTITION BY source
         |            ORDER BY quality_bucket DESC, doc_id
         |            ROWS UNBOUNDED PRECEDING) AS c
         |        FROM d)
         |SELECT doc_id, source, n_tokens, quality_bucket
         |FROM cum WHERE c <= $BudgetTokens""".stripMargin,
    // 15 hex digits < 2^60, so hv is non-negative and % equals Spark's pmod
    "p17_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(('0x'||substr(md5('shuf:'||CAST(doc_id AS VARCHAR)),1,15))
         |    AS BIGINT) AS hv
         |  FROM documents)
         |SELECT doc_id, hv % $ShuffleShards AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY hv % $ShuffleShards
         |    ORDER BY hv, doc_id) AS BIGINT) AS pos
         |FROM h""".stripMargin,

    // the bounded top-k aggregation must equal the per-source ranked
    // prefix exactly (hash ASC, doc_id tie-break)
    "p20_eval_holdout" ->
      s"""WITH h AS (SELECT source, doc_id,
         |  CAST(('0x'||substr(md5('holdout:'||text),1,15)) AS BIGINT) AS h
         |  FROM documents WHERE text IS NOT NULL),
         |r AS (SELECT source, doc_id, h,
         |  ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY h, doc_id) AS rank FROM h)
         |SELECT source, doc_id, h, rank FROM r WHERE rank <= $HoldoutK""".stripMargin,

    // same decimal-summed sqrt and the same explicit association as the
    // Spark side: budget * (sqrt_i / sroot) / n_tokens
    "p22_temperature_mix" ->
      s"""WITH tok AS (SELECT source,
         |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
         |                AS n_tokens
         |            FROM documents WHERE text IS NOT NULL
         |            GROUP BY source),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
         |          CAST(SUM(CAST(sqrt(n_tokens) AS DECIMAL(30,15)))
         |            AS DOUBLE) AS sroot
         |        FROM tok)
         |SELECT source, n_tokens,
         |  ROUND(n_tokens / tot, 6) AS raw_share,
         |  ROUND(sqrt(n_tokens) / sroot, 6) AS temp_share,
         |  ROUND($BudgetTokens.0 * (sqrt(n_tokens) / sroot) / n_tokens, 6)
         |    AS eff_epochs
         |FROM tok CROSS JOIN tot""".stripMargin,

    // d6's transitive-closure labels (recursive CTE) left-joined onto the
    // full doc census; singletons (no near-dup edge) keep themselves
    "p21_dedup_survivorship" ->
      s"""WITH RECURSIVE ${Dedup.jaccardOracleCteCapped},
         |near AS (SELECT doc_a, doc_b FROM jac
         |         WHERE jaccard >= ${Dedup.JaccardThreshold}),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM near
         |          UNION ALL SELECT doc_b, doc_a FROM near),
         |reach(doc, lbl) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.doc = e.a),
         |lab AS (SELECT doc AS doc_id, MIN(lbl) AS lbl FROM reach GROUP BY doc),
         |d AS (SELECT doc_id, source,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |      FROM documents),
         |f AS (SELECT d.source, d.n_tokens,
         |        (lab.lbl IS NULL OR lab.lbl = d.doc_id) AS keeper
         |      FROM d LEFT JOIN lab ON d.doc_id = lab.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(SUM(CASE WHEN keeper THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tokens_kept,
         |  ROUND(SUM(CASE WHEN keeper THEN n_tokens ELSE 0 END) * 1.0
         |    / SUM(n_tokens), 6) AS kept_ratio
         |FROM f GROUP BY source""".stripMargin,

    "p14_bpe_merges" -> bpeOracleSql,
    "p15_bpe_tokenize" -> bpeTokenizeOracleSql,
    "p12_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |t2 AS (SELECT doc_id, source,
        |         CAST(('0x'||substr(md5(t),1,15)) AS BIGINT) % 1024 AS b
        |       FROM toks WHERE length(t) > 0),
        |rc AS (SELECT b, COUNT(*) AS cr,
        |         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS ct
        |       FROM t2 GROUP BY b),
        |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS rtot,
        |          CAST(SUM(ct) AS BIGINT) AS ttot FROM rc),
        |tab AS (SELECT b,
        |          CAST(ROUND(ln(CAST(ct + 1 AS DOUBLE) / (ttot + 1024))
        |            - ln(CAST(cr + 1 AS DOUBLE) / (rtot + 1024)), 6)
        |            AS DECIMAL(30,15)) AS lr
        |        FROM rc CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  ROUND(CAST(SUM(lr) AS DOUBLE), 6) AS dsir_weight,
        |  ROUND(CAST(SUM(lr) AS DOUBLE), 6) > 0 AS selected
        |FROM t2 JOIN tab USING (b)
        |GROUP BY doc_id""".stripMargin,
    "p11_span_dedup" -> {
      val gram = (0 until 8).map(j => s"tok[g.i+$j]").mkString("||' '||")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
         |g8 AS (SELECT doc_id, $gram AS g
         |       FROM toks, (SELECT unnest(range(1, 1024)) AS i) g
         |       WHERE g.i + 7 <= len(tok)),
         |df8 AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM g8 GROUP BY g)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN df > $SpanDfCap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boilerplate,
         |  ROUND(SUM(CASE WHEN df > $SpanDfCap THEN 1 ELSE 0 END) * 1.0
         |    / COUNT(*), 6) AS boilerplate_ratio,
         |  (SUM(CASE WHEN df > $SpanDfCap THEN 1 ELSE 0 END) * 1.0
         |    / COUNT(*)) < 0.5 AS keep
         |FROM g8 JOIN df8 USING (g)
         |GROUP BY doc_id""".stripMargin
    },
    // the seen-gram replay: DISTINCT 8-token windows (position cap
    // mirrored), eval = the %97 slice, train side left-joined back onto
    // the doc spine so short/clean docs keep their verdict rows
    "p26_ngram_decontam" -> {
      val gram = (0 until 8).map(j => s"tok[w.i+$j]").mkString("||' '||")
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
         |g AS (SELECT DISTINCT doc_id, $gram AS s
         |      FROM tk, (SELECT unnest(range(1, 1024)) AS i) w
         |      WHERE w.i + 7 <= len(tok)),
         |bench AS (SELECT DISTINCT s FROM g WHERE doc_id % $DecontamEvalMod = 0),
         |tr AS (SELECT doc_id, s FROM g WHERE doc_id % $DecontamEvalMod <> 0),
         |nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM tr GROUP BY doc_id),
         |nc AS (SELECT tr.doc_id, COUNT(*) AS n_contam
         |       FROM tr JOIN bench USING (s) GROUP BY tr.doc_id)
         |SELECT d.doc_id, d.source,
         |  CAST(COALESCE(nw.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(COALESCE(nc.n_contam, 0) AS BIGINT) AS n_contam,
         |  CASE WHEN COALESCE(nw.n_windows, 0) = 0 THEN 0.0
         |       ELSE ROUND(COALESCE(nc.n_contam, 0) * 1.0 / nw.n_windows, 6)
         |  END AS contam_frac,
         |  CASE WHEN COALESCE(nc.n_contam, 0) * $DecontamDropDen
         |            > COALESCE(nw.n_windows, 0) * $DecontamDropNum
         |         THEN 'drop'
         |       WHEN COALESCE(nc.n_contam, 0) > 0 THEN 'strip'
         |       ELSE 'keep'
         |  END AS verdict
         |FROM documents d
         |LEFT JOIN nw ON d.doc_id = nw.doc_id
         |LEFT JOIN nc ON d.doc_id = nc.doc_id
         |WHERE d.doc_id % $DecontamEvalMod <> 0""".stripMargin
    },
    "p1_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |GROUP BY lang""".stripMargin,
    "p2_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |toks2 AS (SELECT * FROM toks WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |       FROM toks2 GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "p3_seq_packing" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 32 AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |cums AS (
        |  SELECT bucket, tokens,
        |    SUM(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM toks)
        |SELECT bucket, CAST(FLOOR((cum - tokens) / 512) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens
        |FROM cums GROUP BY 1, 2""".stripMargin,
    "p5_gopher_quality" ->
      """WITH scored AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS charsum,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |  FROM documents),
        |flagged AS (
        |  SELECT lang,
        |    (n_words < 10 OR n_words > 10000) AS fail_nwords,
        |    (charsum < n_words * 2 OR charsum > n_words * 10) AS fail_wordlen,
        |    (n_distinct * 10 < n_words * 3) AS fail_ttr
        |  FROM scored)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN fail_nwords THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_nwords,
        |  CAST(SUM(CASE WHEN fail_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wordlen,
        |  CAST(SUM(CASE WHEN fail_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_ttr,
        |  CAST(SUM(CASE WHEN NOT fail_nwords AND NOT fail_wordlen
        |       AND NOT fail_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM flagged GROUP BY lang""".stripMargin,
    // identical result law as p6 — the bloom is a pure prefilter (false
    // positives only, removed by the exact confirm join)
    "p13_bloom_contamination" -> contaminationOracle,
    "p6_contamination" -> contaminationOracle) ++ moreOracles

  private def contaminationOracle: String =
      s"""WITH ${Dedup.shinglesSql},
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |hits AS (SELECT DISTINCT c.doc_id, c.s
         |         FROM sh c JOIN bench b ON c.s = b.s
         |         WHERE c.doc_id % 97 <> 0),
         |per_doc AS (SELECT doc_id, COUNT(*) AS n_sh FROM hits GROUP BY 1)
         |SELECT d.lang, COUNT(*) AS n_contam_docs,
         |  CAST(SUM(p.n_sh) AS BIGINT) AS n_shared_shingles
         |FROM per_doc p JOIN documents d USING (doc_id)
         |GROUP BY d.lang""".stripMargin

  /** A `def` (not val): referenced from `oracles`' initializer above. */
  private def moreOracles: Map[String, String] = Map(
    // per-column census replayed (same rendering contract: native-typed
    // min/max cast to VARCHAR, timestamps as epoch micros)
    "p24_profile" -> {
      val cols = Seq(
        ("event_id", "event_id"), ("ts", "epoch_us(ts)"),
        ("user_id", "user_id"), ("event_type", "event_type"),
        ("value", "value"), ("props", "props"))
      cols.map { case (n, e) =>
        s"""SELECT '$n' AS col_name, COUNT(*) AS n_rows,
           |  CAST(COUNT(*) - COUNT($e) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $e) AS BIGINT) AS n_distinct,
           |  CAST(MIN($e) AS VARCHAR) AS min_s,
           |  CAST(MAX($e) AS VARCHAR) AS max_s
           |FROM events""".stripMargin
      }.mkString("", "\nUNION ALL\n", "")
    },

    // the A-ES draw replayed: a2's quality CTEs for w, the same seeded
    // 52-bit uniform, the same round-before-rank + doc_id tiebreak
    "p25_weighted_sample" ->
      s"""WITH ${TextAnalysis.qualityCte},
         |k AS (
         |  SELECT d.source, q.doc_id, q.quality_score,
         |    ROUND(ln((CAST(('0x'||substr(md5('ws'||CAST(q.doc_id AS VARCHAR)), 1, 13))
         |          AS BIGINT) + 0.5) / 4503599627370496.0)
         |      / q.quality_score, 6) AS sample_key
         |  FROM qual q JOIN documents d USING (doc_id)),
         |r AS (
         |  SELECT source, doc_id, quality_score, sample_key,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY sample_key DESC, doc_id) AS BIGINT) AS rank
         |  FROM k)
         |SELECT source, doc_id, quality_score, sample_key, rank
         |FROM r WHERE rank <= 10""".stripMargin,

    "p23_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '),
        |                       t -> length(t) > 0)) AS w
        |  FROM documents),
        |pt AS (SELECT w, COUNT(*) AS cp FROM toks
        |       WHERE source IN ('src0','src1','src2','src3','src4')
        |       GROUP BY 1),
        |ng AS (SELECT w, COUNT(*) AS cn FROM toks
        |       WHERE source IN ('src15','src16','src17','src18','src19')
        |       GROUP BY 1),
        |vocab AS (SELECT COALESCE(pt.w, ng.w) AS w, pt.cp, ng.cn
        |          FROM pt FULL OUTER JOIN ng ON pt.w = ng.w),
        |st AS (SELECT CAST(SUM(COALESCE(cp, 0)) AS BIGINT) AS np,
        |              CAST(SUM(COALESCE(cn, 0)) AS BIGINT) AS nn,
        |              CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        |llr AS (
        |  SELECT t.doc_id, t.source,
        |    CAST(ROUND(
        |      ln(CAST(COALESCE(vb.cp, 0) + 1 AS DOUBLE) / (st.np + st.v)) -
        |      ln(CAST(COALESCE(vb.cn, 0) + 1 AS DOUBLE) / (st.nn + st.v)),
        |      6) AS DECIMAL(30,15)) AS term
        |  FROM toks t
        |  LEFT JOIN vocab vb ON t.w = vb.w
        |  CROSS JOIN st
        |  WHERE t.source NOT IN ('src0','src1','src2','src3','src4',
        |                         'src15','src16','src17','src18','src19'))
        |SELECT doc_id, source, COUNT(*) AS n_tokens,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS llr_score,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) > 0.0 AS keep
        |FROM llr GROUP BY doc_id, source""".stripMargin,
    "p7_domain_mix" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |               COUNT(*) AS nsrc FROM counts),
        |rates AS (
        |  SELECT source, n_docs,
        |    LEAST(100, (100 * (total // nsrc)) // n_docs) AS rate_pct
        |  FROM counts CROSS JOIN tot),
        |kept AS (
        |  SELECT d.source, COUNT(*) AS n_kept
        |  FROM documents d JOIN rates r USING (source)
        |  WHERE CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100
        |        < r.rate_pct
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.rate_pct,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        |FROM rates r LEFT JOIN kept k USING (source)""".stripMargin,
    // interpolated bigram over the src0-src4 target; op-order and the
    // per-term round-then-decimal-sum mirror the Spark side exactly
    "p18_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS tok
        |  FROM documents),
        |docs2 AS (SELECT * FROM toks WHERE len(tok) >= 2),
        |bg AS (SELECT doc_id, source, tok[g.i] AS w1, tok[g.i + 1] AS w2
        |       FROM docs2, (SELECT unnest(range(1, 1024)) AS i) g
        |       WHERE g.i <= len(tok) - 1),
        |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg
        |        WHERE source IN ('src0','src1','src2','src3','src4')
        |        GROUP BY 1, 2),
        |tu AS (SELECT w, COUNT(*) AS c FROM (
        |         SELECT unnest(tok) AS w FROM docs2
        |         WHERE source IN ('src0','src1','src2','src3','src4'))
        |       GROUP BY 1),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |              CAST(COUNT(*) AS BIGINT) AS v FROM tu),
        |nll AS (SELECT b.doc_id,
        |          CAST(ROUND(ln(1.0 / (
        |            CASE WHEN u1.c IS NOT NULL AND bi.c12 IS NOT NULL
        |                 THEN CAST(0.7 AS DOUBLE) * bi.c12 / u1.c
        |                 ELSE 0.0 END
        |            + CAST(0.3 AS DOUBLE) * (COALESCE(u2.c, 0) + 1)
        |              / (nt.n + nt.v))), 6)
        |            AS DECIMAL(30,15)) AS vterm
        |        FROM bg b
        |        LEFT JOIN big bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
        |        LEFT JOIN tu u1 ON b.w1 = u1.w
        |        LEFT JOIN tu u2 ON b.w2 = u2.w
        |        CROSS JOIN nt)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(CAST(SUM(vterm) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
        |  ROUND(CAST(SUM(vterm) AS DOUBLE) / COUNT(*), 6) <= 8.0 AS keep
        |FROM nll GROUP BY doc_id""".stripMargin,
    "p10_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t2 AS (SELECT * FROM toks WHERE length(term) > 0),
        |tf AS (SELECT term, COUNT(*) AS tf FROM t2 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tf),
        |nll AS (
        |  SELECT doc_id,
        |    CAST(ROUND(ln(CAST(total AS DOUBLE) / tf), 6) AS DECIMAL(30,15)) AS v
        |  FROM t2 JOIN tf USING (term) CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS avg_nll
        |FROM nll GROUP BY doc_id""".stripMargin,
    "p9_curate_e2e" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, source, text, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS charsum,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |  FROM documents),
        |passed AS (
        |  SELECT * FROM scored
        |  WHERE NOT (n_words < 10 OR n_words > 10000)
        |    AND NOT (charsum < n_words * 2 OR charsum > n_words * 10)
        |    AND NOT (n_distinct * 10 < n_words * 3)),
        |keepers AS (
        |  SELECT MIN(doc_id) AS doc_id FROM passed GROUP BY md5(text)),
        |deduped AS (
        |  SELECT p.* FROM passed p JOIN keepers k USING (doc_id)),
        |sampled AS (
        |  SELECT * FROM deduped
        |  WHERE CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100
        |        < CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM sampled GROUP BY lang, source""".stripMargin,
    "p8_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents),
        |ok AS (SELECT * FROM toks WHERE len(tok) >= 3),
        |g2 AS (SELECT doc_id, lang, CAST(len(tok) AS BIGINT) AS n_words,
        |         tok[g.i]||' '||tok[g.i+1] AS g
        |       FROM ok, (SELECT unnest(range(1, 1024)) AS i) g
        |       WHERE g.i + 1 <= len(tok)),
        |c2 AS (SELECT doc_id, lang, n_words, MAX(c) AS c2
        |       FROM (SELECT doc_id, lang, n_words, g, COUNT(*) AS c
        |             FROM g2 GROUP BY 1, 2, 3, 4)
        |       GROUP BY 1, 2, 3),
        |g3 AS (SELECT doc_id, tok[g.i]||' '||tok[g.i+1]||' '||tok[g.i+2] AS g
        |       FROM ok, (SELECT unnest(range(1, 1024)) AS i) g
        |       WHERE g.i + 2 <= len(tok)),
        |d3 AS (SELECT doc_id,
        |         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup3,
        |         CAST(SUM(c) AS BIGINT) AS tot3
        |       FROM (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2)
        |       GROUP BY 1)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN c2 * 10 > n_words THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fail_top2,
        |  CAST(SUM(CASE WHEN dup3 * 10 > tot3 * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fail_dup3,
        |  ROUND(SUM(c2 * 2) * 1.0 / SUM(n_words), 6) AS top2_frac,
        |  ROUND(SUM(dup3) * 1.0 / SUM(tot3), 6) AS dup3_frac
        |FROM c2 JOIN d3 USING (doc_id) GROUP BY lang""".stripMargin,
    "p4_pii_scrub" ->
      """WITH dirtied AS (
        |  SELECT lang, text ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN ' contact user' || doc_id || '@example.com'
        |         WHEN doc_id % 5 = 1
        |           THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS dirty
        |  FROM documents),
        |scrubbed AS (
        |  SELECT lang, dirty,
        |    regexp_replace(
        |      regexp_replace(dirty, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        |  FROM dirtied)
        |SELECT lang,
        |  CAST(SUM(CASE WHEN regexp_matches(dirty, '[a-z0-9]+@[a-z]+\.[a-z]+')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
        |  CAST(SUM(CASE WHEN regexp_matches(dirty, '[0-9]{3}-[0-9]{4}')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
        |  CAST(SUM(length(dirty)) AS BIGINT) AS len_dirty,
        |  CAST(SUM(length(clean)) AS BIGINT) AS len_scrubbed
        |FROM scrubbed GROUP BY lang""".stripMargin)
}
