package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the training-data
  * pipeline layer (builder brief): exact, word-ngram Jaccard, MinHash+LSH,
  * SimHash. Every hash is md5-derived so the DuckDB oracle can reproduce it
  * bit-for-bit (no engine-specific hash functions).
  *
  * Scale notes (100 TB):
  *   - shingling/explode is map-side; the only shuffles are the
  *     groupBy(doc_id) signature builds and the shingle/bucket equi-joins —
  *     all on keys Catalyst hash-partitions;
  *   - the LSH candidate join is the point: candidates ≪ n², so the exact
  *     Jaccard verification join touches only colliding pairs (band join ≈
  *     O(collisions), never O(n²));
  *   - SimHash is a pure per-row map + one aggregation, no joins at all.
  */
object Dedup {

  /** 60-bit integer from the first 15 hex chars of md5 — deterministic and
    * identical in Spark and DuckDB.
    */
  private[analytics] def md5long(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private[analytics] val Prime = 1000000007L

  /** (a, b) parameters of the 8 minhash permutations h_i = (a*h+b) mod p. */
  private[analytics] val MinhashParams: Seq[(Int, Int)] = Seq(
    (387, 1031), (1049, 2477), (2503, 4099), (4111, 8221),
    (8231, 16411), (16417, 32771), (32779, 65537), (65539, 131071))

  private[analytics] val JaccardThreshold = 0.5

  /** d12: max normalized edit distance (1 − edit similarity) for a
    * candidate pair to count as a character-level near-dup. 0.2 ≡ edit
    * similarity ≥ 0.8 — on the test corpus this admits exactly the planted
    * near-dup pairs (background band collisions sit at ~0.7 median
    * normalized distance).
    */
  private val EditDupMaxDist = 0.2

  /** d13: the contained side must share ≥ 80% of its shingles. */
  private val ContainmentThreshold = 0.8

  /** Max document-frequency a shingle may have and still participate in
    * `jaccardPairs`. A shingle present in k documents contributes k² rows on
    * ONE shuffle key in the self-join — locally invisible, quadratic at
    * corpus scale (a common 3-gram lands millions of docs on one partition).
    * High-df shingles carry no dedup signal (every production near-dup
    * pipeline drops them), so both the pair join AND the per-doc sizes use
    * the capped set — Jaccard is computed over informative shingles only.
    * Grows sub-linearly with corpus size in production; fixed here so the
    * DuckDB oracle can mirror it exactly.
    */
  private[analytics] val ShingleDfCap = 256L

  /** d15: max document-frequency for an 8-token window fingerprint —
    * tighter than [[ShingleDfCap]] because an exact 8-gram present in
    * >64 docs is boilerplate, which substring dedup deliberately ignores.
    */
  private[analytics] val SubstringDfCap = 64L

  /** doc_id + distinct word-3gram shingles. Distinctness is DOC-LOCAL
    * (array_distinct before the explode): duplicate (doc_id, s) rows can
    * only arise within one document's own window list, so the per-row set
    * is exactly the global-distinct set — t20's streaming gate has always
    * relied on this law — and the map-side form removes the full
    * (doc_id, s) exchange + hash-aggregate a global `.distinct()` pays
    * (guide §2.4: the corpus-sized shingle table is the largest
    * intermediate every dedup operator shares).
    */
  private[analytics] def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), explode(expr(
        // cap matches the oracle's range(1, 1024): both sides consider at
        // most the first 1023 shingle positions of pathological documents
        "array_distinct(transform(sequence(0, least(size(tok)-3, 1022)), i -> concat_ws(' ', slice(tok, i+1, 3))))"))
        .as("s"))

  /** All 8 permutation minima in ONE aggregation over hashed shingle rows
    * (doc_id, hm), unpivoted to (doc_id, i, mh) — shuffles |shingles| rows
    * once instead of 8× blown up through a crossJoin with the parameter
    * table. Shared by d3 / d10 / d11.
    */
  private[analytics] def minhashStack(sh: DataFrame): DataFrame = {
    val minCols = MinhashParams.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a.toLong) * col("hm") + lit(b.toLong)) % Prime).as(s"mh$i")
    }
    val stackArgs = MinhashParams.indices.map(i => s"$i, mh$i").mkString(", ")
    sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        expr(s"stack(${MinhashParams.size}, $stackArgs) AS (i, mh)"))
  }

  /** LSH band-join candidates at band size `r` — THE selectivity knob the
    * sf10 gate's analysis names (BENCH_SF1.md): the 8 permutation minima
    * split into 8/r bands of r consecutive rows, and a pair is a candidate
    * iff some band matches on ALL r minhashes. P(candidate) for a pair at
    * Jaccard j is 1−(1−j^r)^(8/r): r=1 (d3/d10/d11's oracle-mirrored
    * default, ≈8j for small j) maximizes recall; r=2 drops background
    * collisions to ≈4j² — two orders of magnitude at j≈0.03 — while
    * keeping ≥96% recall at the 0.5 dedup threshold. At 10⁹ documents the
    * sub-threshold candidate stream is the verify stage's whole cost, so
    * production picks r from the measured d11 S-curve. Plan shape is
    * r-invariant: one keyed aggregation to the band key, one shuffled
    * equi-join on (band, key). Output: (doc_a, doc_b) distinct.
    */
  private[analytics] def bandCandidates(mh: DataFrame, r: Int): DataFrame = {
    require(r >= 1 && MinhashParams.size % r == 0, s"bad band size $r")
    // band key = the r (i, mh) rows sorted by i — deterministic under
    // collect_list's arbitrary order, exact (no hash collisions)
    val banded = mh
      .withColumn("b", (col("i") / r).cast("int"))
      .groupBy("doc_id", "b")
      .agg(sort_array(collect_list(struct(col("i"), col("mh")))).as("key"))
    banded.as("x").hint("shuffle_hash")
      .join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH band-join candidate pairs at band size 1 over a minhash signature
    * table (doc_id, i, mh) — the shared candidate scheme behind d3's
    * Jaccard verify and d12's edit-distance verify (d10 runs the same join
    * across the batch/reference split). Equality on (i, mh) —
    * O(collisions), never the all-pairs signature comparison;
    * shuffle-hinted because the signature table is corpus-sized (8
    * rows/doc — never broadcastable). Band size r > 1 goes through
    * [[bandCandidates]] (r=1 equivalence law-tested in DedupSpec).
    */
  private def lshBandCandidates(mh: DataFrame): DataFrame =
    mh.as("x").hint("shuffle_hash")
      .join(mh.as("y"),
        col("x.i") === col("y.i") && col("x.mh") === col("y.mh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** One capped-shingle frame per (session, shingle plan, input files).
    * Five operators verify over the SAME capped shingle set (d2, d6, d9,
    * d13, p21), and a per-call persist would cache up to five identical
    * copies of it in one Verify session. Keyed by the canonicalized input
    * plan (same dataset dir → same plan → same blocks; synthetic spec
    * frames key separately), so every caller shares one set of blocks. A
    * `clearCache` between queries (Bench) drops the blocks but not the
    * memo entry — the storage-level check in [[jaccardPairs]] re-persists
    * on next use. Two lifecycle guards (both latent hazards, neither
    * reachable from Bench/Verify's static-dir single-session flows):
    * the outer map holds sessions WEAKLY, so a stopped, dereferenced
    * session's entries are GC-reclaimable instead of pinned for the JVM
    * lifetime; and the key includes the input-file listing hash, because
    * InMemoryFileIndex equality is rootPaths-based — a fresh read of a
    * REWRITTEN dataset dir canonicalizes to the same plan but must not
    * memo-hit a frame whose file listing was snapshotted pre-rewrite.
    */
  private val cappedShingleMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long),
        DataFrame]]())

  /** Order-insensitive hash of a frame's input-file listing (public
    * `Dataset.inputFiles` — parquet rewrites mint fresh part-file UUIDs,
    * so a rewritten dir always changes this). Empty/in-memory inputs
    * hash to 0 and key purely on the canonicalized plan.
    */
  private def inputFilesHash(df: DataFrame): Long =
    df.inputFiles.foldLeft(0L)((h, f) => h ^ scala.util.hashing.MurmurHash3
      .stringHash(f).toLong)

  /** Exact Jaccard over shared shingles for co-occurring pairs.
    *
    * The CAPPED shingle set feeds three plan branches (per-doc sizes + both
    * sides of the self-join), so it persists here (MEMORY_AND_DISK —
    * executors spill, not OOM) instead of replaying the
    * explode+distinct+cap shuffles per branch — and since d2, d6, d9, d13
    * and p21 all call this over the same corpus, the persisted frame is
    * memoized per (session, input plan) so one session holds ONE copy, not
    * five. The query session frees the blocks via `clearCache` (Bench) or
    * session teardown (Verify).
    */
  private[analytics] def jaccardPairs(shRaw: DataFrame): DataFrame = {
    val sessionMemo = cappedShingleMemo.synchronized {
      var m = cappedShingleMemo.get(shRaw.sparkSession)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long),
          DataFrame]()
        cappedShingleMemo.put(shRaw.sparkSession, m)
      }
      m
    }
    val memoKey =
      (shRaw.queryExecution.analyzed.canonicalized, inputFilesHash(shRaw))
    val sh = sessionMemo.computeIfAbsent(memoKey,
      _ => cappedShingles(shRaw, ShingleDfCap))
    if (sh.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardFromCapped(sh)
  }

  /** The df-capped shingle set at cap `cap` — drop stop-shingles BEFORE
    * the self-join (see [[ShingleDfCap]]). The df table is
    * vocabulary-sized — unbounded, so the semi-join is shuffle-hinted like
    * every other corpus-scale side.
    */
  private def cappedShingles(shRaw: DataFrame, cap: Long): DataFrame = {
    val keep = shRaw.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
      .select("s")
    shRaw.join(keep.hint("shuffle_hash"), Seq("s"), "left_semi")
  }

  /** [[jaccardPairs]]' tail over an already-capped (and persisted) shingle
    * set. The per-doc sizes table is corpus-sized — locally tiny,
    * unbounded at scale, so the attach joins are shuffle-hinted (AQE would
    * otherwise broadcast it and hide the shape that matters at 100 TB).
    */
  private def jaccardFromCapped(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na").hint("shuffle_hash"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb").hint("shuffle_hash"), "doc_b")
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
  }

  /** [[jaccardPairs]] with the df-cap knob surfaced (no memo — each cap is
    * its own run): cap = [[ShingleDfCap]] IS the oracle-mirrored default.
    * The knob receipt for the d2/d13 family: banding (r) bounds d10's
    * collision stream, the df-cap bounds the shingle self-join's — a
    * shingle at df k contributes k² pair rows on ONE shuffle key, so
    * halving the cap bounds the worst key's quadratic toll at the cost of
    * ignoring mid-frequency shingles in the Jaccard/containment estimate.
    */
  private[graft] def jaccardPairsWith(shRaw: DataFrame,
      cap: Long): DataFrame = {
    val sh = cappedShingles(shRaw, cap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardFromCapped(sh)
  }

  /** d13's output projection over a jaccard-pair table: both directions of
    * the containment unpivot, thresholded, with the sym_dup flag.
    */
  private def d13Project(pairs: DataFrame): DataFrame =
    pairs
      .select(explode(array(
        struct(col("doc_a").as("doc_inner"), col("doc_b").as("doc_outer"),
          (col("common") / col("na")).as("containment"), col("jaccard")),
        struct(col("doc_b").as("doc_inner"), col("doc_a").as("doc_outer"),
          (col("common") / col("nb")).as("containment"), col("jaccard"))))
        .as("e"))
      .select(col("e.*"))
      .filter(col("containment") >= ContainmentThreshold)
      .select(col("doc_inner"), col("doc_outer"),
        round(col("containment"), 6).as("containment"),
        round(col("jaccard"), 6).as("jaccard"),
        (col("jaccard") >= JaccardThreshold).as("sym_dup"))

  /** d13 with the df-cap knob surfaced — cap = [[ShingleDfCap]] IS
    * d13_containment (DedupSpec pins the equality). The DfCapProbe
    * harness prices this knob at sf10 the way BandingProbe priced d10's r.
    */
  private[graft] def d13With(s: org.apache.spark.sql.SparkSession,
      dir: String, cap: Long): DataFrame =
    d13Project(jaccardPairsWith(shingles(Tables(s, dir).documents), cap))

  /** The co-occurring-pair stream size at cap — the collision receipt for
    * BENCH_SF1's df-cap subsection (measured, not asserted).
    */
  private[graft] def d13PairCount(s: org.apache.spark.sql.SparkSession,
      dir: String, cap: Long): Long =
    jaccardPairsWith(shingles(Tables(s, dir).documents), cap).count()

  /** Materialize AND fully sever `df`: localCheckpoint truncates the RDD
    * lineage but copies the PRODUCING plan's size estimate onto the
    * resulting LogicalRDD, and Catalyst's size-only stats visitor
    * MULTIPLIES child sizeInBytes across join nodes as BigInts. In an
    * iterative self-join loop the round-N stat therefore contains the
    * round-N-1 stat as a factor twice, so the digit count DOUBLES every
    * round and the driver ends up in exponential BigInteger math during
    * planning (d8 at sf0.1: rounds 1-15 ~0.4 s, round 20 ~36 s, round 22
    * ~259 s; 1210 s total). Rebuilding the frame from the checkpointed
    * RDD resets the stat to the constant session default — round times
    * stay flat and the hinted join strategies don't consult it anyway.
    */
  private final case class Severed(df: DataFrame, release: () => Unit)

  private def checkpointSevered(df: DataFrame): Severed = {
    val cp = df.localCheckpoint(true)
    // The MEMORY_AND_DISK blocks backing the checkpoint belong to the
    // internal RDD inside the LogicalRDD plan node; calling unpersist on
    // the REBUILT frame is a cache-manager lookup that never finds them,
    // so a long contraction run would accumulate one materialized edge set
    // per round until GC. Hand the caller the actual RDD handle instead.
    // Only release once nothing can re-read the round's edges: the
    // checkpoint IS the data (lineage is truncated), so a post-release
    // read would fail rather than recompute.
    val internal = cp.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    Severed(cp.sparkSession.createDataFrame(cp.rdd, cp.schema),
      () => internal.foreach(_.unpersist(blocking = false)))
  }

  /** Connected components over an undirected pair graph by LARGE-STAR /
    * SMALL-STAR alternation (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — the reference algorithm for
    * corpus-scale dedup graphs). The edge set itself is rewritten each
    * round; at fixpoint it is a star forest rooted at each component's
    * minimum id, which IS the label assignment.
    *
    * Per round, with m(u) = min(N(u) ∪ {u}) over the current edges:
    *   - large-star: every neighbor v > u re-attaches to m(u). Long paths
    *     halve (edge (u,u+1) becomes (u+1,u-1)), so chains converge in
    *     O(log diameter) rounds.
    *   - small-star: every neighbor v <= u (and u itself) re-attaches to
    *     m(u), collapsing the partial stars toward the minimum.
    * Every rewrite replaces an edge endpoint with something strictly
    * smaller in the same component, so edges only move toward component
    * minima (termination + correctness; the paper proves O(log^2 n)
    * worst-case rounds, and measured rounds are small: 8 on the sf0.1
    * embedding near-dup graph vs 23 for min-label + pointer halving, 9 on
    * a 200-node chain, 1 on a star).
    *
    * Why this shape at 100 TB: per-round cost is proportional to the
    * CURRENT edge count, which contracts geometrically as components
    * collapse (min-label propagation re-shuffles the full corpus-sized
    * label AND edge tables every round instead). The neighborhood minima
    * come from one hash aggregation, so a crawl-graph supernode's edges
    * are combined map-side rather than piling onto one reducer key.
    *
    * @param pairs undirected edges as (doc_a, doc_b), one direction per
    *              pair, IRREFLEXIVE (no (a, a) rows — every caller emits
    *              a < b; the node set is read off the edge endpoints)
    * @return (labels(doc, lbl), rounds-until-converged)
    */
  /** Below this edge count the component labeling runs ON THE DRIVER
    * (collect + union-find with min-root, ~16 B/edge → ≤ 64 MB at the
    * cap) instead of iterating star-contraction rounds: the near-dup
    * graph is a sliver of the corpus, and at sf0.1 the whole LSSS loop's
    * cost is fixed per-round job overhead over a few hundred edges. A
    * 100 TB crawl graph (billions of edges) exceeds the cap and takes the
    * contraction path — the same fits-the-driver split as
    * Pipeline.LocalFinishVocabCap, and DedupSpec pins local == distributed
    * on a seeded random graph. The cap bounds ONE query; concurrent
    * sessions serialize the collect+union-find PEAK via
    * [[graft.ops.DriverBudget]] (each query's result labels remain
    * resident until consumed — see the budget's scaladoc).
    */
  private[analytics] val LocalCcEdgeCap = 4000000L

  /** Driver-local union-find (path compression, min-id roots — the label
    * law both paths share).
    */
  private def localComponents(edges: Array[(Long, Long)],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // halve the path
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.toSeq.map(n => (n, find(n))).toDF("doc", "lbl")
  }

  private[analytics] def connectedComponents(
      pairs: DataFrame, maxIter: Int = 50,
      localCap: Long = LocalCcEdgeCap): (DataFrame, Int) = {
    // the caller's pair plan (for d8 an LSH + 16-way blocked-join union)
    // executes EXACTLY ONCE — directly into the canonical edge checkpoint.
    // Severing before any reuse also caps the stats walk at a constant: a
    // merely-cached input would copy the whole pair subtree into every
    // downstream plan and the stats-product blowup applies to each copy
    // (d8: 83 s of driver time for 1146 pairs before severing).
    // Canonical directed edges are u > v; both passes preserve the
    // invariant because they re-attach endpoints to a strict minimum.
    var edgesS = checkpointSevered(
      pairs.select(greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    def edges = edgesS.df
    val initialCount = edges.count()
    if (initialCount <= localCap) {
      // fits-the-driver fast path: the checkpoint already materialized the
      // (deduped, canonicalized) edge set, so the collect moves exactly
      // initialCount pairs of longs once; union-find replaces the whole
      // round loop. Identical labels to the contraction path by the
      // min-root law (DedupSpec cross-checks both against each other).
      // The resident section holds the JVM-wide DriverBudget permit so
      // concurrent sessions serialize their peaks instead of stacking them.
      val labels = graft.ops.DriverBudget.withPermit {
        val arr = edges.select(col("u"), col("v")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        localComponents(arr, pairs.sparkSession)
      }
      edgesS.release()
      return (labels, 0)
    }
    // every doc that appears in any pair — the label domain. All callers
    // emit irreflexive pairs (a < b by construction), so the edge
    // endpoints ARE the node set; a hypothetical self-pair-only doc would
    // need the caller to pre-filter (documented contract). Stays persisted
    // until the caller consumes `labels` (per-query session hygiene frees
    // it afterwards).
    val Severed(nodes, _) = checkpointSevered(
      edges.select(col("u").as("doc"))
        .unionByName(edges.select(col("v").as("doc")))
        .distinct())
    // one star pass: re-attach the `pick` side of each neighborhood to its
    // minimum. Neighborhoods are read off the symmetric view; the minima
    // table is corpus-sized, so the attach join is shuffle-hinted (the
    // checkpoint hides these joins from the plan-shape guard — the hint
    // carries the scale contract here).
    def starPass(e: DataFrame, large: Boolean): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u").as("c"), least(col("u"), col("mv")).as("m"))
      val attach = sym.filter(if (large) col("v") > col("u") else col("v") <= col("u"))
        .join(mins.hint("shuffle_hash"), col("u") === col("c"))
        .select(col("v").as("u"), col("m").as("v"))
      val withSelf = // small-star also re-attaches each center u itself
        if (large) attach
        else attach.unionByName(mins.select(col("c").as("u"), col("m").as("v")))
      val out = withSelf.filter(col("u") =!= col("v"))
      // only the round's FINAL pass dedups (the fixpoint test needs set
      // semantics); the inter-pass multiset is harmless — neighborhood
      // minima ignore duplicates — and skipping its distinct saves a
      // full shuffle per round
      if (large) out else out.distinct()
    }
    var iter = 0
    var converged = false
    var edgeCount = initialCount
    while (!converged && iter < maxIter) {
      // checkpointSevered: materializes, severs lineage AND resets the
      // size stat, so the plan, per-round optimization time and the stats
      // digit count all stay O(1) across rounds (see the helper's doc for
      // the exponential-stats failure mode this guards).
      val nextS = checkpointSevered(starPass(starPass(edges, large = true),
        large = false))
      // fixpoint test is exact, not probabilistic: both passes are
      // idempotent on a star forest, so E' == E (count carried from last
      // round + anti-join on materialized tables) IS convergence; the
      // anti-join job only runs in rounds where the counts already match
      val nextCount = nextS.df.count()
      converged = nextCount == edgeCount &&
        nextS.df.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edgeCount = nextCount
      edgesS.release() // frees the superseded round's checkpoint blocks
      edgesS = nextS
      iter += 1
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] round $iter edges=$edgeCount " +
          f"at ${System.nanoTime() / 1e9}%.1f")
    }
    // silent non-convergence would split a component across cluster ids
    require(converged,
      s"dedup clustering did not converge within $maxIter iterations")
    // the star forest is the labeling: non-roots point at their component
    // min, roots (and nothing else) are absent from the u side
    val labels = nodes.as("n")
      .join(edges.as("s").hint("shuffle_hash"),
        col("n.doc") === col("s.u"), "left")
      .groupBy(col("n.doc").as("doc"))
      .agg(coalesce(min(col("s.v")), min(col("n.doc"))).as("lbl"))
    (labels, iter)
  }

  /** Production edit-distance dedup verification: threshold-bounded
    * CODEPOINT levenshtein over every LSH band candidate — no byte gate.
    * The candidate join bounds WHO gets compared (collisions only, never
    * all pairs) and the per-pair threshold bounds what each comparison
    * costs: Spark's `levenshtein(a, b, t)` runs the banded DP and stops at
    * t (O(t·min(len)) per pair, -1 beyond), so the background collisions
    * that dominate the candidate stream pay the bounded cost, not the full
    * O(len²) table. Texts re-attach by doc-keyed shuffled joins (the d5
    * discipline — corpus-sized sides never broadcast). Codepoint semantics
    * are deliberate: the op's targets (OCR noise, punctuation mangling,
    * mid-word edits) are exactly where non-ASCII text appears, so the
    * operator must NOT drop multibyte pairs — the oracle wrapper in
    * [[queries]] applies the single-byte replay gate to the output only.
    */
  def editDistanceDedup(docs: DataFrame): DataFrame = {
    val sh = shingles(docs).withColumn("hm", md5long(col("s")) % Prime)
    val mh = minhashStack(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshBandCandidates(mh)
    val texts = docs.select(col("doc_id"), col("text"))
    cand
      .join(texts.toDF("doc_a", "ta").hint("shuffle_hash"), "doc_a")
      .join(texts.toDF("doc_b", "tb").hint("shuffle_hash"), "doc_b")
      .withColumn("mx", greatest(length(col("ta")), length(col("tb"))))
      .withColumn("thr", floor(col("mx") * lit(EditDupMaxDist)).cast("int"))
      // the threshold form returns -1 beyond thr, so `ed >= 0` IS the
      // distance filter
      .withColumn("ed", expr("levenshtein(ta, tb, thr)"))
      .filter(col("ed") >= 0)
      .select(col("doc_a"), col("doc_b"),
        col("ed").cast("long").as("edit_dist"),
        round(lit(1.0) - col("ed") / col("mx"), 6).as("edit_sim"))
  }

  /** The sources d10/d14 treat as the arriving crawl batch. */
  private val BatchSources = Seq("src0", "src1", "src2", "src3", "src4")

  /** Rows-per-band of the PERSISTED d14 index family (build / append /
    * query / compact / forget / census, plus the streaming twins t20/t22).
    * r=2 is the scale-safe DEFAULT (VERDICT r12 #2): r=1's candidate
    * stream grows with the square of per-key collision mass — measured
    * 13.4×/decade at the sf10 gate — while r=2 drops sub-threshold
    * collisions to ≈4j² (two orders of magnitude at background j≈0.03) at
    * a measured 9,798/10k recall of threshold truth (BENCH_SF1's banding
    * knob). The inline d10 keeps r=1 (maximal recall for the one-shot
    * batch op where a pipeline owner picks r from the measured d11
    * S-curve); the STANDING index, whose query cost recurs per ingest
    * batch forever, defaults to the plan that survives the second decade.
    * [[d18Decide]] is the production instrument for moving it further.
    */
  private[graft] val D14BandR = 2

  /** The banded signature of a (doc_id, i, mh) minhash stack at band size
    * `r`, keyed for bucketing by ONE packed long. r=1: bk = i·P + mh
    * (mh < P makes it injective). r=2: band b holds the minima of
    * permutations 2b/2b+1 and bk = ((b·P + m₀)·P + m₁) — bounded by
    * 4P² ≈ 4.1e18 < 2⁶³, injective because both minima are < P. Packing
    * keeps the key a plain LONG (bucket pruning, codegen comparisons).
    *
    * r > 2 (d18's escalation targets — VERDICT r13 #2) can't fit one
    * long: the key SPLITS into the same injective bk prefix (band + first
    * two minima) plus `k2`, an array of the remaining minima packed
    * pairwise (each mᵢ·P + mᵢ₊₁ < P² < 2⁶³). (bk, k2) together stay
    * injective on the full minima tuple, bk alone still buckets (a join
    * keyed (bk, k2) rides a bk-bucketed layout exchange-free —
    * HashPartitioning(bk) satisfies the clustered distribution), and k2
    * equality makes the join EXACT tuple equality, so the r>2 oracle is
    * the same bandJoinCondSql tuple law as r≤2, never a hash
    * approximation. r ≤ 2 emits NO k2 column — the default index layout
    * is byte-identical to the receipted one.
    *
    * ANY r in 1..8 is legal (VERDICT r14 #4), not just the divisors of
    * the permutation count: when 8 % r != 0 the LAST band is ragged
    * (fewer than r minima) and its absent positions pack as a 0 pad —
    * sound because pad positions are a deterministic function of (band,
    * r), so a pad only ever compares against the pad at the same position
    * on the other side, never against a genuine minimum. The same pad
    * closes an odd r's half-empty final k2 pair. (The oracle twin is
    * null-safe minima equality in bandJoinCondSql.)
    */
  private[graft] def d14BandKeys(mh: DataFrame, idOut: String,
      r: Int = D14BandR): DataFrame = {
    require(r >= 1 && r <= MinhashParams.size,
      s"band size $r must be in 1..${MinhashParams.size}")
    if (r == 1)
      mh.select((col("i") * Prime + col("mh")).as("bk"),
        col("doc_id").as(idOut))
    else {
      val mins = (0 until r).map(k =>
        min(when(col("i") % r === k, col("mh"))).as(s"m$k"))
      // a ragged band's missing minima (and an odd r's missing final pair
      // partner) pad as 0 — see the pad-position argument above. When r
      // DIVIDES the permutation count no band rags and no position is
      // absent, so the pad collapses to the plain column — the pre-lift
      // divisor plan, byte-identical expressions (the isolated d20
      // median-of-3 receipt in BENCH_LOCAL.md shows the coalesce cost
      // was ~nil anyway; this keeps the plan provably unchanged)
      def mc(k: Int) =
        if (k >= r) lit(0L)
        else if (MinhashParams.size % r == 0) col(s"m$k")
        else coalesce(col(s"m$k"), lit(0L))
      val packed = mh.withColumn("b", (col("i") / r).cast("long"))
        .groupBy(col("doc_id"), col("b"))
        .agg(mins.head, mins.tail: _*)
        .withColumn("bk", (col("b") * Prime + col("m0")) * Prime + mc(1))
      val tail = (2 until r by 2).map(k => mc(k) * Prime + mc(k + 1))
      if (tail.isEmpty)
        packed.select(col("bk"), col("doc_id").as(idOut))
      else
        packed.select(col("bk"), array(tail: _*).as("k2"),
          col("doc_id").as(idOut))
    }
  }

  /** Candidate join of two [[d14BandKeys]] frames/tables at band size r:
    * ALWAYS an equi-join on the bucketed bk alone — the shape that rides
    * two bk-bucketed layouts with zero exchange (joining on (bk, k2)
    * directly would trip requireAllClusterKeysForCoPartition and
    * re-shuffle both sides) — with the k2 remainder applied as a
    * post-join equality FILTER when r > 2. Same tuple semantics, r≤2's
    * plan shape; the intermediate is the bk-prefix collision stream,
    * which the filter thins before the verify stage.
    */
  private def bandCandJoin(batch: DataFrame, ref: DataFrame,
      r: Int): DataFrame =
    if (r > 2)
      batch.withColumnRenamed("k2", "k2b").join(ref, Seq("bk"))
        .filter(col("k2b") === col("k2"))
    else batch.join(ref, Seq("bk"))

  /** SQL-expression form of [[d14BandKeys]] over an ALREADY-computed
    * signature array (the 8 permutation minima in i-order) — the
    * streaming ingest gate (t20) signs each arriving doc statelessly and
    * must produce byte-identical band keys to the stored table. Null
    * minima (an empty doc) propagate to null keys, which the caller
    * filters.
    */
  /** [[bandKeySqlExpr]]'s escalated-index form: the banded signature at
    * r > 2 as an array of (bk, k2) structs — byte-identical keys to
    * [[d14BandKeys]]' split scheme, for the streaming gate to probe an
    * index that [[d14Rebuild]] escalated. Null minima (an empty doc)
    * propagate into null bk, which the caller filters.
    */
  private[graft] def bandStructsSqlExpr(sigArray: String, r: Int): String = {
    require(r >= 3 && r <= MinhashParams.size,
      s"struct band keys are the r > 2 form, got $r")
    val nb = (MinhashParams.size + r - 1) / r // ragged last band when 8 % r != 0
    val nK2 = (r - 1) / 2
    // d14BandKeys' 0 pad for positions past the signature (ragged band)
    // or past r (an odd r's half-empty final pair) — try_element_at
    // covers the former, the CASE guard the latter
    def el(idx: String) = s"coalesce(try_element_at($sigArray, $idx), 0L)"
    s"transform(sequence(0, ${nb - 1}), b -> named_struct(" +
      s"'bk', (cast(b AS bigint) * ${Prime}L + " +
      s"element_at($sigArray, $r*b+1)) * ${Prime}L + ${el(s"$r*b+2")}, " +
      s"'k2', transform(sequence(1, $nK2), " +
      s"j -> ${el(s"$r*b+2*j+1")} * ${Prime}L + " +
      s"(CASE WHEN 2*j+1 < $r THEN ${el(s"$r*b+2*j+2")} ELSE 0L END))))"
  }

  private[graft] def bandKeySqlExpr(sigArray: String): String =
    if (D14BandR == 1)
      s"transform($sigArray, (m, i) -> cast(i AS bigint) * ${Prime}L + m)"
    else
      s"transform(sequence(0, ${MinhashParams.size / 2 - 1}), " +
        s"b -> (cast(b AS bigint) * ${Prime}L + " +
        s"element_at($sigArray, 2*b+1)) * ${Prime}L + " +
        s"element_at($sigArray, 2*b+2))"

  /** DuckDB twin of [[d14BandKeys]]' banding: the `bnd` CTE over the `mh`
    * signature CTE at rows-per-band r — bnd(doc_id, b, m0..m_{r-1}). Every
    * d14-family oracle re-derives from this ONE generator (and
    * [[bandJoinCondSql]]), so the Spark default and its oracles cannot
    * disagree on the banding. r=1 degenerates to (b = i, m0 = mh) — the
    * exact historical (i, mh) equality d10 still uses.
    */
  private def bandCteSql(r: Int): String = {
    val ms = (0 until r)
      .map(k => s"MIN(CASE WHEN i % $r = $k THEN mh END) AS m$k")
      .mkString(", ")
    s"bnd AS (SELECT doc_id, i // $r AS b, $ms FROM mh GROUP BY doc_id, i // $r)"
  }

  /** The band-equality join condition over two [[bandCteSql]] aliases.
    * Minima equality is NULL-SAFE: when 8 % r != 0 the ragged last band's
    * absent positions are NULL in the CTE (and a 0 pad on the Spark side),
    * and a pad position only ever faces the pad at the same position —
    * `IS NOT DISTINCT FROM` makes the oracle agree with the pad equality.
    */
  private def bandJoinCondSql(r: Int, x: String, y: String): String =
    (Seq(s"$x.b = $y.b") ++
      (0 until r).map(k => s"$x.m$k IS NOT DISTINCT FROM $y.m$k"))
      .mkString(" AND ")

  /** The packed band key of a [[bandCteSql]] row in SQL — [[d14BandKeys]]'
    * packing replayed for the d18 census oracle.
    */
  private def bandKeyPackSql(r: Int, x: String): String =
    if (r == 1) s"CAST($x.b AS BIGINT) * $Prime + $x.m0"
    else s"(CAST($x.b AS BIGINT) * $Prime + $x.m0) * $Prime + " +
      s"COALESCE($x.m1, 0)" // ragged-band pad, d14BandKeys' 0

  /** Catalog name of one of d14's bucketed index tables, scoped to the
    * dataset dir (ivfIndexPath's rule): building against one dir and
    * querying another in the same session must address DIFFERENT indexes —
    * a fixed name would silently serve the wrong corpus's bands to the
    * split d14Build/d14Query/d14Append API. The sanitized dir alone is NOT
    * injective (`/tmp/a-b` and `/tmp/a_b` both sanitize to `_tmp_a_b`), so
    * an md5 prefix of the RAW dir string disambiguates — without it two
    * distinct corpora could silently share one index.
    */
  private[graft] def d14Table(name: String, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    name + "_" + dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" + h
  }

  /** The persisted index's OWN band size — one-row metadata written by
    * [[d14Build]]/[[d14Rebuild]] so every family member (append, query,
    * census, the streaming gates) signs arriving docs with the STORED
    * table's exact key scheme. Absent (an index built before the meta
    * existed) reads as the default.
    */
  private[graft] def d14IndexR(s: org.apache.spark.sql.SparkSession,
      dir: String): Int = {
    val t = d14Table("d14_ref_meta", dir)
    if (s.catalog.tableExists(t)) s.table(t).head().getInt(0) else D14BandR
  }

  private def d14WriteMeta(s: org.apache.spark.sql.SparkSession,
      dir: String, r: Int): Unit = {
    import s.implicits._
    Seq(r).toDF("r").write.mode("overwrite")
      .saveAsTable(d14Table("d14_ref_meta", dir))
  }

  /** d14 index RE-BAND — the pass that makes [[d18Decide]]'s
    * `escalateBanding` verdict EXECUTABLE (VERDICT r13 #2): rewrite the
    * persisted band table at a new band size without touching the corpus.
    * The stored keys are injective packs of the original 8 permutation
    * minima, so the (doc, i, mh) minhash stack is RECOVERED from the index
    * itself — unpack bk (and k2 when present) back into minima, re-band
    * with [[d14BandKeys]] at the new r — and the rewrite costs O(index
    * bytes) + one band-sized shuffle. At 100 TB that is the difference
    * between turning the knob (a few % of corpus bytes, shingle/size
    * tables untouched) and re-signing the whole reference corpus.
    * Exactly-once via [[graft.ops.Bucketing.rewriteBucketed]]'s
    * write-then-swap, same as compaction and takedown.
    */
  private[graft] def d14Rebuild(s: org.apache.spark.sql.SparkSession,
      dir: String, rNew: Int): Unit = {
    val rOld = d14IndexR(s, dir)
    require(rNew >= 1 && rNew <= MinhashParams.size,
      s"band size $rNew must be in 1..${MinhashParams.size}")
    if (rOld != rNew) {
      val P = Prime
      graft.ops.Bucketing.rewriteBucketed(
        s, d14Table("d14_ref_bands", dir), "bk", 8) { bands =>
        val stack =
          if (rOld == 1)
            bands.select(col("ref_id").as("doc_id"),
              expr(s"CAST(bk DIV ${P}L AS INT)").as("i"),
              expr(s"bk % ${P}L").as("mh"))
          else {
            // bk = (b·P + m0)·P + m1; k2[j] = m_{2j+2}·P + m_{2j+3} —
            // unpacked per band POSITION `o` (0-based offset within the
            // band); positions past rOld (an odd rOld's final pair pad)
            // or past the 8 permutations (a ragged last band's pads) are
            // 0 pads, not minima, and are filtered out below
            val head = s"array(" +
              s"named_struct('o', 0, 'mh', (bk DIV ${P}L) % ${P}L), " +
              s"named_struct('o', 1, 'mh', bk % ${P}L))"
            val pairs =
              if (!bands.columns.contains("k2")) head
              else s"concat($head, flatten(transform(k2, (e, j) -> array(" +
                s"named_struct('o', 2*j + 2, 'mh', e DIV ${P}L), " +
                s"named_struct('o', 2*j + 3, 'mh', e % ${P}L)))))"
            bands.select(col("ref_id").as("doc_id"),
                expr(s"bk DIV ${P * P}L").as("b"),
                explode(expr(pairs)).as("p"))
              .filter(col("p.o") < rOld &&
                col("b") * rOld + col("p.o") < MinhashParams.size)
              .select(col("doc_id"),
                (col("b") * rOld + col("p.o")).cast("int").as("i"),
                col("p.mh").as("mh"))
          }
        d14BandKeys(stack, "ref_id", rNew)
      }
      d14WriteMeta(s, dir, rNew)
    }
  }

  /** d18's census body over the standing index (the build is d14's
    * one-time job — Bench prices only this recurring agg): collision-size
    * histogram of the persisted band table. The heavy groupBy(bk) rides
    * the bucket layout exchange-free; the second agg is histogram-sized.
    */
  private[graft] def d18Census(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val bands = s.table(d14Table("d14_ref_bands", dir))
    // group on the FULL band key — bk alone at r > 2 (where k2 exists)
    // would histogram the routing prefix, not true band collisions
    val keys = if (bands.columns.contains("k2")) Seq("bk", "k2") else Seq("bk")
    val per = bands
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("colliders"))
    per.groupBy("colliders").agg(count(lit(1)).as("n_keys"))
      .select(col("colliders"), col("n_keys"),
        (col("n_keys") * expr("colliders * (colliders - 1) DIV 2"))
          .cast("long").as("cand_pairs"))
  }

  /** The maintenance verdict [[d18Decide]] derives from the census — the
    * production REASON the census exists (VERDICT r12 #7): the two index
    * pathologies an owner must act on before they become query cost.
    *
    * @param escalateBanding the collision mass per indexed doc exceeds the
    *   verify-stage budget — the banding knob must rise (r → next divisor
    *   of 8; each step trades the d11-measured S-curve recall for a
    *   collision cut, the receipt in BENCH_SF1's banding section). This is
    *   the census-driven form of the sf10 superlinearity diagnosis: the
    *   decision reads ONE index agg, never a dedup run.
    * @param compact the bucket layout has fragmented under append waves
    *   (>1 data file per bucket on average) — run [[d14Compact]] (d16).
    */
  private[graft] case class D14Maintenance(
      escalateBanding: Boolean,
      compact: Boolean,
      candPairsPerDoc: Double,
      filesPerBucket: Double)

  /** Collision budget: candidate pairs the verify stage tolerates PER
    * INDEXED DOC per batch query before banding must escalate. The verify
    * join's cost is Θ(cand_pairs × shingles/doc); at ~8 pairs/doc the
    * verify stage costs about one extra signature pass — beyond it the
    * collision toll dominates the query (the measured sf10 13.4×/decade
    * failure mode of r=1).
    */
  private[graft] val D14CandPairsPerDocBudget = 8.0

  /** Bucket-fragmentation budget: average data files per bucket beyond
    * which the exchange-free band join pays more file-opens than sorts —
    * one append wave of slack, compact after that.
    */
  private[graft] val D14FilesPerBucketBudget = 2.0

  /** The decision rule OFF a census frame — pure function of (census,
    * index size, layout fragmentation) so the spec can feed synthetic
    * skewed/uniform fixtures and assert the flip (the d18 → d16/knob law).
    */
  private[graft] def d18Decide(census: DataFrame, nIndexedDocs: Long,
      filesPerBucket: Double): D14Maintenance = {
    val row = census.agg(sum(col("cand_pairs")).as("p")).head()
    val pairs = if (row.isNullAt(0)) 0L else row.getLong(0)
    val perDoc = if (nIndexedDocs <= 0) 0.0 else pairs.toDouble / nIndexedDocs
    D14Maintenance(
      escalateBanding = perDoc > D14CandPairsPerDocBudget,
      compact = filesPerBucket > D14FilesPerBucketBudget,
      candPairsPerDoc = perDoc,
      filesPerBucket = filesPerBucket)
  }

  /** The maintenance pass a production owner schedules between append
    * waves: census → [[d18Decide]] → compact when fragmented. Both inputs
    * are O(index) reads (the census agg rides the bucket layout
    * exchange-free; the file count is directory metadata); the pass never
    * touches the corpus. BOTH verdicts execute: fragmentation compacts
    * (d16), and `escalateBanding` re-packs the band table at the next
    * band size through [[d14Rebuild]] — an O(index) rewrite whose recall
    * price is d11's S-curve, which the census said is already cheaper
    * than the collision toll it removes.
    */
  private[graft] def d14Maintain(s: org.apache.spark.sql.SparkSession,
      dir: String): D14Maintenance = {
    val nDocs = s.table(d14Table("d14_ref_sizes", dir)).count()
    val files = graft.ops.Bucketing.tableDataFileCount(
      s, d14Table("d14_ref_bands", dir))
    val dec = d18Decide(d18Census(s, dir), nDocs, files / 8.0)
    if (dec.escalateBanding) {
      // the loop CLOSES here (VERDICT r13 #2): escalate to the next band
      // size unless already at the widest — an O(index) re-pack through
      // d14Rebuild, the corpus untouched. Recall moves down d11's
      // S-curve; the census said the collision toll already dominates.
      val r = d14IndexR(s, dir)
      if (r < MinhashParams.size) d14Rebuild(s, dir, r * 2)
    }
    if (dec.compact) d14Compact(s, dir)
    dec
  }

  /** d14 index BUILD: the reference corpus's dedup index persisted once —
    * the minhash band table written BUCKETED on the composite band key
    * (bk = i·Prime + mh; mh < Prime makes it injective, so a bk equi-join
    * IS the (i, mh) band join), plus the ref shingle set and per-doc sizes
    * the verify stage needs. s12's amortization applied to dedup: d10
    * re-signs the whole reference corpus on EVERY batch; after this build,
    * a batch pays only for itself.
    */
  private[graft] def d14Build(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val docs = Tables(s, dir).documents
    val ref = docs.filter(!col("source").isin(BatchSources: _*))
    val shR = shingles(ref).withColumn("hm", md5long(col("s")) % Prime)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhR = minhashStack(shR)
    // the three DATA-table writes are independent consumers of the ONE
    // persisted shingle frame (block-level locks serialize the first
    // materialization; every later read is a cache hit) — submit them
    // concurrently so 8-task bucket writes and driver-side commits
    // overlap instead of queueing (guide §2.6). The one-row meta commits
    // strictly AFTER they all succeed (ADVICE r19): meta names the band
    // scheme the band table is signed with, and a crash that left meta
    // ahead of the bands (e.g. rebuilding at r=2 over an index previously
    // escalated to r=4) would make d14Query silently sign batches with
    // the wrong key scheme — meta-last keeps meta a commit marker.
    graft.ops.Bucketing.concurrently(Seq(
      () => graft.ops.Bucketing.writeBucketed(
        d14BandKeys(mhR, "ref_id"), d14Table("d14_ref_bands", dir), "bk", 8),
      () => graft.ops.Bucketing.writeBucketed(
        shR.select(col("doc_id").as("ref_id"), col("s")),
        d14Table("d14_ref_shingles", dir), "ref_id", 8),
      () => graft.ops.Bucketing.writeBucketed(
        shR.groupBy(col("doc_id").as("ref_id")).agg(count(lit(1)).as("nb")),
        d14Table("d14_ref_sizes", dir), "ref_id", 8)))
    d14WriteMeta(s, dir, D14BandR)
    shR.unpersist()
  }

  /** d14 index APPEND — the incremental half that makes the persisted
    * index live: the ACCEPTED (novel) documents of a just-deduped batch
    * are signed and written into the same three bucket layouts with
    * append mode, so the NEXT batch dedups against this batch's survivors
    * too. Cost is O(accepted batch): one shingle pass over the accepted
    * docs only — the existing index bytes are never read or rewritten
    * (new files land inside the same buckets; reads group files by bucket
    * id, so the band join stays exchange-free). This is s12's
    * exactly-once-append discipline applied to dedup: at 100 TB it is the
    * difference between re-signing the whole reference corpus per crawl
    * batch (d10) and paying only for the ingest.
    */
  private[graft] def d14Append(s: org.apache.spark.sql.SparkSession,
      dir: String, acceptedIds: org.apache.spark.sql.DataFrame): Unit = {
    val docs = Tables(s, dir).documents
    // the accepted set is usually DERIVED from the index tables this
    // append writes into (d14Query's novel flag reads all three) — an
    // unsevered plan would make each append job read its own target.
    // localCheckpoint materializes the batch-sized id list eagerly and
    // truncates the lineage, exactly what a production pipeline holds at
    // this point anyway (the batch's admission verdict).
    val ids = acceptedIds.select(col("doc_id")).localCheckpoint(true)
    // accepted ids are batch-sized but corpus-unbounded — shuffled
    // semi-join, never a broadcast of an id set that grows with ingest
    val acc = docs.join(ids.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    val shA = shingles(acc).withColumn("hm", md5long(col("s")) % Prime)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhA = minhashStack(shA)
    // read the stored banding ONCE on the calling thread (it is a catalog +
    // head() lookup), then run the three independent appends concurrently —
    // same §2.6 overlap as d14Build; each append targets a different table
    val rStored = d14IndexR(s, dir)
    graft.ops.Bucketing.concurrently(Seq(
      () => graft.ops.Bucketing.appendBucketed(
        d14BandKeys(mhA, "ref_id", rStored),
        d14Table("d14_ref_bands", dir), "bk", 8),
      () => graft.ops.Bucketing.appendBucketed(
        shA.select(col("doc_id").as("ref_id"), col("s")),
        d14Table("d14_ref_shingles", dir), "ref_id", 8),
      () => graft.ops.Bucketing.appendBucketed(
        shA.groupBy(col("doc_id").as("ref_id")).agg(count(lit(1)).as("nb")),
        d14Table("d14_ref_sizes", dir), "ref_id", 8)))
    shA.unpersist()
  }

  /** d14 index COMPACTION — the lifecycle pass between [[d14Append]] waves:
    * each append lands batch-sized files inside the bucket layouts, so
    * after N waves every bucket holds N small files and the exchange-free
    * band join degrades into a small-files scan (N file-opens per bucket
    * per query). Compaction rewrites each index table back to one file per
    * bucket under the SAME (key, numBuckets) spec — O(index bytes) read +
    * write, no re-signing, no corpus scan — and must be invisible to the
    * recurring query: compact-then-query ≡ query (the d16 oracle reuses
    * the upsert cascade's SQL verbatim).
    */
  private[graft] def d14Compact(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    // the three table rewrites are independent (distinct tables, distinct
    // scratch names) and each runs its forceBucketedScan toggle in its own
    // child session (rewriteBucketed), so they overlap safely — r19 kept
    // them sequential only because the toggle was session-global
    // (guide §2.6; VERDICT r19 #5)
    graft.ops.Bucketing.concurrently(Seq(
      () => graft.ops.Bucketing.compactBucketed(
        s, d14Table("d14_ref_bands", dir), "bk", 8),
      () => graft.ops.Bucketing.compactBucketed(
        s, d14Table("d14_ref_shingles", dir), "ref_id", 8),
      () => graft.ops.Bucketing.compactBucketed(
        s, d14Table("d14_ref_sizes", dir), "ref_id", 8)))
  }

  /** d14 index FORGET — the takedown half of the lifecycle: remove every
    * indexed document of the named sources from all three bucket layouts,
    * so the recurring query can never again match against them. This is
    * the operation a training-data pipeline owes its sources (a licensing
    * withdrawal, a right-to-be-forgotten order, a poisoned-crawl
    * rollback): the forgotten docs must stop being dedup witnesses — a
    * batch doc whose ONLY near-match was forgotten must re-admit as novel.
    *
    * Cost is O(index bytes): one anti-join rewrite per table through the
    * same write-then-swap machinery as compaction (exactly-once, bucket
    * spec preserved — the recurring band join stays exchange-free). The
    * alternative — rebuild without the source — pays the full corpus
    * re-sign + shuffle; at 100 TB the rewrite reads and writes only the
    * index (a few % of corpus bytes), and doubles as a compaction.
    * The forgotten id set is takedown-sized but unbounded (a whole
    * source), so it joins shuffled, never broadcast.
    */
  private[graft] def d14Forget(s: org.apache.spark.sql.SparkSession,
      dir: String, sources: Seq[String]): Unit = {
    val gone = Tables(s, dir).documents
      .filter(col("source").isin(sources: _*))
      .select(col("doc_id").as("ref_id")).localCheckpoint(true)
    // three independent anti-join rewrites over ONE checkpointed takedown
    // set — overlapped like d14Compact's (rewriteBucketed's child-session
    // conf isolation makes the forceBucketedScan toggle thread-safe)
    graft.ops.Bucketing.concurrently(
      for ((t, k) <- Seq(("d14_ref_bands", "bk"),
          ("d14_ref_shingles", "ref_id"), ("d14_ref_sizes", "ref_id")))
        yield { () =>
          graft.ops.Bucketing.rewriteBucketed(s, d14Table(t, dir), k, 8)(
            _.join(gone.hint("shuffle_hash"), Seq("ref_id"), "left_anti"))
        })
  }

  /** d14 recurring QUERY: the arriving batch against the STORED index. The
    * batch's (batch-sized) band table drops into the SAME bucket layout, so
    * the candidate join plans with NO exchange on either side — the q22
    * trick; the verify stage touches only candidate-keyed slices of the
    * stored shingle table (shuffled joins — index sides are corpus-sized).
    * Result must equal d10's full recompute exactly.
    */
  private[graft] def d14Query(s: org.apache.spark.sql.SparkSession,
      dir: String,
      sources: Seq[String] = BatchSources): org.apache.spark.sql.DataFrame = {
    val docs = Tables(s, dir).documents
    val batchDocs = docs.filter(col("source").isin(sources: _*))
    val batch = batchDocs.select(col("doc_id"), col("source"))
    val shB = shingles(batchDocs)
      .withColumn("hm", md5long(col("s")) % Prime)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhB = minhashStack(shB)
    val r = d14IndexR(s, dir)
    graft.ops.Bucketing.writeBucketed(
      d14BandKeys(mhB, "doc_id", r),
      d14Table("d14_batch_bands", dir), "bk", 8)
    val cand = bandCandJoin(
      s.table(d14Table("d14_batch_bands", dir)).hint("merge"),
      s.table(d14Table("d14_ref_bands", dir)).hint("merge"), r)
      .select(col("doc_id"), col("ref_id")).distinct()
    val sizesB = shB.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val common = cand
      .join(shB.select(col("doc_id"), col("s")).hint("shuffle_hash"),
        "doc_id")
      .join(s.table(d14Table("d14_ref_shingles", dir)).hint("shuffle_hash"),
        Seq("ref_id", "s"))
      .groupBy("doc_id", "ref_id").agg(count(lit(1)).as("common"))
    val dups = common
      .join(sizesB.hint("shuffle_hash"), "doc_id")
      .join(s.table(d14Table("d14_ref_sizes", dir)).hint("shuffle_hash"),
        "ref_id")
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
    // best match per doc in ONE keyed agg (d14QueryFrame's rule, guide
    // §2.4 — one exchange instead of agg + re-join + agg): lexicographic
    // max over (jaccard, −ref_id) IS (max jaccard, then min ref_id)
    val best = dups.groupBy("doc_id")
      .agg(max(struct(col("jaccard"), (-col("ref_id")).as("nref"))).as("m"))
      .select(col("doc_id"), (-col("m.nref")).as("match_id"),
        round(col("m.jaccard"), 6).as("match_jaccard"))
    batch.join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("match_id").isNull.as("novel"),
        col("match_id"), col("match_jaccard"))
  }

  /** [[d14Query]]'s verify cascade over an IN-MEMORY batch frame — the
    * per-micro-batch admission shape t22's ingest loop runs. Identical
    * semantics to d14Query; the one plan difference is deliberate: a
    * micro-batch is not worth a bucketed-table write, so the batch side
    * shuffles INTO the stored bands' bucket partitioning (one batch-sized
    * exchange) while the index side still reads its buckets exchange-free.
    *
    * @param batchDocs (doc_id, source, text) rows — a micro-batch's
    *                  parsed payloads, never a corpus
    */
  private[graft] def d14QueryFrame(s: org.apache.spark.sql.SparkSession,
      dir: String, batchDocs: DataFrame): DataFrame = {
    val batch = batchDocs.select(col("doc_id"), col("source"))
    val shB = shingles(batchDocs)
      .withColumn("hm", md5long(col("s")) % Prime)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhB = minhashStack(shB)
    val r = d14IndexR(s, dir)
    val cand = bandCandJoin(d14BandKeys(mhB, "doc_id", r),
      s.table(d14Table("d14_ref_bands", dir)).hint("merge"), r)
      .select(col("doc_id"), col("ref_id")).distinct()
    val sizesB = shB.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val common = cand
      .join(shB.select(col("doc_id"), col("s")).hint("shuffle_hash"),
        "doc_id")
      .join(s.table(d14Table("d14_ref_shingles", dir)).hint("shuffle_hash"),
        Seq("ref_id", "s"))
      .groupBy("doc_id", "ref_id").agg(count(lit(1)).as("common"))
    val dups = common
      .join(sizesB.hint("shuffle_hash"), "doc_id")
      .join(s.table(d14Table("d14_ref_sizes", dir)).hint("shuffle_hash"),
        "ref_id")
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
    // best match per doc in ONE keyed agg (t20's rule): lexicographic max
    // over (jaccard, −ref_id) IS (max jaccard, then min ref_id)
    val best = dups.groupBy("doc_id")
      .agg(max(struct(col("jaccard"), (-col("ref_id")).as("nref"))).as("m"))
      .select(col("doc_id"), (-col("m.nref")).as("match_id"),
        round(col("m.jaccard"), 6).as("match_jaccard"))
    // materialize the batch-sized verdict HERE (it gets checkpointed by
    // every caller anyway — the t22 body needs the lineage severed before
    // the append mutates the tables it read) so shB can unpersist NOW:
    // leaving one cached shingle frame per micro-batch for the session's
    // life is an unbounded leak in the production ingest loop (ADVICE r12)
    val verdict = batch
      .join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("match_id").isNull.as("novel"),
        col("match_id"), col("match_jaccard"))
      .localCheckpoint(true)
    shB.unpersist()
    verdict
  }

  /** d10's shared front half: the batch spine, the persisted capped-free
    * shingle/signature tables, and the batch×reference candidate stage
    * with the LSH banding knob `r` (rows per band). r = 1 is the direct
    * (i, mh) equi-join — d10_cross_corpus's exact plan; r > 1 groups each
    * signature into 8/r sorted band keys, thinning the collision stream
    * at the S-curve-priced recall cost d11 measures (the production
    * instrument for the collision-amplifier superlinearity the sf10
    * analyses name). Returns (batch spine, persisted shingles, candidates).
    */
  private def d10Parts(s: org.apache.spark.sql.SparkSession, dir: String,
      r: Int): (DataFrame, DataFrame, DataFrame) = {
    require(r >= 1 && MinhashParams.size % r == 0, s"bad band size $r")
    val docs = Tables(s, dir).documents
    // one stats-pruned scan (source predicate pushed) yields both the
    // id set for the splits and the output spine — never a second
    // corpus scan semi-joined against its own filter
    val batch = docs.filter(col("source")
        .isin("src0", "src1", "src2", "src3", "src4"))
      .select(col("doc_id"), col("source"))
    val batchIds = batch.select(col("doc_id"))
    val sh = shingles(docs)
      .withColumn("hm", md5long(col("s")) % Prime)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mh = minhashStack(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // membership split: batch ids are corpus-fraction-sized — shuffled
    // semi/anti joins, never a broadcast of the id set
    val mhB = mh.join(batchIds.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    val mhR = mh.join(batchIds.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    // cross band join only: batch signatures vs reference signatures
    val cand =
      if (r == 1)
        mhB.as("x").hint("shuffle_hash")
          .join(mhR.as("y"),
            col("x.i") === col("y.i") && col("x.mh") === col("y.mh"))
          .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("ref_id"))
          .distinct()
      else {
        // bandCandidates' key scheme across the corpus split: r (i, mh)
        // rows per sorted band key, equality on (band, key)
        def banded(m: DataFrame): DataFrame = m
          .withColumn("b", (col("i") / r).cast("int"))
          .groupBy("doc_id", "b")
          .agg(sort_array(collect_list(struct(col("i"), col("mh")))).as("key"))
        banded(mhB).as("x").hint("shuffle_hash")
          .join(banded(mhR).as("y"),
            col("x.b") === col("y.b") && col("x.key") === col("y.key"))
          .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("ref_id"))
          .distinct()
      }
    (batch, sh, cand)
  }

  /** d10 with the banding knob surfaced — r = 1 IS d10_cross_corpus. */
  private[graft] def d10With(s: org.apache.spark.sql.SparkSession,
      dir: String, r: Int): DataFrame = {
    val (batch, sh, cand) = d10Parts(s, dir, r)
    // exact-Jaccard verification restricted to the candidates (d3's shape)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.select(col("doc_id"), col("s")).hint("shuffle_hash"), "doc_id")
      .join(sh.select(col("doc_id").as("ref_id"), col("s"))
        .hint("shuffle_hash"), Seq("ref_id", "s"))
      .groupBy("doc_id", "ref_id").agg(count(lit(1)).as("common"))
    val dups = common
      .join(sizes.toDF("doc_id", "na").hint("shuffle_hash"), "doc_id")
      .join(sizes.toDF("ref_id", "nb").hint("shuffle_hash"), "ref_id")
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= JaccardThreshold)
    // best match per batch doc in ONE keyed hash agg (no window; guide
    // §2.4 — one exchange instead of agg + re-join + agg): lexicographic
    // max over (jaccard, −ref_id) IS (max jaccard, then min ref_id)
    val best = dups.groupBy("doc_id")
      .agg(max(struct(col("jaccard"), (-col("ref_id")).as("nref"))).as("m"))
      .select(col("doc_id"), (-col("m.nref")).as("match_id"),
        round(col("m.jaccard"), 6).as("match_jaccard"))
    batch
      .join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("match_id").isNull.as("novel"),
        col("match_id"), col("match_jaccard"))
  }

  /** The candidate-stream size at band size r — the collision receipt for
    * BENCH_SF1's banding-knob subsection (measured, not asserted).
    */
  private[graft] def d10CandidateCount(s: org.apache.spark.sql.SparkSession,
      dir: String, r: Int): Long = d10Parts(s, dir, r)._3.count()

  /** d10's oracle at rows-per-band r — r=1 IS d10_cross_corpus's oracle
    * (bnd degenerates to the (i, mh) table), and r=[[D14BandR]] is
    * d14_dedup_index's: index ≡ recompute at the index's own banding.
    * ONE SQL body for both — the banding is the only moving part.
    */
  private def d10OracleSqlAt(r: Int): String =
    s"""WITH $jaccardOracleCte,
       |$minhashSigSql,
       |${bandCteSql(r)},
       |batch AS (SELECT doc_id, source FROM documents
       |          WHERE source IN ('src0','src1','src2','src3','src4')),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |         FROM bnd x
       |         JOIN batch bx ON x.doc_id = bx.doc_id
       |         JOIN bnd y ON ${bandJoinCondSql(r, "x", "y")}
       |         WHERE y.doc_id NOT IN (SELECT doc_id FROM batch)),
       |dups AS (SELECT c.doc_id, c.ref_id, j.jaccard
       |         FROM cand c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |best AS (SELECT doc_id, MIN(ref_id) AS match_id,
       |           ROUND(MAX(jaccard), 6) AS match_jaccard
       |         FROM (SELECT doc_id, ref_id, jaccard,
       |                 MAX(jaccard) OVER (PARTITION BY doc_id) AS bj
       |               FROM dups)
       |         WHERE jaccard = bj GROUP BY doc_id)
       |SELECT b.doc_id, b.source, best.match_id IS NULL AS novel,
       |  best.match_id, best.match_jaccard
       |FROM batch b LEFT JOIN best ON b.doc_id = best.doc_id""".stripMargin

  /** The reference sources d17's takedown removes from the index (~13% of
    * the indexed docs at any sf — a whole-licensor withdrawal, not a
    * single-doc edge case).
    */
  private[graft] val ForgottenSources = Seq("src5", "src6")

  /** d17's oracle: d10's dedup recomputed from scratch with the forgotten
    * sources EXCLUDED from the reference side — forget-then-query on the
    * Spark side must equal the rebuild-without recompute exactly.
    */
  private def d17ForgetOracleSql: String = {
    val gone = ForgottenSources.map(s => s"'$s'").mkString(",")
    s"""WITH $jaccardOracleCte,
       |$minhashSigSql,
       |${bandCteSql(D14BandR)},
       |batch AS (SELECT doc_id, source FROM documents
       |          WHERE source IN ('src0','src1','src2','src3','src4')),
       |refs AS (SELECT doc_id FROM documents
       |         WHERE source NOT IN ('src0','src1','src2','src3','src4')
       |           AND source NOT IN ($gone)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |         FROM bnd x
       |         JOIN batch bx ON x.doc_id = bx.doc_id
       |         JOIN bnd y ON ${bandJoinCondSql(D14BandR, "x", "y")}
       |         JOIN refs r ON y.doc_id = r.doc_id),
       |dups AS (SELECT c.doc_id, c.ref_id, j.jaccard
       |         FROM cand c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |best AS (SELECT doc_id, MIN(ref_id) AS match_id,
       |           ROUND(MAX(jaccard), 6) AS match_jaccard
       |         FROM (SELECT doc_id, ref_id, jaccard,
       |                 MAX(jaccard) OVER (PARTITION BY doc_id) AS bj
       |               FROM dups)
       |         WHERE jaccard = bj GROUP BY doc_id)
       |SELECT b.doc_id, b.source, best.match_id IS NULL AS novel,
       |  best.match_id, best.match_jaccard
       |FROM batch b LEFT JOIN best ON b.doc_id = best.doc_id""".stripMargin
  }

  /** d14_upsert's oracle: the two-wave cascade recomputed from scratch —
    * wave one (src0/src1) against the original reference, its novel
    * survivors joined INTO the reference, wave two (src2-4) against the
    * grown set. Append-then-query on the Spark side must equal this full
    * recompute exactly (s12's upsert ≡ rebuild law).
    */
  private def d14UpsertOracleSql: String = d14UpsertOracleSqlAt(D14BandR)

  /** The two-wave upsert cascade at band size r — r = D14BandR is
    * d14_upsert/d16's oracle; r = 4 is d20's (the incremental loop run
    * entirely on an ESCALATED index).
    */
  private def d14UpsertOracleSqlAt(r: Int): String =
    s"""WITH $jaccardOracleCte,
       |$minhashSigSql,
       |${bandCteSql(r)},
       |wave1 AS (SELECT doc_id FROM documents
       |          WHERE source IN ('src0','src1')),
       |wave2 AS (SELECT doc_id, source FROM documents
       |          WHERE source IN ('src2','src3','src4')),
       |refs AS (SELECT doc_id FROM documents
       |         WHERE source NOT IN ('src0','src1','src2','src3','src4')),
       |cand1 AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |          FROM bnd x
       |          JOIN wave1 bx ON x.doc_id = bx.doc_id
       |          JOIN bnd y ON ${bandJoinCondSql(r, "x", "y")}
       |          JOIN refs r ON y.doc_id = r.doc_id),
       |dup1 AS (SELECT DISTINCT c.doc_id
       |         FROM cand1 c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |grown AS (SELECT doc_id FROM refs
       |          UNION ALL
       |          SELECT doc_id FROM wave1
       |          WHERE doc_id NOT IN (SELECT doc_id FROM dup1)),
       |cand2 AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |          FROM bnd x
       |          JOIN wave2 bx ON x.doc_id = bx.doc_id
       |          JOIN bnd y ON ${bandJoinCondSql(r, "x", "y")}
       |          JOIN grown g ON y.doc_id = g.doc_id),
       |dups AS (SELECT c.doc_id, c.ref_id, j.jaccard
       |         FROM cand2 c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |best AS (SELECT doc_id, MIN(ref_id) AS match_id,
       |           ROUND(MAX(jaccard), 6) AS match_jaccard
       |         FROM (SELECT doc_id, ref_id, jaccard,
       |                 MAX(jaccard) OVER (PARTITION BY doc_id) AS bj
       |               FROM dups)
       |         WHERE jaccard = bj GROUP BY doc_id)
       |SELECT b.doc_id, b.source, best.match_id IS NULL AS novel,
       |  best.match_id, best.match_jaccard
       |FROM wave2 b LEFT JOIN best ON b.doc_id = best.doc_id""".stripMargin

  /** t22's oracle: [[d14UpsertOracleSql]]'s two-wave cascade extended to
    * emit BOTH waves' admission verdicts — the streaming ingest loop
    * accumulates wave 1's verdicts (vs the original reference) and wave
    * 2's (vs the reference grown by wave 1's survivors), so the oracle
    * recomputes exactly that union from scratch.
    */
  private[analytics] def d14TwoWaveOracleSql: String =
    s"""WITH $jaccardOracleCte,
       |$minhashSigSql,
       |${bandCteSql(D14BandR)},
       |wave1 AS (SELECT doc_id, source FROM documents
       |          WHERE source IN ('src0','src1')),
       |wave2 AS (SELECT doc_id, source FROM documents
       |          WHERE source IN ('src2','src3','src4')),
       |refs AS (SELECT doc_id FROM documents
       |         WHERE source NOT IN ('src0','src1','src2','src3','src4')),
       |cand1 AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |          FROM bnd x
       |          JOIN wave1 bx ON x.doc_id = bx.doc_id
       |          JOIN bnd y ON ${bandJoinCondSql(D14BandR, "x", "y")}
       |          JOIN refs r ON y.doc_id = r.doc_id),
       |dup1 AS (SELECT c.doc_id, c.ref_id, j.jaccard
       |         FROM cand1 c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |best1 AS (SELECT doc_id, MIN(ref_id) AS match_id,
       |            ROUND(MAX(jaccard), 6) AS match_jaccard
       |          FROM (SELECT doc_id, ref_id, jaccard,
       |                  MAX(jaccard) OVER (PARTITION BY doc_id) AS bj
       |                FROM dup1)
       |          WHERE jaccard = bj GROUP BY doc_id),
       |grown AS (SELECT doc_id FROM refs
       |          UNION ALL
       |          SELECT doc_id FROM wave1
       |          WHERE doc_id NOT IN (SELECT doc_id FROM dup1)),
       |cand2 AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ref_id
       |          FROM bnd x
       |          JOIN wave2 bx ON x.doc_id = bx.doc_id
       |          JOIN bnd y ON ${bandJoinCondSql(D14BandR, "x", "y")}
       |          JOIN grown g ON y.doc_id = g.doc_id),
       |dups AS (SELECT c.doc_id, c.ref_id, j.jaccard
       |         FROM cand2 c
       |         JOIN jac j ON j.doc_a = LEAST(c.doc_id, c.ref_id)
       |           AND j.doc_b = GREATEST(c.doc_id, c.ref_id)
       |         WHERE j.jaccard >= $JaccardThreshold),
       |best2 AS (SELECT doc_id, MIN(ref_id) AS match_id,
       |            ROUND(MAX(jaccard), 6) AS match_jaccard
       |          FROM (SELECT doc_id, ref_id, jaccard,
       |                  MAX(jaccard) OVER (PARTITION BY doc_id) AS bj
       |                FROM dups)
       |          WHERE jaccard = bj GROUP BY doc_id)
       |SELECT w.doc_id, w.source, best1.match_id IS NULL AS novel,
       |  best1.match_id, best1.match_jaccard
       |FROM wave1 w LEFT JOIN best1 ON w.doc_id = best1.doc_id
       |UNION ALL
       |SELECT w.doc_id, w.source, best2.match_id IS NULL AS novel,
       |  best2.match_id, best2.match_jaccard
       |FROM wave2 w LEFT JOIN best2 ON w.doc_id = best2.doc_id""".stripMargin

  /** Shared DuckDB CTEs for shingles and their hashes (word 3-grams). */
  private[analytics] val shinglesSql =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |sh AS (SELECT DISTINCT doc_id, tok[g.i]||' '||tok[g.i+1]||' '||tok[g.i+2] AS s
      |       FROM toks, (SELECT unnest(range(1, 1024)) AS i) g
      |       WHERE g.i + 2 <= len(tok))""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    // Exact dedup: hash-groupBy on the full text; keeper = min doc_id.
    "d1_exact_dedup" -> { (s, dir) =>
      Tables(s, dir).documents
        .groupBy(md5(col("text").cast("binary")).as("fingerprint"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
    },

    // N-gram Jaccard near-dup pairs (exact, shingle-join pruned).
    "d2_ngram_jaccard" -> { (s, dir) =>
      jaccardPairs(shingles(Tables(s, dir).documents))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    },

    // EXACT-SUBSTRING duplication via 8-token window fingerprints — the
    // Spark-practical form of the suffix-array dedup in Lee et al. 2021
    // ("Deduplicating Training Data Makes Language Models Better"): two
    // documents sharing ANY 8-token window share an exact substring of
    // ≥ 8 tokens, and the count of shared distinct windows lower-bounds
    // the duplicated span mass. This is a different LENS than d2/d13:
    // 3-gram Jaccard measures set overlap (background pairs share many
    // common 3-grams), while an 8-token run is so specific that on clean
    // data the window equi-join is near-collision-free — its output IS
    // the duplication evidence, no similarity threshold needed. df-cap 64
    // (tighter than ShingleDfCap: an 8-gram in >64 docs is boilerplate —
    // licence headers, navigation chrome — which substring dedup
    // deliberately ignores). 100 TB shape: d2's class — ONE df-capped
    // fingerprint equi-join, O(collisions) never O(n²); per-doc window
    // counts attach by doc-keyed shuffled joins; dup_frac = shared
    // windows / smaller doc's windows, the span-mass estimate the
    // drop-decision reads.
    "d15_substring_dup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      // doc-local distinct (shingles' law at window width 8): duplicate
      // (doc_id, s) rows only arise within one doc's own window list, so
      // array_distinct before the explode replaces the global exchange
      val g = docs
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .filter(size(col("tok")) >= 8)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, least(size(tok)-8, 1022)), " +
            "i -> concat_ws(' ', slice(tok, i+1, 8))))")).as("s"))
      // the window vocabulary and the window self-join are corpus×corpus
      // on WIDE keys (8-gram strings run ~3× a 3-gram's bytes): sort-merge
      // (spillable) instead of shuffle-hash — at sf10 the hash build of a
      // 32nd of the window table no longer fits an executor's share, the
      // exact failure a 1000-executor run would hit (measured: the
      // shuffle_hash variant dies with "not enough memory to build hash
      // map" at sf10; d2's narrower 3-gram joins clear the same bar)
      val keep = g.groupBy("s").agg(count(lit(1)).as("c"))
        .filter(col("c") <= SubstringDfCap).select("s")
      val kept = g.join(keep.hint("merge"), Seq("s"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = kept.as("a")
        .join(kept.as("b").hint("merge"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared_windows"))
      pairs
        .join(sizes.toDF("doc_a", "na").hint("shuffle_hash"), "doc_a")
        .join(sizes.toDF("doc_b", "nb").hint("shuffle_hash"), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_shared_windows"),
          round(col("n_shared_windows") * lit(1.0) /
            least(col("na"), col("nb")), 6).as("dup_frac"))
    },

    // Asymmetric set CONTAINMENT — the dedup lens symmetric Jaccard is
    // blind to: a short document whose shingles sit almost entirely inside
    // a much longer one (boilerplate wrapping, quote-heavy expansions, a
    // page embedded in a crawl of its parent) scores containment(inner in
    // outer) = common/|inner| ≈ 1 while Jaccard = common/|union| can be
    // arbitrarily small. One pass over d2's df-capped shingle join
    // computes BOTH directions (the pair table is collision-bounded;
    // everything after it is output-sized — the unpivot is an explode, not
    // a second execution of the join), emitting (inner, outer) rows at
    // containment ≥ 0.8 with the symmetric jaccard attached and a sym_dup
    // flag marking which pairs plain d2 would also have caught. 100 TB
    // shape: identical to d2 (the join IS d2's), plus an output-sized map.
    "d13_containment" -> { (s, dir) =>
      d13Project(jaccardPairs(shingles(Tables(s, dir).documents)))
    },

    // MinHash (8 perms) + LSH band join (band size 1) → candidates →
    // exact-Jaccard verification. est_sim = matching minhashes / 8.
    "d3_minhash_lsh" -> { (s, dir) =>
      val sh = shingles(Tables(s, dir).documents)
        .withColumn("hm", md5long(col("s")) % Prime)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the signature table is tiny (8 rows/doc) and feeds four join
      // branches — persist it so the aggregation runs once, not per branch
      val mh = minhashStack(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // LSH band join (shared scheme — [[lshBandCandidates]])
      val cand = lshBandCandidates(mh)
      // exact-Jaccard verification restricted to the CANDIDATES: attach each
      // side's shingle set by doc key and count matches per pair — at corpus
      // scale this touches |cand| × shingles-per-doc rows, never the full
      // shingle self-join's all-co-occurring-pairs blowup (that full form is
      // d2's job — it IS the exact all-pairs op)
      // shuffle-hinted: the candidate set is tiny locally but UNBOUNDED at
      // corpus scale — AQE would happily broadcast it here and hide the
      // shape that matters (the same trap d5's vector re-attach guards
      // against); hash-partitioned joins on the doc/pair keys scale linearly
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s"))
          .hint("shuffle_hash"), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s"))
          .hint("shuffle_hash"), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      val kept = common
        .join(sizes.toDF("doc_a", "na").hint("shuffle_hash"), "doc_a")
        .join(sizes.toDF("doc_b", "nb").hint("shuffle_hash"), "doc_b")
        .withColumn("jaccard",
          col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= JaccardThreshold)
      // est_sim only for the SURVIVORS: the threshold filter runs before
      // the signature re-attach, so the 8-row-per-doc double join prices
      // |kept| pairs (the duplicates), not every band collision — at
      // corpus scale collisions outnumber survivors by orders of magnitude
      kept
        .join(mh.as("x").hint("shuffle_hash"), col("doc_a") === col("x.doc_id"))
        .join(mh.as("y").hint("shuffle_hash"),
          col("doc_b") === col("y.doc_id") && col("x.i") === col("y.i"))
        .groupBy(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .agg((sum(when(col("x.mh") === col("y.mh"), 1).otherwise(0)) / 8.0)
          .as("est_sim"))
        .select(col("doc_a"), col("doc_b"), col("est_sim"), col("jaccard"))
    },

    // Character-level edit-distance verification of LSH candidates — the
    // dedup family's fifth similarity lens (d2 token Jaccard, d3 signature
    // estimate, d4 bitwise hamming, d5 embedding cosine): edit distance
    // catches near-dups that token-level measures blur (whitespace/
    // punctuation mangling, OCR noise, mid-word edits that shift every
    // downstream shingle). Two bounds make it affordable at corpus scale:
    // the LSH band join bounds WHO gets compared (collisions only, never
    // all pairs), and the per-row THRESHOLD bounds what each comparison
    // costs — Spark's levenshtein(a, b, t) runs the banded DP and stops at
    // t (O(t·min(len)) per pair, -1 beyond), so the background collisions
    // that dominate the candidate stream pay the bounded cost, not the
    // full O(len²) table. Texts re-attach by doc-keyed shuffled joins (the
    // d5 discipline — corpus-sized sides never broadcast).
    //
    // Cross-engine gate boundary: Spark's levenshtein counts CODEPOINTS,
    // DuckDB's counts BYTES — they agree only on single-byte text. The
    // PRODUCTION operator ([[editDistanceDedup]]) stays ungated (codepoint
    // semantics over every LSH candidate — OCR noise and punctuation
    // mangling are precisely where non-ASCII appears); this verify wrapper
    // gates the OUTPUT to pairs whose both texts are single-byte clean
    // (length == octet_length, mirrored in the SQL) because those are the
    // only pairs DuckDB can replay. A replay boundary in the oracle layer,
    // not an operator semantic.
    "d12_edit_dedup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val sb = docs.select(col("doc_id"),
        (length(col("text")) === octet_length(col("text"))).as("sb"))
      editDistanceDedup(docs)
        .join(sb.toDF("doc_a", "sb_a").hint("shuffle_hash"), "doc_a")
        .join(sb.toDF("doc_b", "sb_b").hint("shuffle_hash"), "doc_b")
        .filter(col("sb_a") && col("sb_b"))
        .select(col("doc_a"), col("doc_b"), col("edit_dist"), col("edit_sim"))
    },

    // Incremental cross-corpus fuzzy dedup: the "new crawl batch vs the
    // existing training corpus" admission gate a continuously-growing
    // pipeline runs before ingesting data (t14 is its streaming twin; this
    // is the batch form). Batch = src0-src4 (p18's target-domain split,
    // reused); every batch doc reports whether it is NOVEL w.r.t. the
    // reference corpus, plus its best reference match. Shapes at 100 TB:
    // ONE minhash signature pass over both corpora together (the d3 agg —
    // signatures are 8 rows/doc), membership split by a shuffled semi/anti
    // join against the batch-id set (corpus-sized, never broadcast), the
    // batch×ref band join is O(cross collisions) — strictly cheaper than
    // d3's full self-join because one side is the (much smaller) batch —
    // and exact-Jaccard verification touches candidates only. Best-match
    // selection is two keyed hash aggs (max jaccard, then min ref id at
    // that jaccard), never a window over the candidate stream.
    "d10_cross_corpus" -> { (s, dir) => d10With(s, dir, 1) },

    // Persisted incremental-dedup INDEX — s12's build/serve amortization +
    // q22's bucketing applied to d10: the reference corpus's signatures,
    // shingles and sizes are written ONCE ([[d14Build]]); every arriving
    // batch then dedups against the stored index ([[d14Query]]) paying
    // only for itself — d10 re-signs the whole reference corpus per batch.
    // The band join is exchange-free (both band tables bucketed on the
    // injective composite key), and the oracle is d10's SQL VERBATIM:
    // index ≡ recompute is the law, exactly s12's upsert ≡ rebuild.
    "d14_dedup_index" -> { (s, dir) =>
      d14Build(s, dir)
      d14Query(s, dir)
    },

    // Dedup-index collision census (s15's twin for d14's index — the
    // d-family lifecycle's observability op): the histogram of band-key
    // collision sizes read from the PERSISTED bands table alone.
    // SUM(cand_pairs) IS the collision toll every d10/d14 banding receipt
    // in BENCH_SF1 measures by RUNNING the dedup — this reads it from the
    // index in one agg, which is how a production owner decides when to
    // turn the banding knob (d10With(r)) or tighten the df-cap WITHOUT
    // paying a full dedup run. The heavy agg (groupBy bk) rides the
    // bucket layout exchange-free; the second agg is histogram-sized.
    // Oracle replays the band table from the corpus — census ≡ assignment
    // is the same layout-matches-recompute law as s15.
    "d18_band_stats" -> { (s, dir) =>
      d14Build(s, dir)
      d18Census(s, dir)
    },

    // d18's escalation verdict EXECUTED (VERDICT r13 #2): build the index
    // at the default banding, then RE-BAND it to r=4 — the knob turn
    // d18Decide recommends when the collision census says the verify toll
    // dominates. The rebuild unpacks the stored injective keys back into
    // the original minhash minima and re-packs at the new width — an
    // O(index) rewrite that never touches the corpus (the 100 TB
    // difference between a knob turn and a full re-sign). The oracle is
    // d10's SQL body AT r=4: rebuilt index ≡ from-scratch recompute at
    // the new banding — threshold truth at the escalated key scheme,
    // exact tuple equality (bk + k2 remainder), not a hash approximation.
    "d19_rebuild_r4" -> { (s, dir) =>
      d14Build(s, dir)
      d14Rebuild(s, dir, 4)
      d14Query(s, dir)
    },

    // The rebuild's r-restriction LIFTED (VERDICT r14 #4): re-band to
    // r=3 — a width that does NOT divide the 8 permutations, so the last
    // band is RAGGED (two minima, one 0 pad) and the final k2 pair is
    // half-empty — then query at the stored banding. The oracle is d10's
    // SQL body at r=3 with null-safe minima equality: the padded split
    // keys must produce exactly the from-scratch r=3 candidates, pads
    // matching pads and nothing else.
    "d21_rebuild_r3" -> { (s, dir) =>
      d14Build(s, dir)
      d14Rebuild(s, dir, 3)
      d14Query(s, dir)
    },

    // d14's INCREMENTAL loop closed: the crawl arrives in TWO waves. Wave
    // one (src0/src1) dedups against the stored reference index; its
    // ACCEPTED (novel) documents are APPENDED into the index
    // ([[d14Append]] — O(accepted) work, existing index bytes untouched);
    // wave two (src2-4) then dedups against the GROWN index and can match
    // wave one's survivors — the thing d14_dedup_index alone could not do.
    // The oracle recomputes the whole two-wave cascade from scratch in
    // SQL: append-then-query ≡ full recompute over the grown reference,
    // s12's upsert ≡ rebuild discipline applied to dedup.
    "d14_upsert" -> { (s, dir) =>
      d14Build(s, dir)
      val wave1 = d14Query(s, dir, Seq("src0", "src1"))
      d14Append(s, dir, wave1.filter(col("novel")))
      d14Query(s, dir, Seq("src2", "src3", "src4"))
    },

    // The INCREMENTAL loop on an ESCALATED index: build at the default
    // banding, re-band to r=4 (d19's knob turn), then run the full
    // two-wave upsert cascade against it — wave one dedups and appends
    // its survivors (d14Append signs at the stored r=4, split keys and
    // all), wave two dedups against the GROWN escalated index. The
    // oracle is the upsert cascade's SQL AT r=4: escalation must be
    // invisible to the lifecycle's semantics (same one-generator
    // discipline as d14_upsert/d16 — r the only moving part).
    "d20_upsert_r4" -> { (s, dir) =>
      d14Build(s, dir)
      d14Rebuild(s, dir, 4)
      val wave1 = d14Query(s, dir, Seq("src0", "src1"))
      d14Append(s, dir, wave1.filter(col("novel")))
      d14Query(s, dir, Seq("src2", "src3", "src4"))
    },

    // d14's index LIFECYCLE closed: build, dedup wave one, append its
    // survivors (the bucket layouts now hold one small file per bucket per
    // wave), COMPACT back to one file per bucket ([[d14Compact]] —
    // O(index) rewrite, exactly-once via write-then-swap), then run wave
    // two against the compacted index. The oracle is d14_upsert's SQL
    // VERBATIM: compaction must be invisible to the recurring query —
    // same rows, same plan shape (PlanShapeSpec pins the exchange-free
    // band join AND the one-file-per-bucket layout after the pass).
    "d16_index_compact" -> { (s, dir) =>
      d14Build(s, dir)
      val wave1 = d14Query(s, dir, Seq("src0", "src1"))
      d14Append(s, dir, wave1.filter(col("novel")))
      d14Compact(s, dir)
      d14Query(s, dir, Seq("src2", "src3", "src4"))
    },

    // d14's TAKEDOWN closed: build the index, FORGET two reference
    // sources ([[d14Forget]] — the licensing-withdrawal / right-to-be-
    // forgotten pass: O(index) anti-join rewrite, bucket spec preserved,
    // exactly-once via the compaction swap), then run the batch against
    // the reduced index. The oracle recomputes dedup from scratch with
    // the forgotten sources EXCLUDED from the reference set: forget ≡
    // rebuild-without is the law — a batch doc whose only near-match
    // was forgotten must re-admit as novel, and a forgotten doc can
    // never be a match_id.
    "d17_index_forget" -> { (s, dir) =>
      d14Build(s, dir)
      d14Forget(s, dir, ForgottenSources)
      d14Query(s, dir)
    },

    // LSH S-curve measurement — "measure, don't guess" applied to the
    // dedup family itself (the d-side twin of s6's ANN recall): for EVERY
    // co-occurring pair decile of true Jaccard, the fraction the band
    // join surfaces as candidates. High deciles read as RECALL (must be
    // ~1 above the dedup threshold), low deciles read as SELECTIVITY (the
    // band join's false-candidate rate on background pairs — the number
    // that prices the verify stage). This is the curve a pipeline reads
    // to size bands/permutations BEFORE committing to a corpus-scale run.
    // The ground-truth side is the deliberate exact all-pairs join
    // (uncapped — d3's own verification rule), priced accordingly;
    // production runs this on a SAMPLE, and the compare join is
    // pair-keyed and shuffled (truth sets are unbounded at 100 TB).
    "d11_lsh_recall" -> { (s, dir) =>
      val sh = shingles(Tables(s, dir).documents)
        .withColumn("hm", md5long(col("s")) % Prime)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // both sides of the band self-join consume the signatures — persist
      // so the aggregation over the shingle table runs once (d3's rule)
      val mh = minhashStack(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = mh.as("x").hint("shuffle_hash")
        .join(mh.as("y"),
          col("x.i") === col("y.i") && col("x.mh") === col("y.mh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = sh.as("a")
        .join(sh.as("b").hint("shuffle_hash"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      val truth = common
        .join(sizes.toDF("doc_a", "na").hint("shuffle_hash"), "doc_a")
        .join(sizes.toDF("doc_b", "nb").hint("shuffle_hash"), "doc_b")
        .withColumn("jaccard",
          col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      truth
        .join(cand.withColumn("hit", lit(1L)).hint("shuffle_hash"),
          Seq("doc_a", "doc_b"), "left")
        .groupBy(floor(round(col("jaccard"), 6) * 10).cast("long")
          .as("decile"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_candidates"))
        .withColumn("hit_rate",
          round(col("n_candidates") / col("n_pairs"), 6))
    },

    // Dedup clustering: connected components over the near-dup pair graph
    // (min-label propagation + pointer halving — O(log diameter) rounds).
    // Output: every doc in a component, its cluster id (min doc_id), and
    // whether it is the keeper.
    "d6_dedup_clusters" -> { (s, dir) =>
      // no caller-side cache: connectedComponents checkpoints the edge
      // table eagerly, so the pair plan runs exactly once
      val pairs = jaccardPairs(shingles(Tables(s, dir).documents))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("doc_a"), col("doc_b"))
      val (labels, _) = connectedComponents(pairs)
      labels.select(col("doc").as("doc_id"), col("lbl").as("cluster_id"),
        (col("doc") === col("lbl")).as("keeper"))
    },

    // Quality-aware keeper selection: d6's clusters, but the kept member is
    // the HIGHEST-QUALITY document (a2's score; doc_id tie-break), not the
    // lowest id — what production dedup actually ships (discarding a
    // high-quality original because a spammy copy has a smaller id loses
    // data for free). Quality is a map-only projection; the keeper window
    // partitions by cluster id — cluster-sized groups, never corpus-wide.
    "d9_keeper_quality" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val pairs = jaccardPairs(shingles(docs))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("doc_a"), col("doc_b"))
      val (labels, _) = connectedComponents(pairs)
      // clustered docs are a sliver of the corpus, but corpus-unbounded —
      // the quality attach stays a shuffle join (same discipline as d6)
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality_score").desc, col("doc_id"))
      labels.select(col("doc").as("doc_id"), col("lbl").as("cluster_id"))
        .join(TextAnalysis.qualityScore(docs).hint("shuffle_hash"), "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster_id"), col("quality_score"),
          col("keep"))
    },

    // SimHash: 16-bit fingerprint over token unigrams (pure map + one agg).
    "d4_simhash" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("h", conv(substring(md5(col("t").cast("binary")), 1, 4), 16, 10)
          .cast("long"))
      val bitSums = (0 until 16).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$j")
      }
      val assembled = (0 until 16).map { j =>
        when(col(s"b$j") > 0, 1L << j).otherwise(0L)
      }.reduce(_ + _)
      toks.groupBy("doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), assembled.as("simhash"))
    })

  private def simhashOracle: String = {
    val sums = (0 until 16)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n    ")
    val assemble = (0 until 16)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |hashed AS (
       |  SELECT doc_id, CAST(('0x'||substr(md5(t),1,4)) AS BIGINT) AS h FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM hashed GROUP BY doc_id)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits""".stripMargin
  }

  /** The minhash signature CTE block (consts → hashed → mh) — the SQL twin
    * of [[minhashStack]], shared by the d3/d10/d12 oracles. Expects an `sh`
    * CTE (doc_id, s) in scope.
    */
  private def minhashSigSql: String = {
    val constRows = MinhashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""consts(i, a, b) AS (VALUES $constRows),
       |hashed AS (SELECT doc_id, s,
       |    CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % $Prime AS hm FROM sh),
       |mh AS (SELECT doc_id, i, MIN((a * hm + b) % $Prime) AS mh
       |       FROM hashed CROSS JOIN consts GROUP BY doc_id, i)""".stripMargin
  }

  /** The band-1 self-join candidate CTE — the SQL twin of
    * [[lshBandCandidates]], shared by the d3/d12 oracles.
    */
  private val lshCandSql: String =
    """cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |         FROM mh x JOIN mh y ON x.i = y.i AND x.mh = y.mh
      |           AND x.doc_id < y.doc_id)""".stripMargin

  /** Uncapped form — d3 only (its candidates-only verify join is keyed by
    * (doc, s), so the hot-shingle hazard the cap exists for never applies).
    */
  private def jaccardOracleCte: String =
    s"""$shinglesSql,
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT doc_a, doc_b,
       |          common * 1.0 / (sa.n + sb.n - common) AS jaccard
       |        FROM pairs
       |        JOIN sizes sa ON doc_a = sa.doc_id
       |        JOIN sizes sb ON doc_b = sb.doc_id)""".stripMargin

  /** df-capped form mirroring [[jaccardPairs]] — d2/d6. */
  private[analytics] def jaccardOracleCteCapped: String =
    s"""$shinglesSql,
       |keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $ShingleDfCap),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT doc_a, doc_b,
       |          common * 1.0 / (sa.n + sb.n - common) AS jaccard
       |        FROM pairs
       |        JOIN sizes sa ON doc_a = sa.doc_id
       |        JOIN sizes sb ON doc_b = sb.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH $jaccardOracleCteCapped
         |SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
         |FROM jac WHERE jaccard >= $JaccardThreshold""".stripMargin,
    // the 8-token window replay: same position cap (range(1,1024) ≡
    // sequence(0, least(size-8, 1022))), same df-cap, same pair join
    "d15_substring_dup" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tok
        |             FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |        tok[w.i]||' '||tok[w.i+1]||' '||tok[w.i+2]||' '||tok[w.i+3]
        |          ||' '||tok[w.i+4]||' '||tok[w.i+5]||' '||tok[w.i+6]
        |          ||' '||tok[w.i+7] AS s
        |      FROM tk, (SELECT unnest(range(1, 1024)) AS i) w
        |      WHERE w.i + 7 <= len(tok)),
        |keep AS (SELECT s FROM g GROUP BY s HAVING COUNT(*) <= $SubstringDfCap),
        |kept AS (SELECT g.doc_id, g.s FROM g JOIN keep USING (s)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_shared_windows
        |      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared_windows,
        |  ROUND(n_shared_windows * 1.0 / LEAST(sa.n, sb.n), 6) AS dup_frac
        |FROM p
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id""".stripMargin,
    "d13_containment" ->
      s"""WITH $jaccardOracleCteCapped,
         |bothdir AS (SELECT doc_a, doc_b,
         |              common * 1.0 / sa.n AS ca, common * 1.0 / sb.n AS cb,
         |              common * 1.0 / (sa.n + sb.n - common) AS j
         |            FROM pairs
         |            JOIN sizes sa ON doc_a = sa.doc_id
         |            JOIN sizes sb ON doc_b = sb.doc_id),
         |uni AS (SELECT doc_a AS doc_inner, doc_b AS doc_outer,
         |          ca AS containment, j FROM bothdir
         |        UNION ALL
         |        SELECT doc_b, doc_a, cb, j FROM bothdir)
         |SELECT doc_inner, doc_outer, ROUND(containment, 6) AS containment,
         |  ROUND(j, 6) AS jaccard, j >= $JaccardThreshold AS sym_dup
         |FROM uni WHERE containment >= $ContainmentThreshold""".stripMargin,
    "d3_minhash_lsh" -> {
      s"""WITH $jaccardOracleCte,
         |$minhashSigSql,
         |$lshCandSql,
         |est AS (SELECT c.doc_a, c.doc_b,
         |          SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / 8.0 AS est_sim
         |        FROM cand c
         |        JOIN mh x ON c.doc_a = x.doc_id
         |        JOIN mh y ON c.doc_b = y.doc_id AND x.i = y.i
         |        GROUP BY 1, 2)
         |SELECT j.doc_a, j.doc_b, e.est_sim, ROUND(j.jaccard, 6) AS jaccard
         |FROM jac j
         |JOIN est e ON j.doc_a = e.doc_a AND j.doc_b = e.doc_b
         |JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |WHERE j.jaccard >= $JaccardThreshold""".stripMargin
    },
    // d3's band-join candidates verified by character edit distance; the
    // threshold filter mirrors Spark's levenshtein(a, b, thr) cutoff
    // (integer distance ≤ floor(0.2·max-length)). Single-byte gate: DuckDB
    // levenshtein counts BYTES, Spark's counts CODEPOINTS — the
    // length = strlen predicate (mirrored in the Spark query's
    // length = octet_length) pins the domain where they agree.
    "d12_edit_dedup" -> {
      s"""WITH $shinglesSql,
         |$minhashSigSql,
         |$lshCandSql,
         |lev AS (SELECT c.doc_a, c.doc_b,
         |          levenshtein(da.text, db.text) AS ed,
         |          GREATEST(length(da.text), length(db.text)) AS mx
         |        FROM cand c
         |        JOIN documents da ON c.doc_a = da.doc_id
         |        JOIN documents db ON c.doc_b = db.doc_id
         |        WHERE length(da.text) = strlen(da.text)
         |          AND length(db.text) = strlen(db.text))
         |SELECT doc_a, doc_b, CAST(ed AS BIGINT) AS edit_dist,
         |  ROUND(1.0 - ed / mx, 6) AS edit_sim
         |FROM lev WHERE ed <= FLOOR($EditDupMaxDist * mx)""".stripMargin
    },

    // d3's machinery split across the batch/reference boundary: candidates
    // from the cross band join only, exact Jaccard via the uncapped jac CTE
    // (order-normalized through LEAST/GREATEST — jac stores doc_a < doc_b),
    // best match = (max jaccard, min ref id) per batch doc
    "d10_cross_corpus" -> d10OracleSqlAt(1),
    // the persisted-index path must reproduce the SAME-BANDING recompute
    // EXACTLY — index ≡ recompute at r=D14BandR, the s12
    // upsert-≡-rebuild discipline (one SQL body with d10's, r the only
    // moving part)
    "d14_dedup_index" -> d10OracleSqlAt(D14BandR),
    // escalated index ≡ recompute at the escalated banding — same one
    // SQL body, r=4 the only moving part
    "d19_rebuild_r4" -> d10OracleSqlAt(4),
    // any-r rebuild: ragged last band + padded final pair ≡ recompute
    "d21_rebuild_r3" -> d10OracleSqlAt(3),
    // the census read off the persisted bands must equal the band table
    // replayed from the corpus (the s15 layout-matches-recompute law)
    "d18_band_stats" ->
      s"""WITH $shinglesSql,
         |$minhashSigSql,
         |${bandCteSql(D14BandR)},
         |refs AS (SELECT doc_id FROM documents
         |         WHERE source NOT IN ('src0','src1','src2','src3','src4')),
         |bands AS (SELECT ${bandKeyPackSql(D14BandR, "x")} AS bk,
         |                 x.doc_id
         |          FROM bnd x JOIN refs r ON x.doc_id = r.doc_id),
         |per AS (SELECT bk, COUNT(*) AS colliders FROM bands GROUP BY bk)
         |SELECT colliders, COUNT(*) AS n_keys,
         |  CAST(COUNT(*) * (colliders * (colliders - 1) // 2) AS BIGINT)
         |    AS cand_pairs
         |FROM per GROUP BY colliders""".stripMargin,
    // append-then-query ≡ full recompute over the grown reference
    "d14_upsert" -> d14UpsertOracleSql,
    // the same cascade on the ESCALATED index: rebuild(4) + upsert ≡
    // full recompute at r=4
    "d20_upsert_r4" -> d14UpsertOracleSqlAt(4),
    // compaction is invisible to the recurring query: same cascade SQL
    "d16_index_compact" -> d14UpsertOracleSql,
    "d17_index_forget" -> d17ForgetOracleSql,
    // all co-occurring pair deciles (uncapped jac) left-joined to d3's
    // band-join candidate set; hit rate per true-similarity decile
    "d11_lsh_recall" -> {
      s"""WITH $jaccardOracleCte,
         |$minhashSigSql,
         |$lshCandSql
         |SELECT CAST(FLOOR(ROUND(t.jaccard, 6) * 10) AS BIGINT) AS decile,
         |  COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_candidates,
         |  ROUND(CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1.0 / COUNT(*), 6) AS hit_rate
         |FROM jac t
         |LEFT JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
         |GROUP BY 1""".stripMargin
    },
    "d4_simhash" -> simhashOracle,
    // Transitive closure via recursive CTE; cluster = min reachable doc_id.
    "d6_dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardOracleCteCapped,
         |near AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM near
         |          UNION ALL SELECT doc_b, doc_a FROM near),
         |reach(doc, lbl) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.doc = e.a)
         |SELECT doc AS doc_id, MIN(lbl) AS cluster_id,
         |  doc = MIN(lbl) AS keeper
         |FROM reach GROUP BY doc""".stripMargin,

    // d6's transitive closure + a2's quality formula; keeper = row 1 of the
    // (quality DESC, doc_id) window within each cluster
    "d9_keeper_quality" ->
      s"""WITH RECURSIVE $jaccardOracleCteCapped,
         |near AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM near
         |          UNION ALL SELECT doc_b, doc_a FROM near),
         |reach(doc, lbl) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.doc = e.a),
         |clusters AS (SELECT doc AS doc_id, MIN(lbl) AS cluster_id
         |             FROM reach GROUP BY doc),
         |${TextAnalysis.qualityCte},
         |ranked AS (SELECT c.doc_id, c.cluster_id, q.quality_score,
         |             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |               ORDER BY q.quality_score DESC, c.doc_id) AS r
         |           FROM clusters c JOIN qual q USING (doc_id))
         |SELECT doc_id, cluster_id, quality_score, r = 1 AS keep
         |FROM ranked""".stripMargin)
}
