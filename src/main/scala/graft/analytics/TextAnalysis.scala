package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID
  * (stopword-hit heuristic), quality scoring, token statistics, document
  * fingerprinting. All arithmetic is rational/IEEE-deterministic (no exp/log)
  * so the DuckDB oracle matches exactly.
  *
  * Scale notes: a1/a2/a3 are map + single hash-agg per doc (explode is
  * map-side, combiner applies); a4 is a pure per-row projection — nothing
  * here shuffles more than once, and nothing joins.
  */
object TextAnalysis {

  /** Tiny marker lists per language (heuristic language ID). */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "or", "and", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"),
    "zh" -> Seq("de", "le", "he"))

  private val Stopwords = Seq("the", "a", "or", "and", "of", "to", "in")

  /** Run-length statistics of a string-array column computed DOC-LOCALLY
    * in one sorted pass (SQL-expression text): distinct element count
    * (`nd`), the max element multiplicity (`top`), and the total
    * multiplicity mass of elements occurring more than once (`dup` —
    * Σ c over c > 1). These are exactly the per-doc numbers the old
    * explode → (doc, element) hash agg → per-doc agg cascades computed;
    * the sorted-array fold gets them with ZERO exchanges (guide §2.3:
    * aggregate before you shuffle — here, aggregate so there is nothing
    * to shuffle at all). Shared by a6 and p8.
    */
  private[analytics] def runStatsSql(arr: String): String =
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING),
       |    'run', CAST(0 AS BIGINT), 'nd', CAST(0 AS BIGINT),
       |    'top', CAST(0 AS BIGINT), 'dup', CAST(0 AS BIGINT)),
       |  (a, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(a.prev <=> x, a.run + 1L, 1L),
       |    'nd', a.nd + IF(a.prev <=> x, 0L, 1L),
       |    'top', GREATEST(a.top, IF(a.prev <=> x, a.run + 1L, 1L)),
       |    'dup', a.dup + CASE WHEN a.prev <=> x AND a.run = 1L THEN 2L
       |                        WHEN a.prev <=> x THEN 1L
       |                        ELSE 0L END),
       |  a -> named_struct('nd', a.nd, 'top', a.top, 'dup', a.dup))"""
      .stripMargin

  /** Per-doc quality score (a2's exact formula), reused by the
    * quality-aware dedup keeper (d9): map-only, no shuffle.
    */
  private[analytics] def qualityScore(docs: DataFrame): DataFrame =
    qualityTokens(docs).select(col("doc_id"), col("quality_score"))

  /** a2's quality score + token count with caller-carried columns — the
    * budget-selection form (p19): same map-only single pass as
    * [[qualityScore]], but keeps `n_tokens` (the budget unit) and any
    * extra grouping columns the caller selects on.
    */
  private[analytics] def qualityTokens(docs: DataFrame, carry: String*): DataFrame =
    docs.select(col("doc_id") +: carry.map(col) :+
        split(col("text"), " ").as("tok"): _*)
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(tok, t -> t IN ${sqlList(Stopwords)}))")
          .cast("long"))
      .withColumn("quality_score",
        round((col("n_tokens") / (col("n_tokens") + lit(50.0))) * 0.5 +
          (col("n_stop") * lit(1.0) / col("n_tokens")) * 0.5, 6))
      .drop("tok", "n_stop")

  /** a2's quality formula as oracle CTEs ending at `qual`
    * (doc_id, quality_score).
    */
  private[analytics] def qualityCte: String =
    s"""qtoks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |qagg AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(CASE WHEN t IN ${sqlList(Stopwords)} THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_stop
       |  FROM qtoks GROUP BY doc_id),
       |qual AS (
       |  SELECT doc_id,
       |    ROUND((n_tokens / (n_tokens + 50.0)) * 0.5 +
       |          (n_stop * 1.0 / n_tokens) * 0.5, 6) AS quality_score
       |  FROM qagg)""".stripMargin

  /** a7's PII pattern battery (the Dolma/CCNet scrub set reduced to the
    * patterns whose semantics are identical in Java regex and the
    * oracle's RE2): email addresses, IPv4 literals, and bare digit runs
    * (numeric identifiers — the pattern that actually fires in an event
    * log's payload). Shared verbatim by the t25 ingest gate.
    */
  private[analytics] val PiiEmail =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  private[analytics] val PiiIpv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[analytics] val PiiDigits = "[0-9]+"

  /** a7's scrub as a reusable map-only projection over an event frame
    * (event_id, user_id, props): consistent pseudonymization of the user
    * key (salted-hash prefix — joins still line up, the raw id leaves the
    * dataset) + the pattern battery counted per row + character-level
    * masking of digits in the free-text payload. Single codegen'd pass,
    * no shuffle, no UDF — every regexp is a native Catalyst expression.
    */
  private[analytics] def piiScrub(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      substring(md5(concat(lit("graft"), col("user_id").cast("string"))),
        1, 16).as("pseudo_user"),
      regexp_count(col("props"), lit(PiiDigits)).cast("long")
        .as("n_digit_runs"),
      regexp_count(col("props"), lit(PiiEmail)).cast("long").as("n_emails"),
      regexp_count(col("props"), lit(PiiIpv4)).cast("long").as("n_ipv4"),
      regexp_replace(col("props"), "[0-9]", "#").as("props_masked"))
      .withColumn("has_pii",
        col("n_digit_runs") + col("n_emails") + col("n_ipv4") > 0)

  /** a7's oracle SQL (DuckDB RE2 side of the same battery). */
  private[analytics] val PiiOracleSql: String =
    s"""SELECT event_id,
       |  substr(md5('graft'||CAST(user_id AS VARCHAR)), 1, 16) AS pseudo_user,
       |  CAST(len(regexp_extract_all(props, '$PiiDigits')) AS BIGINT) AS n_digit_runs,
       |  CAST(len(regexp_extract_all(props, '$PiiEmail')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(props, '$PiiIpv4')) AS BIGINT) AS n_ipv4,
       |  regexp_replace(props, '[0-9]', '#', 'g') AS props_masked,
       |  (len(regexp_extract_all(props, '$PiiDigits')) +
       |   len(regexp_extract_all(props, '$PiiEmail')) +
       |   len(regexp_extract_all(props, '$PiiIpv4'))) > 0 AS has_pii
       |FROM events""".stripMargin

  /** a8's generalization lattice over final (event_type, hour-bucket, n)
    * counts: release at hour where the crowd reaches k, re-generalize the
    * sub-k sliver to day, suppress LOUDLY below k at day. Group-sized
    * math; shared verbatim by the t26 ingest audit. Buckets export as
    * epoch seconds (q8's precedent: the oracle reads the nanos parquet
    * natively, so a raw timestamp column would dtype-mismatch at the
    * gate).
    */
  private[analytics] def kAnonLattice(byHour: DataFrame): DataFrame = {
    val k = 50L
    val released0 = byHour.filter(col("n") >= k)
      .select(col("event_type"),
        unix_timestamp(col("bucket")).as("bucket_epoch"),
        lit(0).as("level"), col("n"), lit(false).as("suppressed"))
    val byDay = byHour.filter(col("n") < k)
      .groupBy(col("event_type"),
        date_trunc("day", col("bucket")).as("bucket"))
      .agg(sum(col("n")).as("n"))
    val released1 = byDay
      .select(col("event_type"),
        unix_timestamp(col("bucket")).as("bucket_epoch"),
        lit(1).as("level"), col("n"), (col("n") < k).as("suppressed"))
    released0.unionAll(released1)
  }

  /** a9's noise finish over final (event_type, n_true) counts: Laplace
    * (sensitivity=1, ε=1) via the inverse CDF, hash-seeded uniform
    * (md5 → 52 mantissa bits + half-ulp offset → u strictly inside
    * (-0.5, 0.5), so ln's argument stays positive on both engines).
    * Group-count-sized scalar math; shared verbatim by the t28 ingest
    * release.
    */
  private[analytics] def dpRelease(counts: DataFrame): DataFrame = {
    val eps = 1.0
    val u = ((conv(substring(md5(concat(lit("dp"),
      col("event_type"))), 1, 13), 16, 10).cast("long") + lit(0.5)) /
      lit(4503599627370496.0) - lit(0.5)).as("u")
    counts
      .select(col("event_type"), lit(eps).as("epsilon"),
        col("n_true"), u)
      .select(col("event_type"), col("epsilon"),
        round(col("n_true") +
          -(lit(1.0) / col("epsilon")) * signum(col("u")) *
            log(lit(1.0) - lit(2.0) * abs(col("u"))), 6).as("n_noisy"))
  }

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  val queries: Map[String, Relational.Q] = Map(
    // Language ID: count marker hits per language, argmax with fixed
    // precedence (en > de > es > fr > zh on ties).
    "a1_langid" -> { (s, dir) =>
      val hitCols = Markers.map { case (lang, words) =>
        expr(s"size(filter(tok, t -> t IN ${sqlList(words)}))")
          .cast("long").as(s"hits_$lang")
      }
      val langs = Markers.map(_._1)
      // argmax with precedence = first lang whose hits >= all later ones
      val predicted = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
        case ((lang, i), rest) =>
          val geAllLater = langs.drop(i + 1)
            .map(l2 => col(s"hits_$lang") >= col(s"hits_$l2"))
            .reduce(_ && _)
          when(geAllLater, lang).otherwise(rest)
      }
      Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .select(col("doc_id") +: hitCols: _*)
        .select(col("doc_id"), predicted.as("predicted_lang"),
          col("hits_en"), col("hits_de"))
    },

    // Quality score: rational composite of token count and stopword ratio.
    "a2_quality" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .withColumn("n_tokens", size(col("tok")).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(tok, t -> t IN ${sqlList(Stopwords)}))")
            .cast("long"))
        .withColumn("stop_ratio", col("n_stop") * lit(1.0) / col("n_tokens"))
        .withColumn("quality_score",
          round((col("n_tokens") / (col("n_tokens") + lit(50.0))) * 0.5 +
            col("stop_ratio") * 0.5, 6))
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          round(col("stop_ratio"), 6).as("stop_ratio"), col("quality_score"))
    },

    // Token statistics: whitespace tokens + distinct + length stats.
    "a3_token_stats" -> { (s, dir) =>
      // BPE-ish pre-tokenizer pieces: the GPT-2-family regex family reduced
      // to letter runs / digit runs / punctuation runs with an optional
      // leading space — the count a byte-pair tokenizer's pre-split yields
      // (identical semantics in Java regex and the oracle's RE2)
      val bpe = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
      Tables(s, dir).documents
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("tok"))
        .select(col("doc_id"),
          size(col("tok")).cast("long").as("n_tokens"),
          size(array_distinct(col("tok"))).cast("long").as("n_distinct"),
          expr("array_max(transform(tok, t -> length(t)))")
            .cast("long").as("max_token_len"),
          expr("aggregate(tok, CAST(0 AS BIGINT), (acc, t) -> acc + length(t))")
            .as("sum_token_len"),
          size(regexp_extract_all(col("text"), lit(bpe), lit(0)))
            .cast("long").as("n_bpe_pieces"))
        .withColumn("avg_token_len",
          round(col("sum_token_len") * lit(1.0) / col("n_tokens"), 6))
    },

    // Document fingerprint: 60-bit md5 of whitespace-normalized lowercase
    // text (rolling-hash-class dedup key).
    "a4_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          conv(substring(md5(
            regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")),
            1, 15), 16, 10).cast("long").as("fingerprint"),
          col("n_chars"))
    },

    // Word-entropy quality signal: H = ln(n) − (Σ c·ln c)/n over the
    // in-doc word histogram — the information-theoretic gibberish /
    // boilerplate detector the ratio heuristics (a2) miss: keyword-stuffed
    // or template text collapses toward 0 bits regardless of its stopword
    // ratio; random token soup pushes toward ln(n_distinct). The a-family
    // is otherwise log-free by design (see the object doc); a5 needs ln
    // and follows p10's cross-engine discipline — each per-term c·ln(c)
    // is rounded to 6 dp BEFORE the decimal-exact sum, so DuckDB replays
    // it despite libm ulp differences. Shape at 100 TB: one explode, one
    // (doc, word)-keyed hash agg, one per-doc agg — all map-side
    // combined, zero joins, zero windows.
    "a5_entropy" -> { (s, dir) =>
      // MAP-ONLY form (r19, guide §2.3/§2.4): per-word counts are
      // doc-local, so one sorted pass over the token array replaces the
      // explode → (doc, word) hash agg → per-doc agg cascade — zero
      // exchanges, one scan. The Σ round(c·ln c, 6) term accumulates in
      // DECIMAL exactly like the old sum(...cast(decimal(30,15))) — every
      // term has 6 dp, so the explicit DECIMAL(38,15) re-casts that keep
      // the lambda's accumulator type stable are value-exact — and the
      // per-run flush math is the same double c·ln(c) the keyed agg fed.
      val clncFlush = "CAST(round(CAST(a.run AS DOUBLE) * ln(a.run), 6) " +
        "AS DECIMAL(30,15))"
      Tables(s, dir).documents
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
        .filter(size(col("w")) > 0)
        .withColumn("st", expr(
          s"""aggregate(array_sort(w),
             |  named_struct('prev', CAST(NULL AS STRING),
             |    'run', CAST(0 AS BIGINT), 'nd', CAST(0 AS BIGINT),
             |    'clnc', CAST(0 AS DECIMAL(38,15))),
             |  (a, x) -> named_struct(
             |    'prev', x,
             |    'run', IF(a.prev <=> x, a.run + 1L, 1L),
             |    'nd', a.nd + IF(a.prev <=> x, 0L, 1L),
             |    'clnc', CAST(IF(a.prev <=> x OR a.run = 0L, a.clnc,
             |      a.clnc + $clncFlush) AS DECIMAL(38,15))),
             |  a -> named_struct('nd', a.nd,
             |    'clnc', CAST(IF(a.run = 0L, a.clnc, a.clnc + $clncFlush)
             |      AS DECIMAL(38,15))))""".stripMargin))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          col("st.nd").as("n_distinct"),
          round(log(size(col("w")).cast("double")) -
            col("st.clnc").cast("double") / size(col("w")), 6).as("entropy"))
    },

    // Repetition signals (the Gopher repetition filters, Rae et al. 2021
    // §A1.1, adapted to single-line documents): type-token ratio, the top
    // word's frequency share, and the top bigram's share — the signal
    // that catches looping/boilerplate generators that length and
    // stopword checks (a2) miss. Everything is doc-local: two
    // explode→keyed-hash-agg passes (words, bigrams; map-side partials,
    // no corpus-wide state) folded to one row per doc and joined
    // doc-keyed. The "top" share needs only the MAX count — tie-free, no
    // argmax struct, no window. Bigram positions cap at 4095 (the
    // shingles idiom, mirrored in the oracle's range) so a pathological
    // document bounds its own row count. Docs with <2 tokens carry no
    // bigram and drop from the report on both engines (inner join).
    "a6_repetition" -> { (s, dir) =>
      // MAP-ONLY form (r19, guide §2.3/§2.4): every statistic here is
      // doc-local — distinct words, the top word/bigram counts — so one
      // sorted run-length pass per array replaces the two explode →
      // keyed-hash-agg cascades and their doc-keyed join: zero exchanges,
      // one scan. Same filters (non-empty words; >= 2 tokens for the
      // bigram side — the old inner join dropped word-only docs), same
      // 4095-position bigram cap, same division/round arithmetic.
      Tables(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
        .withColumn("w", expr("filter(tok, x -> length(x) > 0)"))
        .filter(size(col("w")) > 0 && size(col("tok")) >= 2)
        .withColumn("bg", expr(
          "transform(sequence(0, least(size(tok)-2, 4094)), " +
            "i -> concat_ws(' ', slice(tok, i+1, 2)))"))
        .withColumn("ws", expr(runStatsSql("w")))
        .withColumn("bs", expr(runStatsSql("bg")))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          round(col("ws.nd") * lit(1.0) / size(col("w")), 6).as("ttr"),
          round(col("ws.top") * lit(1.0) / size(col("w")), 6)
            .as("top_word_frac"),
          round(col("bs.top") * lit(1.0) / size(col("bg")), 6)
            .as("top_bigram_frac"),
          (col("bs.top") * lit(1.0) / size(col("bg")) > 0.04).as("repetitive"))
    },

    // k-anonymity audit — the verification half of the privacy pair (a7
    // de-identifies; a8 PROVES the released log hides every individual in
    // a crowd of >= k on its quasi-identifiers). QI = (event_type, time
    // bucket); the generalization lattice is the real mechanism reduced
    // to two rungs: groups of >= k release at hour granularity (level 0);
    // smaller groups RE-generalize to day (level 1) and release there if
    // the coarser crowd reaches k, else they are suppressed and reported
    // as such (never silently dropped — the auditor's contract). Shape:
    // one hash-agg per rung over the sliver the finer rung rejected, a
    // union of two group-sized frames — no window, no join back to rows;
    // scales as the number of GROUPS, not events.
    "a8_k_anonymity" -> { (s, dir) =>
      kAnonLattice(Tables(s, dir).events
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n")))
    },

    // Differential-privacy release — the third rung of the privacy
    // ladder (a7 de-identifies rows, a8 proves crowd sizes, a9 releases
    // only NOISED aggregates so even the crowd counts stop leaking
    // membership): per-type event counts + Laplace(sensitivity=1, ε=1)
    // noise via the inverse CDF. The uniform draw is hash-SEEDED
    // (md5 of the group key → 52 mantissa bits → exact power-of-two
    // division) so the oracle can replay the release bit-for-bit; a
    // production release swaps the seed string for a secret drawn per
    // publication — the mechanism, sensitivity accounting, and plan
    // shape are the operator. One hash-agg + per-group scalar math:
    // scales as GROUPS, the noise costs nothing at any corpus size.
    "a9_dp_release" -> { (s, dir) =>
      dpRelease(Tables(s, dir).events
        .groupBy("event_type").agg(count(lit(1)).as("n_true")))
    },

    // Event-log pseudonymization (p4's complement: p4 redacts PII from a
    // free-text corpus, a7 de-identifies a STRUCTURED log while keeping
    // it joinable): salted-hash pseudonyms for user_id — referential
    // integrity survives, the raw id leaves the dataset — plus the
    // email/IPv4/digit-run battery counted per row and digits masked
    // character-level in the payload. Map-only single codegen'd projection — the 100 TB
    // shape is "free": no shuffle, no join, no state; the scan is the
    // cost. t25 runs this same expression at ingest.
    "a7_pseudonymize" -> { (s, dir) =>
      piiScrub(Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("props")))
    })

  val oracles: Map[String, String] = Map(
    "a1_langid" -> {
      val hitSums = Markers.map { case (lang, words) =>
        s"CAST(SUM(CASE WHEN t IN ${sqlList(words)} THEN 1 ELSE 0 END) AS BIGINT) AS hits_$lang"
      }.mkString(",\n    ")
      val langs = Markers.map(_._1)
      val argmax = langs.init.zipWithIndex.map { case (lang, i) =>
        val cond = langs.drop(i + 1)
          .map(l2 => s"hits_$lang >= hits_$l2").mkString(" AND ")
        s"WHEN $cond THEN '$lang'"
      }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |hits AS (
         |  SELECT doc_id,
         |    $hitSums
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, $argmax AS predicted_lang, hits_en, hits_de
         |FROM hits""".stripMargin
    },
    "a2_quality" ->
      s"""WITH toks AS (
         |  SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS t FROM documents),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN t IN ${sqlList(Stopwords)} THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    MAX(n_chars) AS n_chars
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_stop,
         |  ROUND(n_stop * 1.0 / n_tokens, 6) AS stop_ratio,
         |  ROUND((n_tokens / (n_tokens + 50.0)) * 0.5 +
         |        (n_stop * 1.0 / n_tokens) * 0.5, 6) AS quality_score
         |FROM agg""".stripMargin,
    "a3_token_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |    COUNT(DISTINCT t) AS n_distinct,
        |    MAX(length(t)) AS max_token_len,
        |    CAST(SUM(length(t)) AS BIGINT) AS sum_token_len,
        |    ROUND(SUM(length(t)) * 1.0 / COUNT(*), 6) AS avg_token_len
        |  FROM toks GROUP BY doc_id)
        |SELECT a.doc_id, a.n_tokens, a.n_distinct, a.max_token_len,
        |  a.sum_token_len,
        |  CAST(len(regexp_extract_all(d.text,
        |    ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_bpe_pieces,
        |  a.avg_token_len
        |FROM agg a JOIN documents d USING (doc_id)""".stripMargin,
    "a4_fingerprint" ->
      """SELECT doc_id,
        |  CAST(('0x'||substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fingerprint,
        |  n_chars
        |FROM documents""".stripMargin,
    // per-term c·ln(c) rounded then decimal-summed (the p10 ln discipline)
    "a5_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks
        |       WHERE length(w) > 0 GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |          CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |          SUM(CAST(ROUND(c * ln(c), 6) AS DECIMAL(30,15))) AS clnc
        |        FROM wc GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        |  ROUND(ln(n_tokens) - CAST(clnc AS DOUBLE) / n_tokens, 6) AS entropy
        |FROM agg""".stripMargin,

    // word + bigram top-share replay; bigram positions capped at 4095 to
    // mirror the Spark side's transform(sequence(...)) bound
    "a6_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks
        |       WHERE length(w) > 0 GROUP BY 1, 2),
        |wd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |         CAST(MAX(c) AS BIGINT) AS topw
        |       FROM wc GROUP BY doc_id),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |bg AS (SELECT doc_id, tok[g.i]||' '||tok[g.i+1] AS g
        |       FROM tk, (SELECT unnest(range(1, 4096)) AS i) g
        |       WHERE g.i + 1 <= len(tok)),
        |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |         CAST(MAX(c) AS BIGINT) AS topb
        |       FROM bc GROUP BY doc_id)
        |SELECT w.doc_id, w.n_tokens,
        |  ROUND(w.n_distinct * 1.0 / w.n_tokens, 6) AS ttr,
        |  ROUND(w.topw * 1.0 / w.n_tokens, 6) AS top_word_frac,
        |  ROUND(b.topb * 1.0 / b.n_bigrams, 6) AS top_bigram_frac,
        |  (b.topb * 1.0 / b.n_bigrams) > 0.04 AS repetitive
        |FROM wd w JOIN bd b USING (doc_id)""".stripMargin,

    "a7_pseudonymize" -> PiiOracleSql,

    // the seeded Laplace inverse-CDF replayed: same md5 bits, same exact
    // power-of-two division, same single-expression double chain
    "a9_dp_release" ->
      """WITH c AS (
        |  SELECT event_type, COUNT(*) AS n_true FROM events GROUP BY 1),
        |u AS (
        |  SELECT event_type, n_true,
        |    (CAST(('0x'||substr(md5('dp'||event_type), 1, 13)) AS BIGINT)
        |      + 0.5) / 4503599627370496.0 - 0.5 AS u
        |  FROM c)
        |SELECT event_type, CAST(1.0 AS DOUBLE) AS epsilon,
        |  ROUND(n_true + -(1.0 / 1.0) * sign(u) * ln(1 - 2 * abs(u)), 6)
        |    AS n_noisy
        |FROM u""".stripMargin,

    // the two-rung lattice replayed as CTEs; day groups re-aggregate ONLY
    // the hour groups below k, mirroring the Spark sliver re-group
    "a8_k_anonymity" ->
      """WITH by_hour AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |by_day AS (
        |  SELECT event_type, date_trunc('day', bucket) AS bucket,
        |    CAST(SUM(n) AS BIGINT) AS n
        |  FROM by_hour WHERE n < 50 GROUP BY 1, 2)
        |SELECT event_type, CAST(epoch(bucket) AS BIGINT) AS bucket_epoch,
        |  0 AS level, n, false AS suppressed
        |FROM by_hour WHERE n >= 50
        |UNION ALL
        |SELECT event_type, CAST(epoch(bucket) AS BIGINT) AS bucket_epoch,
        |  1 AS level, n, (n < 50) AS suppressed
        |FROM by_day""".stripMargin)
}
