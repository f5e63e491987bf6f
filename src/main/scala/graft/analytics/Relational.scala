package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish tables — the Catalyst-builtin layer
  * of SURVEY.md §2.8 (the reference has no relational engine; parity-plus comes
  * from Spark). Every query here has a DuckDB oracle in [[Relational.oracles]].
  *
  * Determinism rules (so the driver's hash-compare passes):
  *   - money sums go through DECIMAL(18,2)/(22,6) so partial-agg order can't
  *     perturb low bits; final output is cast back to DOUBLE (same type in
  *     DuckDB).
  *   - integer sums cast to BIGINT in the oracle (DuckDB SUM(BIGINT)→HUGEINT).
  *   - every ORDER BY carries a unique tie-break key.
  *   - timestamps leave the query as epoch-second BIGINTs (parquet ns vs µs).
  *
  * Scale notes (100 TB): all aggregations are partial+final hash aggregates
  * (map-side combine free); joins on orders/customer broadcast the small side
  * explicitly; no collect/driver-side loops anywhere.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  // sum over DECIMAL, surfaced as DOUBLE — deterministic across partition orders
  private def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  type Q = (SparkSession, String) => DataFrame

  /** q22's one-time table layout: both join sides persisted bucketed+sorted
    * on the key. Split from [[q22Join]] so Bench can price layout and join
    * separately — at scale the layout amortizes across every subsequent
    * join, so folding it into the join's number misrepresents the operator.
    */
  def q22Layout(s: SparkSession, dir: String): Unit = {
    val t = Tables(s, dir)
    // two independent table writes — overlap them (guide §2.6), same as
    // d14Build's index tables
    graft.ops.Bucketing.concurrently(Seq(
      () => graft.ops.Bucketing.writeBucketed(
        t.lineitem.select("l_orderkey", "l_quantity"),
        "q22_li_b", "l_orderkey", 8),
      () => graft.ops.Bucketing.writeBucketed(
        t.orders.select(col("o_orderkey").as("l_orderkey"),
          col("o_totalprice")),
        "q22_ord_b", "l_orderkey", 8)))
  }

  /** The exchange-free join over [[q22Layout]]'s tables. */
  def q22Join(s: SparkSession): DataFrame =
    graft.ops.Bucketing.bucketedJoin(s, "q22_li_b", "q22_ord_b", "l_orderkey")
      .groupBy(pmod(col("l_orderkey"), lit(10L)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))

  /** EXACT per-group quantiles with O(1) aggregation state per task — the
    * scale-safe replacement for Spark's `percentile`, whose buffer holds a
    * value→count map PER GROUP (with few groups, each buffer approaches the
    * group's distinct-value count on one task: the plan that cannot survive
    * 100×). Two corpus-touching stages instead:
    *
    *  1. range-partition the rows by (g, value, tb) — within a group, slice
    *     order IS value order, and the `tb` tiebreak spreads heavy
    *     duplicate-value runs across slices so one hot value can't skew a
    *     partition (equal values are interchangeable for a quantile, so the
    *     tiebreak never changes the answer);
    *  2. per-(slice, group) counts (nParts×|G| rows — tiny) prefix-summed
    *     into slice offsets, so global ordinal = offset + local rank, where
    *     the local `row_number` window partitions by (slice, group) — every
    *     window partition is ONE range slice of ONE group, bounded by
    *     corpus/nParts, never the whole group.
    *
    * Only the ordinals flanking each requested quantile position survive
    * (≤ 2·|ps| rows per group), and linear interpolation
    * `v_lo + frac·(v_hi − v_lo)` — the same 0-indexed `h=(n−1)·p` rule as
    * DuckDB's `quantile_cont` — happens on that result-sized frame. Group
    * counts come from the slice counts (no second corpus scan); the ranged
    * frame is persisted so the offsets and the ranked rows read the SAME
    * physical slice ids (two executions of a range exchange may sample
    * different bounds — consistency by materialization, not by luck).
    *
    * Input: columns `g` (group), `value` (double, nulls dropped — both
    * engines' quantiles ignore them), `tb` (any orderable tiebreak, e.g. a
    * row-id hash). Output: long format (g, pname, q, n_g) — one row per
    * group×quantile, unrounded.
    */
  private[graft] def exactGroupQuantiles(in: DataFrame,
      ps: Seq[(String, Double)]): DataFrame = {
    val s = in.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = in.filter(col("value").isNotNull)
      .repartitionByRange(nParts, col("g"), col("value"), col("tb"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // slice census: nParts×|G| rows — everything below is report-sized
    val slices = ranged.groupBy("pid", "g").agg(count(lit(1)).as("c"))
      .persist()
    val offs = slices.withColumn("off",
        coalesce(sum(col("c")).over(Window.partitionBy("g").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("g"), col("off"))
    val needed = slices.groupBy("g").agg(sum(col("c")).as("n_g"))
      .select(col("g"), col("n_g"), explode(array(ps.map { case (nm, p) =>
        struct(lit(nm).as("pname"), lit(p).as("p")) }: _*)).as("pp"))
      .select(col("g"), col("n_g"), col("pp.pname").as("pname"),
        col("pp.p").as("p"))
      .withColumn("h", (col("n_g") - 1).cast("double") * col("p"))
      .withColumn("lo", floor(col("h")).cast("long") + 1L)
      .withColumn("hi", least(floor(col("h")).cast("long") + 2L, col("n_g")))
      .withColumn("frac", col("h") - floor(col("h")))
    val ords = needed
      .select(col("g"), explode(array(col("lo"), col("hi"))).as("ord"))
      .distinct()
    // global ordinal = slice offset + bounded local rank; only the flanking
    // ordinals survive the broadcast semi-ish join
    val picked = ranged
      .withColumn("rn", row_number()
        .over(Window.partitionBy("pid", "g").orderBy("value")))
      .join(broadcast(offs), Seq("pid", "g"))
      .withColumn("ord", col("off") + col("rn"))
      .join(broadcast(ords), Seq("g", "ord"))
      .select(col("g"), col("ord"), col("value"))
      // report-sized rows, corpus-sized computation: materialize once so
      // the two flanking joins below don't each re-run the ranked pass
      .persist()
    needed
      .join(broadcast(picked.toDF("g", "lo", "v_lo")), Seq("g", "lo"))
      .join(broadcast(picked.toDF("g", "hi", "v_hi")), Seq("g", "hi"))
      .select(col("g"), col("pname"),
        (col("v_lo") + col("frac") * (col("v_hi") - col("v_lo"))).as("q"),
        col("n_g"))
  }

  val queries: Map[String, Q] = Map(
    // TPC-H Q1: full-scan partial+final hash agg; only 4 columns read.
    "q1_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(22,6)")).cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q6: tight filter → scalar agg; filters push to the parquet scan.
    "q2_filter_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(22,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q3 shape: two joins; customer & orders are the small sides at any
    // SF relative to lineitem — broadcast customer, shuffle-join orders.
    "q3_join_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      // NO broadcast hint: customer is a TPC-H table that scales WITH the
      // corpus (sf×150k rows), not a fixed dimension — a pinned broadcast
      // ships an ever-growing build side to the driver and every task and
      // eventually OOMs, where the unhinted planner broadcasts below its
      // threshold and flips to a shuffled join beyond it (measured: both
      // joins broadcast at sf0.1, customer flips to SortMergeJoin at the
      // sf10 probe; local sf10 cost is ~equal either way because the
      // 60M-row lineitem join dominates — the hint's harm is cluster-side)
      val ord = t.orders
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
      t.lineitem
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_epoch"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q4 shape: EXISTS → left-semi join, agg on orders.
    "q4_semijoin" -> { (s, dir) =>
      val t = Tables(s, dir)
      val late = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      t.orders
        .join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // NOT EXISTS → left-anti join.
    "q5_antijoin" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderstatus") === "F")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
    },

    // Window functions: rank suppliers' lineitems by extendedprice.
    "q6_window" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      t.lineitem
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
    },

    // Rollup (grouping sets) over part brand/type.
    "q7_rollup" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.part
        .rollup(col("p_brand"), col("p_type"))
        .agg(count(lit(1)).as("n_parts"),
          dsum(col("p_retailprice")).as("sum_price"),
          max(col("p_size")).as("max_size"))
    },

    // Events: hourly tumbling aggregation (batch shape of the streaming
    // windowed agg; epoch-second output dodges ns/µs parquet mismatch).
    "q8_events_hourly" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
    },

    // Top-k distinct users per event type (countDistinct + order/limit).
    "q9_distinct" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    },

    // Set ops: union / intersect / except over customer keys of two segments.
    "q10_setops" -> { (s, dir) =>
      val t = Tables(s, dir)
      val a = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = t.customer.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      a.intersect(b).withColumn("op", lit("both"))
        .unionByName(a.except(b).withColumn("op", lit("building_only")))
        .groupBy("op").agg(count(lit(1)).as("n"))
    },

    // 5-table star join: revenue by nation (TPC-H Q5 shape). The FIXED
    // dimensions (nation 25 rows, region 5 — constant at every sf) carry
    // explicit broadcast hints; supplier and customer are sf-SCALING
    // tables (sf×10k / sf×150k), so their join strategy is left to the
    // planner — it broadcasts them below its threshold (the bench-scale
    // plan is identical to the hinted one; PlanShapeSpec pins it) and
    // flips to a shuffled join once they outgrow it, which a pinned hint
    // would prevent (the q3 sf10 lesson). The single guaranteed shuffle
    // is the lineitem↔orders join.
    "q11_star_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      t.lineitem
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Correlated-style per-group comparison: parts above their brand's average
    // retail price (windowed avg, no self-join / no shuffle beyond one hash).
    "q12_above_avg" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("p_brand"))
      t.part
        .withColumn("brand_avg",
          (sum(dec2(col("p_retailprice"))).over(w).cast("double") /
            count(lit(1)).over(w)))
        .filter(col("p_retailprice") > col("brand_avg") * 1.01)
        .select(col("p_partkey"), col("p_brand"),
          col("p_retailprice"), round(col("brand_avg"), 6).as("brand_avg"))
    },

    // Pivot: event counts per user bucket × event type (conditional agg —
    // one pass, map-side combined).
    "q13_pivot" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // Sessionize (gaps-and-islands): new session when the gap to the
    // previous event of the same user is >= 30 minutes. One window pass +
    // one agg — the batch shape of session_window().
    "q14_sessionize" -> { (s, dir) =>
      val t = Tables(s, dir)
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) >=
              30L * 60 * 1000000, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          dsum(col("value")).as("sum_value"))
    },

    // SQL entry path: scalar + IN subqueries via spark.sql over temp views.
    "q15_sql_subqueries" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.part.createOrReplaceTempView("part_v")
      t.supplier.createOrReplaceTempView("supplier_v")
      s.sql(
        """SELECT p_partkey, p_brand, p_retailprice
          |FROM part_v
          |WHERE p_retailprice > (
          |    SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
          |           / COUNT(*) * 1.01 FROM part_v)
          |  AND p_size IN (SELECT DISTINCT s_nationkey FROM supplier_v)""".stripMargin)
    },

    // Custom sketch aggregate: HLL distinct estimate must land within 10% of
    // exact (the boolean is what the oracle checks — the estimate itself is
    // deterministic but DuckDB can't reproduce it).
    "q17_hll_sketch" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users_exact"),
          graft.functions.HllAggregator.hll(col("user_id")).as("est"))
        .select(col("event_type"), col("n_users_exact"),
          (abs(col("est") - col("n_users_exact")) <=
            col("n_users_exact") * 0.1).as("hll_ok"))
    },

    // As-of join (ops.AsOfJoin): each event matched to the latest prior
    // purchase of the same user — union + fill-forward, one shuffle.
    "q18_asof_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val ev = t.events.select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val pur = t.events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("pus"))
        .agg(max(col("event_id")).as("pid"))
      graft.ops.AsOfJoin.asof(ev, pur, "user_id", "us", "pus", "p_")
        .filter(col("p_time").isNotNull)
        .select(col("event_id"), col("user_id"), col("us"),
          col("p_time").as("p_us"), col("p_pid"))
    },

    // Range join (ops.RangeJoin): error events paired with purchases of the
    // same user within ±1 hour — bucketed equi-join, not a nested loop.
    "q19_range_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      def side(kind: String, idCol: String, tsCol: String) =
        t.events.filter(col("event_type") === kind)
          .select(col("user_id"), unix_micros(col("ts")).as(tsCol),
            col("event_id").as(idCol))
      // both sides are event-stream slices — unbounded at scale, so the
      // bucket equi-join must shuffle (a local AQE broadcast of the
      // purchase side would hide the only shape that exists at 100 TB)
      graft.ops.RangeJoin.rangeJoin(
        side("error", "error_id", "e_us"),
        side("purchase", "purchase_id", "p_us").hint("shuffle_hash"),
        "user_id", "e_us", "p_us", 3600000000L)
        .select(col("user_id"), col("error_id"), col("purchase_id"),
          (col("e_us") - col("p_us")).as("gap_us"))
    },

    // Cube with grouping_id over lineitem flags.
    "q16_cube" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
    },

    // Arbitrary GROUPING SETS — the combos rollup (prefix chain, q7) and
    // cube (full lattice, q16) cannot express: each single-column marginal
    // plus the grand total, WITHOUT the pair cell. This is the mixture-
    // report shape (per-flag totals + per-status totals + overall) in ONE
    // corpus pass: Catalyst plans Expand (one row per set per input row)
    // into a single map-side-combined aggregation — at 100 TB that is one
    // scan + one shuffle versus one of each per report dimension.
    "q23_grouping_sets" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
    },

    // EXACT percentiles per event type via two-pass rank selection
    // ([[exactGroupQuantiles]]) — same answers as DuckDB's quantile_cont,
    // but with O(1) aggregation state per task where Spark's `percentile`
    // buffers a per-group value→count map (with 5 event-type groups, each
    // buffer approaches the group's distinct-value count on ONE task — the
    // plan that cannot survive 100×). Rounded to 6 decimals: the two
    // engines interpolate with algebraically-equal but differently-
    // associated double arithmetic.
    "q20_percentiles" -> { (s, dir) =>
      val t = Tables(s, dir)
      val qs = exactGroupQuantiles(
        t.events.select(col("event_type").as("g"), col("value"),
          // content-stable tiebreak spreads duplicate-value runs across
          // range slices (never changes a quantile — equal values are
          // interchangeable)
          xxhash64(col("event_id")).as("tb")),
        Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
      qs.groupBy(col("g").as("event_type"))
        .agg(
          round(max(when(col("pname") === "p50", col("q"))), 6).as("p50"),
          round(max(when(col("pname") === "p95", col("q"))), 6).as("p95"),
          round(max(when(col("pname") === "p99", col("q"))), 6).as("p99"),
          max(col("n_g")).as("n"))
    },

    // Latest-record-per-key compaction — the CDC / SCD-type-1 shape every
    // warehouse runs continuously (upsert streams compacted to current
    // state). The scalable form is a plain MAX over a (ts, unique-id, …)
    // struct: lexicographic struct comparison makes "latest, ties by id"
    // one aggregate with MAP-SIDE partial_max (the struct buffer keeps it
    // on SortAggregate rather than the hash path — a per-partition sort by
    // the grouping key, not by the version history) — versus the naive
    // `row_number() over (partition by key order by ts desc)`. The part
    // that matters at 100 TB: the agg shuffles ONE combined row per key;
    // the window shuffles every version of every key.
    "q24_latest_event" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"), col("value"))
        .groupBy("user_id")
        .agg(max(struct(col("us"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.us").as("last_us"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_event_type"),
          col("m.value").as("last_value"))
    },

    // Ordered-event FUNNEL analysis (view → click → purchase): how many
    // users progressed through each stage IN ORDER (first view strictly
    // before first click strictly before first purchase). The scalable
    // form is conditional-min aggregation — one keyed agg computes each
    // user's first timestamp per stage, one global agg counts the ordered
    // comparisons — versus the naive forms (per-user ORDER BY window, or
    // one self-join per funnel edge), which sort or replicate the full
    // event history. At 100 TB: one shuffle keyed by user, one row per
    // user into the final count; NULL comparisons fall out of the strict
    // `<` on both engines identically.
    "q25_funnel" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts"))))
            .as("t_view"),
          min(when(col("event_type") === "click", unix_micros(col("ts"))))
            .as("t_click"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
            .as("t_purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L))
            .as("n_view_click"),
          sum(when(col("t_view") < col("t_click") &&
            col("t_click") < col("t_purchase"), 1L).otherwise(0L))
            .as("n_full_funnel"))
    },

    // Bucketed co-located join through ops.Bucketing: both sides persisted
    // bucketed+sorted on the join key, so the join plans with NO exchange —
    // each task reads matching buckets from both tables (the 100 TB answer
    // to a join that would otherwise shuffle both sides every run). The
    // oracle is the plain join on the raw parquet — identical results prove
    // the bucketed path is pure physical layout.
    "q22_bucketed_join" -> { (s, dir) =>
      q22Layout(s, dir)
      q22Join(s)
    },

    // Pathological-skew join through ops.Salting: collapsing user_id < 100
    // onto one group makes a single key carry ~2/3 of every event, the
    // shape where one shuffle partition OOMs an executor at scale. The salt
    // spreads that key over 8 sub-keys (content-derived, retry-safe) while
    // the small side explodes once per salt value; the dim is shuffle-
    // hinted because a broadcast would bypass the shuffle the salt exists
    // to fix (and at 100 TB a per-key dim need not be broadcastable). The
    // oracle is the PLAIN unsalted join — identical results prove salting
    // is pure plumbing.
    "q21_salted_skew" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(
          when(col("user_id") < 100L, 0L).otherwise(col("user_id")).as("grp"),
          col("value"), col("event_id"))
      val dim = ev.select(col("grp")).distinct()
        .withColumn("tier", pmod(col("grp"), lit(7L)))
      graft.ops.Salting.saltedJoin(ev, dim.hint("shuffle_hash"), "grp", 8)
        .groupBy("tier")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          max(col("event_id")).as("max_event_id"))
    })

  val oracles: Map[String, String] = Map(
    "q22_bucketed_join" ->
      """SELECT l.l_orderkey % 10 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q21_salted_skew" ->
      """WITH ev AS (
        |  SELECT CASE WHEN user_id < 100 THEN 0 ELSE user_id END AS grp,
        |    value, event_id
        |  FROM events),
        |dim AS (SELECT DISTINCT grp, grp % 7 AS tier FROM ev)
        |SELECT d.tier, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MAX(e.event_id) AS max_event_id
        |FROM ev e JOIN dim d USING (grp)
        |GROUP BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_antijoin" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,
    "q6_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |        ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3""".stripMargin,
    "q7_rollup" ->
      """SELECT p_brand, p_type, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MAX(p_size) AS max_size
        |FROM part GROUP BY ROLLUP (p_brand, p_type)""".stripMargin,
    "q8_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MAX(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q9_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q10_setops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT op, COUNT(*) AS n FROM (
        |  SELECT c_custkey, 'both' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT c_custkey, 'building_only' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |) GROUP BY op""".stripMargin,
    "q11_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "q12_above_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice, ROUND(brand_avg, 6) AS brand_avg
        |FROM (SELECT p_partkey, p_brand, p_retailprice,
        |        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
        |          / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
        |      FROM part)
        |WHERE p_retailprice > brand_avg * 1.01""".stripMargin,
    "q13_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin,
    "q14_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(date_trunc('microseconds', ts))
        |            - epoch_us(date_trunc('microseconds', lag(ts) OVER w))
        |              >= 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  epoch_us(date_trunc('microseconds', MAX(ts)))
        |    - epoch_us(date_trunc('microseconds', MIN(ts))) AS duration_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "q15_sql_subqueries" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part
        |WHERE p_retailprice > (
        |    SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*) * 1.01 FROM part)
        |  AND p_size IN (SELECT DISTINCT s_nationkey FROM supplier)""".stripMargin,
    "q17_hll_sketch" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact,
        |  true AS hll_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q18_asof_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us,
        |              event_id FROM events),
        |pur AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us,
        |          MAX(event_id) AS pid
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, us, 0 AS side, NULL::BIGINT AS event_id, pid FROM pur
        |  UNION ALL
        |  SELECT user_id, us, 1 AS side, event_id, NULL::BIGINT AS pid FROM ev),
        |filled AS (
        |  SELECT user_id, us, side, event_id,
        |    last_value(pid IGNORE NULLS) OVER w AS p_pid,
        |    last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS) OVER w AS p_us
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY us, side
        |                      ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, us, p_us, p_pid
        |FROM filled WHERE side = 1 AND p_us IS NOT NULL""".stripMargin,
    "q19_range_join" ->
      """WITH e AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS e_us,
        |             event_id AS error_id FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS p_us,
        |        event_id AS purchase_id FROM events WHERE event_type = 'purchase')
        |SELECT e.user_id, error_id, purchase_id, e_us - p_us AS gap_us
        |FROM e JOIN p ON e.user_id = p.user_id
        |  AND abs(e_us - p_us) <= 3600000000""".stripMargin,
    "q16_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q23_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q25_funnel" ->
      """WITH per AS (SELECT user_id,
        |  MIN(CASE WHEN event_type = 'view'
        |        THEN epoch_us(date_trunc('microseconds', ts)) END) AS t_view,
        |  MIN(CASE WHEN event_type = 'click'
        |        THEN epoch_us(date_trunc('microseconds', ts)) END) AS t_click,
        |  MIN(CASE WHEN event_type = 'purchase'
        |        THEN epoch_us(date_trunc('microseconds', ts)) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view_click,
        |  CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM per""".stripMargin,

    // the oracle may use the naive window (it is the SEMANTIC spec; the
    // Spark side's struct-max agg is the scalable equivalent) — ties
    // cannot happen (event_id unique) but the DESC id tie-break mirrors
    // the struct comparison anyway
    "q24_latest_event" ->
      """WITH e AS (SELECT user_id,
        |             epoch_us(date_trunc('microseconds', ts)) AS us,
        |             event_id, event_type, value FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rk FROM e)
        |SELECT user_id, us AS last_us, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value
        |FROM r WHERE rk = 1""".stripMargin,

    // WHERE value IS NOT NULL mirrors exactGroupQuantiles' null drop: n
    // counts VALUES (not rows), and a group whose values are all NULL
    // produces no row on either side
    "q20_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 6) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 6) AS p99,
        |  COUNT(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type""".stripMargin)
}
