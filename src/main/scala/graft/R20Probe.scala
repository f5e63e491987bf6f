package graft

import org.apache.spark.sql.functions._

/** r20 optimization-round phase profiler (dev-only, not driver contract):
  * splits the VERDICT r19 target entries into phases so the optimization
  * targets the phase that actually costs (guide §1).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.R20Probe [c2|c1|t21|d19]"
  */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[r20] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    val what = args.headOption.getOrElse("c2")
    for (round <- 1 to 3) {
      System.err.println(s"[r20] --- round $round: $what ---")
      what match {
        case "c2" =>
          // phase-split of c2_kmeans_lloyd: seed checkpoint, then per Lloyd
          // round the assignment+mean agg (forced) and the k-row checkpoint
          val e = analytics.Tables(spark, sfDir).embeddings
            .select(col("vec_id"), col("embedding"))
          var cents = t("seed checkpoint")(
            e.filter(col("vec_id") < 16)
              .select(col("vec_id").as("centroid_id"),
                col("embedding").as("cemb"))
              .localCheckpoint())
          for (i <- 1 to 3) {
            val out = analytics.Similarity.kmeansRound(e, cents)
            if (i < 3)
              cents = t(s"round $i agg+checkpoint")(
                out.select(col("centroid_id"), col("cemb")).localCheckpoint())
            else
              t(s"round $i final force")(force(
                out.select(col("centroid_id"), col("n_members"),
                  col("shift"))))
          }
        case "c1" =>
          t("c1 total")(force(
            SparkEntry.queries("c1_kmeans")(spark, sfDir)))
        case "c2total" =>
          t("c2 total")(force(
            SparkEntry.queries("c2_kmeans_lloyd")(spark, sfDir)))
        case "c3" =>
          t("c3 total")(force(
            SparkEntry.queries("c3_kmeans_seed")(spark, sfDir)))
        case "c6" =>
          t("c6 total")(force(
            SparkEntry.queries("c6_kmeans_minibatch")(spark, sfDir)))
        case "t21" =>
          // the s7 layout is the untimed setup (matches Bench)
          analytics.Similarity.s7Layout(spark, sfDir)
          GraftSession.releaseCaches(spark)
          // phase 1: the stream machinery alone — same log write, same
          // micro-batch cadence, but the foreachBatch body only counts the
          // batch (no serve plan, no result write)
          t("t21 machinery floor")(
            analytics.Transport.t21MachineryFloor(spark, sfDir))
          // phase 2: the serve plan alone, batch-style — one
          // s13ServeQueryIds call over a quarter of the query set
          val qids = spark.range(analytics.Similarity.standardQueryCount / 4)
            .select(col("id").as("qid")).localCheckpoint(true)
          t("t21 one serve call")(
            analytics.Similarity.s13ServeQueryIds(spark, sfDir, qids))
          t("t21 one serve call again")(
            analytics.Similarity.s13ServeQueryIds(spark, sfDir, qids))
          // phase 3: the full entry as Bench times it
          t("t21 stream total")(force(
            analytics.Transport.t21QueryServeStream(spark, sfDir)))
        case "d19" =>
          t("build")(analytics.Dedup.d14Build(spark, sfDir))
          t("rebuild r4")(analytics.Dedup.d14Rebuild(spark, sfDir, 4))
          t("query @r4")(force(analytics.Dedup.d14Query(spark, sfDir)))
        case "d16" =>
          analytics.Dedup.d14Build(spark, sfDir)
          val w1acc = analytics.Dedup
            .d14Query(spark, sfDir, Seq("src0", "src1"))
            .filter(col("novel")).select(col("doc_id")).localCheckpoint(true)
          analytics.Dedup.d14Append(spark, sfDir, w1acc)
          GraftSession.releaseCaches(spark)
          t("compact")(analytics.Dedup.d14Compact(spark, sfDir))
          t("post query")(force(analytics.Dedup.d14Query(
            spark, sfDir, Seq("src2", "src3", "src4"))))
        case "d17" =>
          analytics.Dedup.d14Build(spark, sfDir)
          GraftSession.releaseCaches(spark)
          t("forget")(analytics.Dedup.d14Forget(spark, sfDir,
            analytics.Dedup.ForgottenSources))
          t("post query")(force(analytics.Dedup.d14Query(spark, sfDir)))
        case "s7plan" =>
          // plan evidence for the layout WRITE frame (the returned query
          // frame never shows the build job's plan)
          val txt = analytics.Similarity.s7LayoutFrame(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          val out = args.lift(1).getOrElse("/tmp/s7_layout_plan.txt")
          java.nio.file.Files.write(java.nio.file.Paths.get(out),
            txt.getBytes("UTF-8"))
          System.err.println(s"[r20] wrote $out")
          spark.stop(); return
        case "s7" =>
          t("s7 layout")(analytics.Similarity.s7Layout(spark, sfDir))
          t("s7 query")(force(analytics.Similarity.s7Query(spark, sfDir)))
        case "s9x" =>
          // phase dissection of the fused s9 midsection (dev-only): the
          // frames replicate the registry entry's internals piecewise
          val e = analytics.Tables(spark, sfDir).embeddings
          val ivfCents = broadcast(e.filter(col("vec_id") < 16)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("cemb")))
          val carr = broadcast(ivfCents.agg(collect_list(
            struct(col("centroid_id"), col("cemb"))).as("cs")))
          val subs0 = e.select(col("vec_id"), explode(expr(
            "transform(sequence(0, 7), j -> struct(CAST(j AS BIGINT) AS j, slice(embedding, j*8+1, 8) AS sv))"))
            .as("s"))
            .select(col("vec_id"), col("s.j").as("j"), col("s.sv").as("sv"))
          val pqCents = broadcast(subs0.filter(col("vec_id") < 16)
            .select(col("vec_id").as("code"), col("j"), col("sv").as("csv")))
          val cbs = broadcast(pqCents
            .agg(collect_list(struct(col("j"), col("code"), col("csv")))
              .as("all"))
            .select(expr("transform(sequence(0, 7), jj -> " +
              "transform(filter(all, p -> p.j = jj), " +
              "p -> struct(p.code AS id, p.csv AS vec)))").as("cbs")))
          val mask = (1L << graft.functions.FloatVecArgmin.IdBits) - 1
          t("scan only")(force(e.select(col("vec_id"), col("embedding"))))
          t("argmin64")(force(e.select(col("vec_id"), col("embedding"))
            .crossJoin(carr)
            .select(col("vec_id"), graft.functions.FloatVecArgmin
              .pkOf(col("embedding"), col("cs")).bitwiseAND(lit(mask))
              .as("centroid_id"))))
          def rnd(c: org.apache.spark.sql.Column) =
            org.apache.spark.sql.functions.round(c)
          t("argmin64 old agg form")(force(
            e.select(col("vec_id"), col("embedding"))
              .crossJoin(ivfCents)
              .withColumn("d2r", org.apache.spark.sql.functions.round(
                graft.functions.FloatVecDecimal
                  .fdist2Exact(col("embedding"), col("cemb")), 6))
              .groupBy(col("vec_id"))
              .agg(min(rnd(col("d2r") * lit(1000000d)).cast("long") *
                lit(1L << 20) + col("centroid_id")).as("pk"))
              .select(col("vec_id"),
                col("pk").bitwiseAND(lit(mask)).as("centroid_id"))))
          t("fdist2 bare 16x (no argmin)")(force(
            e.select(col("vec_id"), col("embedding"))
              .crossJoin(ivfCents)
              .select(col("vec_id"), col("centroid_id"),
                graft.functions.FloatVecDecimal
                  .fdist2Exact(col("embedding"), col("cemb")).as("d2"))))
          t("subs explode only")(force(subs0))
          t("codes only (no ivf)")(force(subs0.crossJoin(cbs)
            .select(col("vec_id"), col("j"),
              graft.functions.FloatVecArgmin.pkOf(col("sv"),
                element_at(col("cbs"), (col("j") + 1).cast("int")))
                .bitwiseAND(lit(mask)).as("code"))))
          t("codes old agg form")(force(subs0.join(pqCents, Seq("j"))
            .select(col("vec_id"), col("j"), col("code"),
              org.apache.spark.sql.functions.round(
                graft.functions.FloatVecDecimal
                  .fdist2Exact(col("sv"), col("csv")), 6).as("d2"))
            .groupBy(col("vec_id").as("cid"), col("j"))
            .agg(min(org.apache.spark.sql.functions.round(
              col("d2") * lit(1000000d)).cast("long") *
              lit(1L << 20) + col("code")).as("pk"))
            .select(col("cid"), col("j"),
              col("pk").bitwiseAND(lit(mask)).as("code"))))
          t("s9 full entry")(force(
            SparkEntry.queries("s9_ann_ivfpq")(spark, sfDir)))
          t("s5 full entry")(force(
            SparkEntry.queries("s5_ann_pq")(spark, sfDir)))
          // the r19 form of s9, replicated verbatim (for the in-session
          // old-vs-new receipt)
          t("s9 OLD form full") {
            val QueryCount = 10
            val Cand = 50
            def rnd6(c: org.apache.spark.sql.Column) =
              org.apache.spark.sql.functions.round(c, 6)
            val assigned = e.select(col("vec_id"), col("embedding"))
              .crossJoin(ivfCents)
              .withColumn("d2r", rnd6(graft.functions.FloatVecDecimal
                .fdist2Exact(col("embedding"), col("cemb"))))
            val lists = assigned.groupBy(col("vec_id").as("cid"))
              .agg(min(rnd(col("d2r") * lit(1000000d)).cast("long") *
                lit(1L << 20) + col("centroid_id")).as("pk"))
              .select(col("cid"), col("pk").bitwiseAND(lit(mask))
                .as("centroid_id"))
            val probes = assigned.filter(col("vec_id") < QueryCount)
              .groupBy(col("vec_id").as("qid"))
              .agg(slice(array_sort(collect_list(
                struct(col("d2r"), col("centroid_id")))), 1, 2).as("top"))
              .select(col("qid"),
                explode(col("top.centroid_id")).as("centroid_id"))
            val dist = subs0.join(pqCents, Seq("j"))
              .select(col("vec_id"), col("j"), col("code"),
                rnd6(graft.functions.FloatVecDecimal
                  .fdist2Exact(col("sv"), col("csv"))).as("d2"))
            val codes = dist.groupBy(col("vec_id").as("cid"), col("j"))
              .agg(min(rnd(col("d2") * lit(1000000d)).cast("long") *
                lit(1L << 20) + col("code")).as("pk"))
              .select(col("cid"), col("j"),
                col("pk").bitwiseAND(lit(mask)).as("code"))
            val lut = broadcast(dist.filter(col("vec_id") < QueryCount)
              .select(col("vec_id").as("qid"), col("j"), col("code"),
                col("d2")))
            val adc = codes.join(lists.hint("shuffle_hash"), "cid")
              .join(broadcast(probes), "centroid_id")
              .join(lut, Seq("qid", "j", "code"))
              .filter(col("qid") =!= col("cid"))
              .groupBy("qid", "cid")
              .agg(sum(col("d2").cast("decimal(30,15)")).cast("double")
                .as("approx"))
            force(adc)
          }
          t("s9 NEW to adc") {
            val QueryCount = 10
            def rnd6(c: org.apache.spark.sql.Column) =
              org.apache.spark.sql.functions.round(c, 6)
            val probes = e.filter(col("vec_id") < QueryCount)
              .select(col("vec_id"), col("embedding"))
              .crossJoin(ivfCents)
              .withColumn("d2r", rnd6(graft.functions.FloatVecDecimal
                .fdist2Exact(col("embedding"), col("cemb"))))
              .groupBy(col("vec_id").as("qid"))
              .agg(slice(array_sort(collect_list(
                struct(col("d2r"), col("centroid_id")))), 1, 2).as("top"))
              .select(col("qid"),
                explode(col("top.centroid_id")).as("centroid_id"))
            val lut = broadcast(subs0.filter(col("vec_id") < QueryCount)
              .join(pqCents, Seq("j"))
              .select(col("vec_id").as("qid"), col("j"), col("code"),
                rnd6(graft.functions.FloatVecDecimal
                  .fdist2Exact(col("sv"), col("csv"))).as("d2")))
            val codes = e.select(col("vec_id"), col("embedding"))
              .crossJoin(carr)
              .withColumn("centroid_id", graft.functions.FloatVecArgmin
                .pkOf(col("embedding"), col("cs")).bitwiseAND(lit(mask)))
              .select(col("vec_id"), col("centroid_id"), explode(expr(
                "transform(sequence(0, 7), j -> struct(CAST(j AS BIGINT) AS j, slice(embedding, j*8+1, 8) AS sv))"))
                .as("s"))
              .select(col("vec_id"), col("centroid_id"),
                col("s.j").as("j"), col("s.sv").as("sv"))
              .crossJoin(cbs)
              .withColumn("pk", graft.functions.FloatVecArgmin.pkOf(
                col("sv"), element_at(col("cbs"), (col("j") + 1)
                  .cast("int"))))
              .select(col("vec_id").as("cid"), col("centroid_id"),
                col("j"), col("pk").bitwiseAND(lit(mask)).as("code"))
            val adc = codes
              .join(broadcast(probes), "centroid_id")
              .join(lut, Seq("qid", "j", "code"))
              .filter(col("qid") =!= col("cid"))
              .groupBy("qid", "cid")
              .agg(sum(col("d2").cast("decimal(30,15)")).cast("double")
                .as("approx"))
            force(adc)
          }
      }
      GraftSession.releaseCaches(spark)
      System.gc()
    }
    spark.stop()
  }
}
