package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 test-data amplifier for the scale-evidence gate (BENCH_SF1.md): the
  * driver only materializes sf ≤ 0.1, so bigger inputs are derived from
  * sf0.1 by a structure-preserving ×N replication:
  *
  *   - documents: replica k rewrites each token t to t+letter(k) iff
  *     xxhash64(t, k) lands in a 60% bucket — a per-replica token
  *     BIJECTION, so every within-replica shingle/Jaccard/minhash
  *     relationship of the original corpus is preserved exactly, while
  *     cross-replica shingle overlap collapses (≥1 of 3 tokens in any
  *     3-gram differs with p ≈ 1 − 0.4³ per replica pair). The near-dup
  *     graph therefore scales ~linearly in N — the honest scaling probe —
  *     instead of the ×N²-clique blowup naive copying would inject.
  *   - embeddings: replica k applies a deterministic per-dimension SIGN
  *     FLIP (s_i = ±1 from xxhash64(i, k)). dot(s∘x, s∘y) = Σ s_i² x_i y_i
  *     = dot(x, y), so within-replica cosine structure is EXACT; across
  *     replicas dot(s∘x, t∘y) has random ± terms and cancels. (Cyclic
  *     rotation — the first attempt — is NOT decorrelating for
  *     autocorrelated vectors: a smooth vector shifted by one dim is
  *     nearly itself, and the sf1 near-dup graph came out 1650× denser
  *     than linear. The dense graph made a great stress input — it
  *     exposed the conjunct-reorder trap in Similarity's prefilter — but
  *     as the SCALING probe it must not inject cross-replica edges.)
  *   - lineitem: plain id-offset copies (scan/agg scaling only).
  *   - events: replica k offsets user_id and event_id — users are the
  *     session/as-of/interval-join keys, so replicas are fully independent
  *     per-key subproblems (the honest linear-scaling shape for q14/q18/
  *     q19 and the t5/t9/t10 stream windows); timestamps are kept, so
  *     time-window groups stay identical with ×N occupancy.
  *   - orders/customer: o_orderkey offsets in lockstep with lineitem's
  *     l_orderkey and o_custkey with c_custkey, so every within-replica
  *     join relationship (q3's star) is preserved exactly and
  *     cross-replica keys never collide.
  *
  * Ids offset by k·10⁹ per replica. Usage:
  * `runMain graft.ScaleGen <srcDir> <outDir> <factor>`.
  */
object ScaleGen {

  private val IdOffset = 1000000000L

  private[graft] def amplifyDocuments(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      if (k == 0) src
      else {
        val letter = ('a' + ((k - 1) % 26)).toChar.toString
        src.select(
          (col("doc_id") + lit(k * IdOffset)).as("doc_id"),
          concat_ws(" ", expr(
            s"""transform(split(text, ' '),
               |  t -> IF(pmod(xxhash64(t, $k), 5) < 3,
               |          concat(t, '$letter'), t))""".stripMargin))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }.reduce(_ unionByName _)

  private[graft] def amplifyEmbeddings(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      if (k == 0) src
      else
        src.select(
          (col("vec_id") + lit(k * IdOffset)).as("vec_id"),
          expr(s"""transform(embedding,
                  |  (v, i) -> IF(pmod(xxhash64(i, $k), 2) = 0, v, -v))"""
            .stripMargin).as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <outDir> <factor>")
    val (srcDir, outDir, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1 && factor <= 26 * 10, s"bad factor $factor")
    val spark = GraftSession.get()
    amplifyDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    amplifyEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until factor).map { k =>
      if (k == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(k * IdOffset))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // id-offset replication for the join/streaming families (doc above)
    def offsetCopies(table: String, idCols: String*): Unit = {
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      (0 until factor).map { k =>
        if (k == 0) src
        else idCols.foldLeft(src)((df, c) =>
          df.withColumn(c, col(c) + lit(k * IdOffset)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    offsetCopies("events", "event_id", "user_id")
    offsetCopies("orders", "o_orderkey", "o_custkey")
    offsetCopies("customer", "c_custkey")
    // dimension tables copy 1× unchanged — their keys are never offset, so
    // replication would be wrong, and without them a non-allowlisted query
    // against the scaled dir hard-fails on a missing parquet (the dir is
    // now self-contained for EVERY SparkEntry query)
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    println(s"[scalegen] wrote ${outDir} at factor $factor")
    spark.stop()
  }
}
