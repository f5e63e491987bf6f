package graft.analytics

import graft.{SparkEntry, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t19_stream_assign laws (the c1→t19 batch≡streaming pair, same
  * discipline as s11→t15 / p20→t16 / q24→t17): after end-of-log the
  * streaming k-means assignment must equal c1's batch Lloyd round
  * bit-for-bit, and the ONLY streaming state is the (centroid, dim)
  * running-moment table — O(K×dims) rows at ANY corpus size, never
  * O(vectors). Runs on the real sf0.001 embeddings (multi-micro-batch:
  * the ingest cap forces ~4 batches, so the equality crosses batch
  * boundaries, not just a single-trigger replay).
  */
class StreamAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  // Registration order is execution order (suites run sequentially in the
  // forked test JVM): the first test materializes the stream + sink the
  // second test's state-cardinality law inspects.
  test("t19 streaming assignment == c1 batch round bit-for-bit (sf0.001)") {
    val stream = SparkEntry.queries("t19_stream_assign")(spark, dir)
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("c1_kmeans")(spark, dir)
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty, "t19 returned no centroids")
    assert(stream == batch,
      "streaming assignment diverged from c1's batch round")
  }

  test("t19 state is O(K x dims): sink groups bounded by 16 x embedding dims") {
    val dims = Tables(spark, dir).embeddings
      .select(size(col("embedding"))).head().getInt(0)
    val sink = spark.table("t19_assign_sink")
    // update-mode re-emissions repeat a group across micro-batches, but
    // the GROUP set — the state the store actually holds — is the
    // (centroid_id, d) grid and nothing else
    val groups = sink.select("centroid_id", "d").distinct().count()
    assert(groups <= 16L * dims,
      s"state grew past the K x dims grid: $groups > ${16L * dims}")
    assert(sink.select("centroid_id").distinct().count() <= 16L,
      "assignment emitted a centroid id outside the frozen seed set")
    // multi-batch proof: at least one group emitted more than once, so
    // the bit-for-bit equality above crossed a micro-batch boundary
    assert(sink.count() > groups,
      "expected update-mode re-emissions across micro-batches")
  }
}
