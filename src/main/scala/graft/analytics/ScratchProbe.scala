package graft.analytics

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev probe (not part of the driver contract): stage-level timing for the
  * d8 sf1 superlinearity hunt.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft/sf1")
    val spark = GraftSession.get()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def t[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val pairs = Similarity.embedNearDup(spark, sfDir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    t("pairs.count")(println("  n=" + pairs.count()))
    GraftSession.releaseCaches(spark); System.gc()
    t("pairs.count warm")(println("  n=" + pairs.count()))
    GraftSession.releaseCaches(spark); System.gc()
    val proj = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
    t("proj.count (no distinct)")(println("  n=" + proj.count()))
    GraftSession.releaseCaches(spark); System.gc()
    val canon = proj.distinct()
    t("canon.count")(println("  n=" + canon.count()))
    spark.conf.set("spark.sql.planChangeLog.level", "ERROR")
    println("=== pairs.count plan ===")
    pairs.groupBy().count().explain("formatted")
    println("=== canon.count plan ===")
    canon.groupBy().count().explain("formatted")
    spark.stop()
  }
}
