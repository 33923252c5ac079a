package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch profiler for q_dedup_cluster under Bench's exact warm/cached
  * conditions (not part of the library surface; run via
  * `sbt runMain graft.tools.ProfileCluster`). */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.operators.LlmScale.qDedupCluster
    // Bench-identical warm: run once at sf0.001, pin the doc table + the
    // two minhash plan shapes the query builds
    q(spark, "/root/testdata/sf0.001").count()
    val docs = graft.Tables.documents(spark, sfDir)
    docs.cache().count()
    Seq(
      graft.operators.Dedup.minHashFromText(docs, "text", 8, 3),
      graft.operators.Dedup.minHashFromText(
        docs.select(col("doc_id"), col("text")), "text", 8, 3),
      graft.operators.Dedup.withShinglesFast(docs, "text", 3))
      .foreach(df => df.cache().count())
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[prof] dd_cluster pass $i: ${(System.nanoTime() - t0) / 1e9}%6.3f s (n=$n)")
    }
    spark.stop()
  }
}
