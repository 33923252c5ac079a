package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the screened dedup cascade at a scale
  * slice (not part of the library surface). */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale_1000x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    val docs = Tables.documents(spark, sfDir)
    val sigsE = Dedup.minHashFromText(docs.select(col("doc_id"), col("text")), "text", 64).persist()
    time("sketch64")(sigsE.count())
    val sigs8 = sigsE.withColumn("sig", expr("slice(sig, 1, 8)"))
    val cands = Dedup.lshCandidates(sigs8, "doc_id", 4).persist()
    time("candidates")(cands.count())
    val ea = sigsE.select(col("doc_id").as("id_a"), col("sig").as("__ea"))
    val eb = sigsE.select(col("doc_id").as("id_b"), col("sig").as("__eb"))
    graft.functions.GraftFunctions.register(spark)
    val pre = cands.join(ea, "id_a").join(eb, "id_b")
      .filter(expr("graft_sig_agree(__ea, __eb) >= 7"))
      .select("id_a", "id_b").persist()
    time("screen")(pre.count())
    val sh = Dedup.withShinglesFast(docs, "text", 3)
    def verify(p: org.apache.spark.sql.DataFrame): Long = {
      val a = sh.select(col("doc_id").as("id_a"), col("shingles").as("__ga"))
      val b = sh.select(col("doc_id").as("id_b"), col("shingles").as("__gb"))
      p.join(a, "id_a").join(b, "id_b")
        .withColumn("__inter", size(array_intersect(col("__ga"), col("__gb"))))
        .withColumn("jaccard", col("__inter").cast("double") /
          (size(col("__ga")) + size(col("__gb")) - col("__inter")))
        .filter(col("jaccard") >= 0.2).count()
    }
    time("verify-screened")(verify(pre))
    time("verify-unscreened")(verify(cands))
    spark.stop()
  }
}
