package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B profiler for the screened dedup cascade at a scale slice
  * (not part of the library surface). Arg 2: "real" times the shipping
  * nearDupPairs; "noprune" times a copy without the verify-side semi
  * join; "nockpt" additionally drops the localCheckpoints. */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale_1000x"
    val mode = if (args.length > 1) args(1) else "real"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    def noPrune(ckpt: Boolean): org.apache.spark.sql.DataFrame = {
      val sigsE0 = Dedup.minHashFromText(docs.select(col("doc_id"), col("text")), "text", 64)
      val sigsE = if (ckpt) sigsE0.localCheckpoint() else sigsE0
      val sigs = sigsE.withColumn("sig", expr("slice(sig, 1, 8)"))
      val cands = Dedup.lshCandidates(sigs, "doc_id", 4)
      val ea = sigsE.select(col("doc_id").as("id_a"), col("sig").as("__ea"))
      val eb = sigsE.select(col("doc_id").as("id_b"), col("sig").as("__eb"))
      val pre0 = cands.join(ea, "id_a").join(eb, "id_b")
        .filter(expr("graft_sig_agree(__ea, __eb) >= 7"))
        .select("id_a", "id_b")
      val pre = if (ckpt) pre0.localCheckpoint() else pre0
      val sh = Dedup.withShinglesFast(docs, "text", 3)
      val a = sh.select(col("doc_id").as("id_a"), col("shingles").as("__ga"))
      val b = sh.select(col("doc_id").as("id_b"), col("shingles").as("__gb"))
      pre.join(a, "id_a").join(b, "id_b")
        .withColumn("__i", size(array_intersect(col("__ga"), col("__gb"))))
        .withColumn("jaccard", col("__i").cast("double") /
          (size(col("__ga")) + size(col("__gb")) - col("__i")))
        .filter(col("jaccard") >= 0.2)
        .select("id_a", "id_b")
    }
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = mode match {
        case "real" =>
          Dedup.nearDupPairs(docs, "doc_id", "text", 0.2, 8, 4).count()
        case "noprune" => noPrune(ckpt = true).count()
        case "nockpt" => noPrune(ckpt = false).count()
      }
      println(f"[probe] $mode pass$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    spark.stop()
  }
}
