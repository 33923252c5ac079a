package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the LSH candidate pipeline (not part of the
  * library surface; run via `sbt runMain graft.tools.ProfileLsh`). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (n=$n)")
    }
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    time("warm-noop")(docs.count())
    val sh = Dedup.withShingles(docs, "text")
    time("shingles")(sh.agg(sum(size(col("shingles")))).head().getLong(0))
    val sig = Dedup.minHash(sh, 8)
    time("minhash-sigs")(sig.agg(sum(expr("aggregate(sig, 0L, (a, x) -> a + x) % 1000"))).head().getLong(0))
    val banded = sig.select(col("doc_id").as("__id"), col("sig"))
      .withColumn("band", explode(expr("sequence(0, 3)")))
      .select(col("__id"), col("band"),
        expr("slice(sig, band * (size(sig) div 4) + 1, size(sig) div 4)").as("band_sig"))
    time("banded-explode")(banded.count())
    val grouped = banded.groupBy("band", "band_sig")
      .agg(sort_array(collect_list(col("__id"))).as("ids"))
    time("group-collect")(grouped.count())
    val pairs = grouped.filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ids) - 1), j -> transform(slice(ids, 1, j), a -> struct(a AS id_a, element_at(ids, j + 1) AS id_b))))")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    time("pair-expand")(pairs.count())
    time("distinct")(pairs.distinct().count())
    time("full-lshCandidates")(Dedup.lshCandidates(sig, "doc_id", 4).count())
    val fast = Dedup.minHashFromText(docs, "text", 8)
    time("kernel-sigs")(fast.agg(sum(expr("aggregate(sig, 0L, (a, x) -> a + x) % 1000"))).head().getLong(0))
    time("kernel-lshCandidates")(Dedup.lshCandidates(fast, "doc_id", 4).count())
    time("kernel-nearDupPairs")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.2, 8, 4).count())
    spark.stop()
  }
}
