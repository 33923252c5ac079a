package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench: native AsofJoinExec vs the composed keyedAsof, narrow
  * (1 value column) and wide (4-field payload — keyedAsof carries one
  * column, so the payload packs into a struct) geometries at sf0.1.
  * Numbers recorded in IMPLEMENTATION.md / BASELINE.md. */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = graft.Tables.events(spark, d).cache(); ev.count()
    val probes = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("pt"))
      .agg(count(lit(1))).select(col("user_id").as("k"), col("pt")).cache(); probes.count()
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[abench] $tag run$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val narrow = ev.select(col("user_id").as("rk"), col("ts").as("rt"), col("value").as("v"))
    val wide = ev.select(col("user_id").as("rk"), col("ts").as("rt"),
      col("value").as("v"), col("event_id").as("eid"), col("event_type").as("et"),
      col("props").as("pr"))
    time("native-narrow")(
      graft.plans.NativeAsof.asofJoin(probes, narrow, "k", "rk", "pt", "rt").count())
    time("native-wide")(
      graft.plans.NativeAsof.asofJoin(probes, wide, "k", "rk", "pt", "rt").count())
    val pn = probes.withColumnRenamed("k", "user_id")
    time("keyed-narrow")(graft.operators.AsofJoin.keyedAsof(
      pn, narrow.select(col("rk").as("user_id"), col("rt"), col("v")),
      "user_id", "pt", "rt", "v").count())
    time("keyed-wide-struct")(graft.operators.AsofJoin.keyedAsof(
      pn, wide.select(col("rk").as("user_id"), col("rt"),
        struct(col("v"), col("eid"), col("et"), col("pr")).as("payload")),
      "user_id", "pt", "rt", "payload").count())
    spark.stop()
  }
}
