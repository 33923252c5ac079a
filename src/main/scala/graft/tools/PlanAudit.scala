package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print shuffle/scan/join counts per catalog query — the
  * quick audit pass for "is this the plan that survives 100×" (run after
  * adding operators; PlanSpec pins the load-bearing shapes permanently).
  * Usage: `sbt "runMain graft.tools.PlanAudit q_ts_gaps q_ts_holt ..."`
  * (no args = the full catalog). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.collect() // settle AQE
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val ex = "(?i)Exchange (hash|range)partitioning".r.findAllIn(p).length
      val scans = "FileScan parquet".r.findAllIn(p).length
      val bnl = "BroadcastNestedLoop".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val fallback = "CodegenFallback".r.findAllIn(p).length
      println(f"[audit] $n%-28s exch=$ex scans=$scans smj=$smj bnlj=$bnl fallback=$fallback")
    }
    spark.stop()
  }
}
