package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print shuffle/scan/join counts — and, since round 15, the
  * JOB count — per catalog query: the quick audit pass for "is this the
  * plan that survives 100×" (run after adding operators; PlanSpec pins
  * the load-bearing shapes permanently). The job count separates
  * FLOOR-BOUND tail queries (1-2 jobs, dominated by the ~100 ms/job VM
  * constant — accept) from FUSIBLE ones (several jobs re-walking the
  * same grid-sized data — collapse the subtrees); VERDICT r14 missing #5.
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      // one throwaway execution absorbs session-warming jobs (function
      // registration, table listing), then the counted run measures the
      // query's own job fan-out incl. driver-fold prepasses + AQE re-plans
      df.collect()
      Thread.sleep(300) // listener bus is async; let warm-up events drain
      jobs.set(0)
      val df2 = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val t0 = System.nanoTime()
      df2.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val nJobs = jobs.get()
      val p = df2.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val ex = "(?i)Exchange (hash|range)partitioning".r.findAllIn(p).length
      val scans = "FileScan parquet".r.findAllIn(p).length
      val bnl = "BroadcastNestedLoop".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val fallback = "CodegenFallback".r.findAllIn(p).length
      println(f"[audit] $n%-28s jobs=$nJobs%-3d exch=$ex scans=$scans smj=$smj bnlj=$bnl fallback=$fallback secs=$secs%.2f")
    }
    spark.stop()
  }
}
