package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Build-side diagnostic for the per-query constant floor (VERDICT r10
  * #4): decomposes where the ~0.25-0.30 s/query goes on local[32] for
  * sub-second catalog queries — Catalyst analysis/optimization (timed by
  * forcing the executed plan without running it), versus execution
  * (scheduling + AQE re-plan + task latency). Run with different session
  * configs via env: SPARK_GRAFT_AQE=off, SPARK_GRAFT_SHUFFLE=<n>,
  * SPARK_GRAFT_CPUS=<n>.
  *
  * Usage: runMain graft.tools.FloorProbe <sfDir> <passes> <name...>
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "on") != "off")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.lineitem _, Tables.orders _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.nation _, Tables.region _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach { t => t(spark, sfDir).cache().count() }
    val qs: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.queries ++ Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
        // synthetic floor probes: the cost of literally nothing
        "__range1" -> ((sp, _) => sp.range(1).toDF()),
        "__select1" -> ((sp, _) => sp.sql("select 1 as x")),
        "__onestage" -> ((sp, _) => sp.range(1000).toDF()
          .selectExpr("sum(id) over (partition by id) s")), // window, 1 shuffle
        "__threestage" -> ((sp, dd) => Tables.events(sp, dd)
          .groupBy("event_type").count()
          .groupBy().sum("count")), // 2 shuffles + final
        "__events_scan" -> ((sp, dd) => Tables.events(sp, dd)),
        "__events_agg" -> ((sp, dd) => Tables.events(sp, dd)
          .groupBy("event_type").count()))
    // RDD-level job floor: no SQL, no codegen — pure DAGScheduler +
    // task-launch cost for 1 task and for `cpus` tasks.
    if (names.contains("__rdd")) {
      val sc = spark.sparkContext
      sc.parallelize(1 to 1, 1).count()
      for (np <- Seq(1, 8, 32)) {
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); sc.parallelize(1 to np, np).count()
          (System.nanoTime() - t0) / 1e3
        }
        println(f"[floor] __rdd($np%2d tasks): min ${ts.min}%9.0fus  med ${ts.sorted.apply(ts.size / 2)}%9.0fus")
      }
    }
    names.filterNot(_ == "__rdd").foreach { name =>
      qs.get(name) match {
        case None => println(s"[floor] unknown query: $name")
        case Some(fn) =>
          // warm codegen + JIT
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(e) =>
            println(s"[floor] $name warm failed: ${e.getMessage}") }
          val rows = (1 to passes).map { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val t1 = System.nanoTime() // build (DataFrame construction)
            df.queryExecution.executedPlan // force analysis+optimization+planning
            val t2 = System.nanoTime()
            df.count()
            val t3 = System.nanoTime()
            (t1 - t0, t2 - t1, t3 - t2)
          }
          def m(f: ((Long, Long, Long)) => Long) = rows.map(f).min / 1e3 // μs
          println(f"[floor] $name%-28s build ${m(_._1)}%9.0fus  plan ${m(_._2)}%9.0fus  exec ${m(_._3)}%9.0fus")
      }
    }
    spark.stop()
  }
}
