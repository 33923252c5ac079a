package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Build-side profiling aid: time named catalog queries under the exact
  * Bench session (local[N], cached tables, warmed codegen) and print
  * per-pass seconds — the iteration loop for the "slowest bench entries"
  * optimization axis. Usage: runMain graft.tools.ProfileQ <sfDir> <passes> <name...>
  * Pass `explain:<name>` to dump the formatted plan instead of timing. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJAGG_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.lineitem _, Tables.orders _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.nation _, Tables.region _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach { t => t(spark, sfDir).cache().count() }
    // mirror Bench's ingest-time media pinning so multimodal profiles
    // measure the decode stage, not corpus (re-)encoding
    graft.operators.Multimodal.syntheticImages(spark, sfDir).toDF().cache().count()
    graft.operators.Multimodal.syntheticWavs(spark, sfDir).toDF().cache().count()
    val qs = SparkEntry.queries
    names.foreach { raw =>
      val (explain, name) =
        if (raw.startsWith("explain:")) (true, raw.stripPrefix("explain:")) else (false, raw)
      qs.get(name) match {
        case None => println(s"[profileq] unknown query: $name")
        case Some(fn) =>
          if (explain) {
            println(s"==== $name ====")
            fn(spark, sfDir).explain("formatted")
          } else {
            // warm pass at the (overridable) small SF (codegen), then
            // timed passes at sfDir. NonFatal only — a broken query must
            // fail loudly here, not get silently timed as if warmed.
            val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
            try fn(spark, warmDir).count()
            catch { case scala.util.control.NonFatal(e) =>
              println(s"[profileq] warm pass for $name failed: ${e.getMessage}") }
            val ts = (1 to passes).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            }
            println(f"[profileq] $name: ${ts.map(t => f"$t%.3f").mkString(" ")} (min ${ts.min}%.3f)")
          }
      }
    }
    spark.stop()
  }
}
