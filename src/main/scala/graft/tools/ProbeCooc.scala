package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition probe for q_item_cooc_topk (r17): times each
  * pipeline segment in isolation under the Bench session shape.
  * Usage: runMain graft.tools.ProbeCooc <sfDir> <passes> */
object ProbeCooc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).cache().count()
    graft.functions.GraftFunctions.register(spark)

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: ${ts.map(t => f"$t%.3f").mkString(" ")} (min ${ts.min}%.3f)")
    }

    def basketsDf = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))

    time("baskets-agg-noop") {
      basketsDf.write.format("noop").mode("overwrite").save()
    }
    time("baskets-checkpoint") {
      basketsDf.localCheckpoint().unpersist(blocking = true)
    }
    val baskets = basketsDf.localCheckpoint()
    time("ni") {
      baskets.select(explode(col("items")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pairs-gen-agg") {
      baskets.select(expr("graft_arr_pairs(items)"))
        .groupBy(col("id_a").as("pk"), col("id_b").as("pk2"))
        .agg(count(lit(1)).as("cij"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pairs-hof-agg") {
      baskets.select(explode(expr(
          """flatten(transform(items, (x, i) ->
            |  transform(slice(items, i + 2, size(items)), y -> struct(x AS pk, y AS pk2))))""".stripMargin))
          .as("p"))
        .select(col("p.pk").as("pk"), col("p.pk2").as("pk2"))
        .groupBy("pk", "pk2").agg(count(lit(1)).as("cij"))
        .write.format("noop").mode("overwrite").save()
    }
    val ni = baskets.select(explode(col("items")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n")).localCheckpoint()
    val pairs = baskets.select(expr("graft_arr_pairs(items)"))
      .groupBy(col("id_a").as("pk"), col("id_b").as("pk2"))
      .agg(count(lit(1)).as("cij")).localCheckpoint()
    time("score-join") {
      pairs
        .join(broadcast(ni.select(col("pk"), col("n").as("ci"))), "pk")
        .join(broadcast(ni.select(col("pk").as("pk2"), col("n").as("cj"))), "pk2")
        .withColumn("cosine", graft.operators.Num.roundd(col("cij").cast("double") /
          sqrt((col("ci") * col("cj")).cast("double")), 6))
        .write.format("noop").mode("overwrite").save()
    }
    val scored = pairs
      .join(broadcast(ni.select(col("pk"), col("n").as("ci"))), "pk")
      .join(broadcast(ni.select(col("pk").as("pk2"), col("n").as("cj"))), "pk2")
      .withColumn("cosine", graft.operators.Num.roundd(col("cij").cast("double") /
        sqrt((col("ci") * col("cj")).cast("double")), 6))
      .localCheckpoint()
    time("sym-topk") {
      scored.select(explode(array(
          struct(col("pk").as("i"), col("pk2").as("j"), col("cij"), col("cosine")),
          struct(col("pk2").as("i"), col("pk").as("j"), col("cij"), col("cosine")))).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"), col("e.cij").as("cij"),
          col("e.cosine").as("cosine"))
        .groupBy("i")
        .agg(call_function("graft_topk",
          col("cosine"), col("cij"), col("j"), lit(3)).as("nb"))
        .select(col("i").as("part"), posexplode(col("nb")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
