package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** The three as-of join shapes must agree: broadcast (small probe),
  * bucketed (large unkeyed), and — on a keyed crafted example — the
  * union-sort-carry form against hand-computed expectations. */
class AsofJoinSpec extends SparkSuite {

  private def probe = Tables.orders(spark, sf0001)
    .filter(col("o_orderkey") % 1000 === 0)
    .select(col("o_orderkey"), expr("o_orderdate + INTERVAL '10585' DAY").as("cutoff"))

  test("broadcastAsof ≡ bucketedAsof on the contract probe (daily buckets)") {
    val a = AsofJoin.broadcastAsof(probe, Tables.events(spark, sf0001), "cutoff", "ts", Seq("o_orderkey"))
    val b = AsofJoin.bucketedAsof(probe, Tables.events(spark, sf0001), "cutoff", "ts",
      Seq("o_orderkey"), bucketSeconds = 86400)
    assert(a.count() > 0)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("bucketedAsof: bucket width must not change results (1h vs 1 week)") {
    val h = AsofJoin.bucketedAsof(probe, Tables.events(spark, sf0001), "cutoff", "ts",
      Seq("o_orderkey"), bucketSeconds = 3600)
    val w = AsofJoin.bucketedAsof(probe, Tables.events(spark, sf0001), "cutoff", "ts",
      Seq("o_orderkey"), bucketSeconds = 7 * 86400)
    assert(h.except(w).count() == 0 && w.except(h).count() == 0)
  }

  test("native AsofJoinExec: inclusive at equal ts, null right for unmatched keys") {
    import spark.implicits._
    val left = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 12:00:00"),  // == right ts → inclusive
      (2L, "2024-01-01 08:00:00"),  // before key 2's only right row → null
      (3L, "2024-01-01 08:00:00")   // key absent on the right → null
    ).toDF("k", "s").withColumn("lt", col("s").cast("timestamp_ntz")).drop("s")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 100.0),
      (1L, "2024-01-01 12:00:00", 200.0),
      (2L, "2024-01-01 09:00:00", 999.0)
    ).toDF("rk", "s", "v").withColumn("rt", col("s").cast("timestamp_ntz")).drop("s")
    val out = graft.plans.NativeAsof.asofJoin(left, right, "k", "rk", "lt", "rt")
      .select(col("k"), col("lt").cast("string"), col("v"))
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      (1L, "2024-01-01 10:00:00", Some(100.0)),
      (1L, "2024-01-01 12:00:00", Some(200.0)),
      (2L, "2024-01-01 08:00:00", None),
      (3L, "2024-01-01 08:00:00", None)))
  }

  test("native asof directions: forward, nearest, tolerance (pandas merge_asof semantics)") {
    import spark.implicits._
    def ts(s: String) = col("s").cast("timestamp_ntz")
    val left = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 09:00:00"))
      .toDF("k", "s").withColumn("lt", ts("s")).drop("s")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 1.0),   // 60 min before 10:00, == 09:00
      (1L, "2024-01-01 10:30:00", 2.0))   // 30 min after 10:00
      .toDF("rk", "s", "v").withColumn("rt", ts("s")).drop("s")
    def run(dir: String, tol: Long = Long.MaxValue): Map[String, Option[Double]] =
      graft.plans.NativeAsof.asofJoin(left, right, "k", "rk", "lt", "rt", dir, tol)
        .select(col("lt").cast("string"), col("v"))
        .as[(String, Option[Double])].collect().toMap
    val min = 60L * 1000000
    assert(run("backward") ==
      Map("2024-01-01 10:00:00" -> Some(1.0), "2024-01-01 09:00:00" -> Some(1.0)))
    // forward: 10:00 → 10:30; 09:00 → the equal-ts row (distance 0)
    assert(run("forward") ==
      Map("2024-01-01 10:00:00" -> Some(2.0), "2024-01-01 09:00:00" -> Some(1.0)))
    // nearest to 10:00: 10:30 (30m) beats 09:00 (60m)
    assert(run("nearest") ==
      Map("2024-01-01 10:00:00" -> Some(2.0), "2024-01-01 09:00:00" -> Some(1.0)))
    // tolerance 20 min: nothing within reach of 10:00 in any direction
    assert(run("nearest", 20 * min) ==
      Map("2024-01-01 10:00:00" -> None, "2024-01-01 09:00:00" -> Some(1.0)))
    assert(run("backward", 30 * min) ==
      Map("2024-01-01 10:00:00" -> None, "2024-01-01 09:00:00" -> Some(1.0)))
  }

  test("native asof ≡ keyedAsof on sf0.001 events (per-user hour marks vs raw events)") {
    val ev = Tables.events(spark, sf0001)
    val probes = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("pt"))
      .agg(count(lit(1))).select(col("user_id").as("k"), col("pt"))
    val rightRaw = ev.select(col("user_id").as("rk"), col("ts").as("rt"), col("value").as("v"))
    val native = graft.plans.NativeAsof.asofJoin(probes, rightRaw, "k", "rk", "pt", "rt")
      .select(col("k"), col("pt"), col("v").as("asof_v"))
    val composed = AsofJoin.keyedAsof(
      probes.withColumnRenamed("k", "user_id"),
      rightRaw.select(col("rk").as("user_id"), col("rt"), col("v")),
      "user_id", "pt", "rt", "v")
      .select(col("user_id").as("k"), col("pt"), col("asof_v"))
    assert(native.count() == probes.count())
    assert(native.except(composed).count() == 0 && composed.except(native).count() == 0)
  }

  test("nearest direction ≡ brute-force min-|Δt| on sf0.001 events") {
    val ev = Tables.events(spark, sf0001)
    val probes = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("pt"))
      .agg(count(lit(1))).select(col("user_id").as("k"), col("pt"))
    val rightRaw = ev.select(col("user_id").as("rk"), col("ts").as("rt"), col("value").as("v"))
    val native = graft.plans.NativeAsof
      .asofJoin(probes, rightRaw, "k", "rk", "pt", "rt", "nearest")
      .select(col("k"), col("pt"), col("v"))
    // brute force: all same-key pairs ranked by |Δt|, ties to the backward
    // row (smaller rt sorts first); v last in the sort for full determinism
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "pt")
      .orderBy(abs(expr(
        "unix_micros(cast(rt as timestamp)) - unix_micros(cast(pt as timestamp))")).asc,
        col("rt").asc, col("v").asc)
    val brute = probes.join(rightRaw, col("k") === col("rk"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("pt"), col("v"))
    assert(native.count() == probes.count())
    assert(native.except(brute).count() == 0 && brute.except(native).count() == 0)
  }

  test("native asof plans as one exchange per side feeding AsofJoinExec") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "lt")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val df = graft.plans.NativeAsof.asofJoin(l, r, "k", "rk", "lt", "rt")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsofJoin ["), s"custom exec missing (nodeName strips Exec):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"expected exactly the two key shuffles:\n$p")
  }

  test("keyedAsof: carries latest right value per key, inclusive at equal ts") {
    import spark.implicits._
    val left = Seq(
      (1L, "2024-01-01 10:00:00"), // after r@09:00 → 100.0
      (1L, "2024-01-01 12:00:00"), // == r@12:00 → inclusive → 200.0
      (2L, "2024-01-01 08:00:00")  // no earlier right for key 2 → null
    ).toDF("k", "s").withColumn("lt", col("s").cast("timestamp_ntz")).drop("s")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 100.0),
      (1L, "2024-01-01 12:00:00", 200.0),
      (2L, "2024-01-01 09:00:00", 999.0)
    ).toDF("k", "s", "v").withColumn("rt", col("s").cast("timestamp_ntz")).drop("s")
    val out = AsofJoin.keyedAsof(left, right, "k", "lt", "rt", "v")
      .select("k", "lt", "asof_v").as[(Long, java.time.LocalDateTime, Option[Double])]
      .collect().sortBy(r => (r._1, r._2.toString))
    assert(out(0)._3.contains(100.0))
    assert(out(1)._3.contains(200.0))
    assert(out(2)._3.isEmpty)
  }

  test("nearest with default tolerance: key absent on the right yields null, not a stale buffer") {
    import spark.implicits._
    // repartition(1, k) on BOTH sides pins everything into one merge
    // partition, so key 2 is processed right after key 1 filled the `best`
    // buffer — the exact state where a missing hasBest guard emits key 1's
    // row (or a zeroed UnsafeRow) as a phantom match for keys 2 and 3.
    val left = Seq(
      (1L, "2024-01-01 10:00:00"), // key 1 matches its 09:00 right row
      (2L, "2024-01-01 10:00:00"), // absent on the right, after best filled
      (3L, "2024-01-01 10:00:00")  // absent, at the tail of the partition
    ).toDF("k", "s").withColumn("lt", col("s").cast("timestamp_ntz")).drop("s")
      .repartition(1, col("k"))
    val right = Seq((1L, "2024-01-01 09:00:00", 42.0))
      .toDF("rk", "s", "v").withColumn("rt", col("s").cast("timestamp_ntz")).drop("s")
      .repartition(1, col("rk"))
    val out = graft.plans.NativeAsof
      .asofJoin(left, right, "k", "rk", "lt", "rt", "nearest")
      .select(col("k"), col("v")).as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(42.0), 2L -> None, 3L -> None))
  }
}
