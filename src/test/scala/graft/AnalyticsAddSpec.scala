package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions.lit

/** Edge semantics of the round-9 relational/business-analytics additions:
  * deterministic mode tie-break, ordered string aggregation, nearest-rank
  * discrete percentiles, inclusive ABC class boundaries, directional
  * association rules, exact-integer Gini. */
class AnalyticsAddSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-anadd"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  test("mode: equal counts break the tie to the lexicographically first type") {
    Seq(
      (1L, ns(t0), 7L, "view", 1.0, "{}"),
      (2L, ns(t0), 7L, "click", 1.0, "{}"),   // click == view == 2 ⇒ click wins
      (3L, ns(t0), 7L, "view", 1.0, "{}"),
      (4L, ns(t0), 7L, "click", 1.0, "{}"),
      (5L, ns(t0), 8L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = Analytics.qAggMode(spark, dir)
      .select("user_id", "mode_type", "n").as[(Long, String, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(7L) == (("click", 2L)))
    assert(m(8L) == (("error", 1L)))
  }

  test("string_agg: output order is the sort order, not the (shuffled) input order") {
    Seq((3L, "zeta", 0L), (1L, "alpha", 0L), (2L, "mid", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((0L, "r0")).toDF("r_regionkey", "r_name")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    val r = Analytics.qStringAgg(spark, dir)
      .select("r_name", "n_nations", "nations").as[(String, Long, String)].collect().toSeq
    assert(r == Seq(("r0", 3L, "alpha,mid,zeta")))
  }

  test("abc pareto: the exactly-80% customer is still class A (inclusive boundary, integer test)") {
    // revenues 80, 15, 5 ⇒ cum shares 0.80 (A — 5*8000 == 4*10000), 0.95 (B), 1.0 (C)
    Seq((1L, 10L, 80.0), (2L, 20L, 15.0), (3L, 30L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderpriority", lit("P1"))
      .repartition(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Analytics.qAbcPareto(spark, dir)
      .select("cls", "n_cust", "revenue").as[(String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r == Map("A" -> ((1L, 80.0)), "B" -> ((1L, 15.0)), "C" -> ((1L, 5.0))))
  }

  test("assoc rules: confidence is directional, lift is symmetric") {
    // u1 {click, view}, u2 {click}: click→view conf 1/2, view→click conf 1;
    // lift both directions = 1*2/(2*1) = 1.0
    Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0), 1L, "view", 1.0, "{}"),
      (3L, ns(t0), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.qAssocRules(spark, dir)
      .select("ante", "cons", "confidence", "lift")
      .as[(String, String, Double, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(r(("click", "view")) == ((0.5, 1.0)))
    assert(r(("view", "click")) == ((1.0, 1.0)))
  }

  test("gini: uniform activity scores 0; a skewed split scores its exact closed form") {
    // click: users 1,2 with 2 events each ⇒ G = 0
    // error: counts 1,1,6 across users 1,2,3 ⇒
    //   G = (2*(1*1+2*1+3*6) - 4*8)/(3*8) = 10/24 = 0.416667
    val clicks = Seq(
      (10L, 1L), (11L, 1L), (12L, 2L), (13L, 2L)).map { case (id, u) =>
      (id, ns(t0), u, "click", 1.0, "{}") }
    val errs = (0 until 6).map(i => (20L + i, ns(t0), 3L, "error", 1.0, "{}")) ++
      Seq((30L, ns(t0), 1L, "error", 1.0, "{}"), (31L, ns(t0), 2L, "error", 1.0, "{}"))
    (clicks ++ errs)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val g = Analytics.qTsGini(spark, dir)
      .select("event_type", "gini").as[(String, Double)].collect().toMap
    assert(g("click") == 0.0)
    assert(g("error") == 0.416667, s"got $g")
  }

  test("percentile_disc: nearest-rank picks actual values (n=4: ranks 1,2,3)") {
    // sorted prices 10,20,30,40 ⇒ ceil(.25*4)=1 → 10, ceil(.5*4)=2 → 20,
    // ceil(.75*4)=3 → 30 (nearest-rank, never interpolated)
    Seq((1L, "P1", 20.0), (2L, "P1", 40.0), (3L, "P1", 10.0), (4L, "P1", 30.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Analytics.qPercentileDisc(spark, dir)
      .select("n", "p25", "p50", "p75").as[(Long, Double, Double, Double)].collect().toSeq
    assert(r == Seq((4L, 10.0, 20.0, 30.0)))
  }

  test("item_cooc: hand-worked cosine table; equal-cosine ties break by cooc then neighbor id") {
    // baskets {10,20,30}, {10,20}, {10,40} (plus a duplicate line that
    // the presence-distinct must collapse): c10=3 c20=2 c30=1 c40=1
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 40L))
      .toDF("l_orderkey", "l_partkey")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Analytics.qItemCoocTopk(spark, dir)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val c26 = r6(2.0 / math.sqrt(6.0)); val c3 = r6(1.0 / math.sqrt(3.0)); val c2 = r6(1.0 / math.sqrt(2.0))
    assert(r == Seq(
      (10L, 20L, 2L, c26, 1L), (10L, 30L, 1L, c3, 2L), (10L, 40L, 1L, c3, 3L),
      (20L, 10L, 2L, c26, 1L), (20L, 30L, 1L, c2, 2L),
      (30L, 20L, 1L, c2, 1L), (30L, 10L, 1L, c3, 2L),
      (40L, 10L, 1L, c3, 1L)), s"got $r")
  }
}
