package graft

import graft.operators.Analytics

/** Edge semantics of the round-9 relational additions: deterministic
  * mode tie-break, ordered string aggregation, nearest-rank discrete
  * percentiles. */
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
}
