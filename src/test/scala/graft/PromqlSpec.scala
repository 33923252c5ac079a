package graft

import graft.operators.Promql

/** Edge semantics of the PromQL-completeness tier (Promql.scala), via
  * crafted fixture tables in the sfDir shape (events.ts as raw ns LONG
  * per §1.3). */
class PromqlSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-promql"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("count_values: bucket edges — 49.99 lands in 0, 50.0 opens 50") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 49.99, "{}"),
      (2L, ns(t0), 1L, "click", 50.0, "{}"),
      (3L, ns(t0), 1L, "click", 100.0, "{}"),
      (4L, ns(t0), 1L, "click", 0.0, "{}")))
    val out = Promql.qTsCountValues(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("click", 0L, 2L), ("click", 50L, 1L), ("click", 100L, 1L)), s"got $out")
  }

  test("subquery: trailing-6h max is a RANGE frame — an hour gap >5 breaks the lookback") {
    def burst(h: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i, ns(t0 + h * hour), 1L, "click", 1.0, "{}"))
    // hours 0,1,2 with 36,72,36 events; hour 10 with 36 — outside any
    // 6h window of the first three, so its max6 must NOT see the 72.
    writeEvents(burst(0, 36, 0L) ++ burst(1, 72, 100L) ++ burst(2, 36, 200L) ++ burst(10, 36, 300L))
    val out = Promql.qTsSubquery(spark, dir)
      .select("rate", "max6", "n6").as[(Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0.01, 0.01, 1L),  // h0
      (0.02, 0.02, 2L),  // h1
      (0.01, 0.02, 3L),  // h2: trailing max picks up h1's 0.02
      (0.01, 0.01, 1L)), // h10: beyond the 6h range — window holds only itself
      s"got $out")
  }

  test("slo_burn: an all-error hour pages AND tickets; a clean stream stays silent") {
    writeEvents((0 until 10).map(i => (i.toLong, ns(t0 + i * 60), 1L, "error", 1.0, "{}")))
    val fired = Promql.qTsSloBurn(spark, dir)
      .select("page", "ticket").as[(Long, Long)].collect().toSeq
    assert(fired == Seq((1L, 1L)), s"100% error ratio must raise both alerts: $fired")
    writeEvents((0 until 10).map(i => (i.toLong, ns(t0 + i * 60), 1L, "click", 1.0, "{}")))
    assert(Promql.qTsSloBurn(spark, dir).count() == 0, "zero errors must never alert")
  }

  test("idelta: last two samples by (ts, event_id); single-sample days emit nothing") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 10.0, "{}"),
      (2L, ns(t0 + 60), 1L, "click", 20.0, "{}"),
      (3L, ns(t0 + 120), 1L, "click", 35.0, "{}"),
      (4L, ns(t0 + 86400L), 1L, "view", 5.0, "{}"))) // lone sample: no idelta
    val out = Promql.qTsIdelta(spark, dir)
      .select("event_type", "idelta").as[(String, Double)].collect().toSeq
    assert(out == Seq(("click", 15.0)), s"got $out")
  }

  test("vector_and: only hours with errors above AND purchases below their means survive") {
    def ev(id: Long, h: Int, t: String) = (id, ns(t0 + h * hour), 1L, t, 1.0, "{}")
    writeEvents(
      (0 until 10).map(i => ev(i.toLong, 0, "error")) ++           // h0: 10 errors, 0 purchases
        (10 until 20).map(i => ev(i.toLong, 1, "purchase")) ++     // h1: 0 errors — fails lhs
        Seq(ev(20L, 2, "error"), ev(21L, 2, "purchase")))          // h2: 1 error — below mean
    val out = Promql.qTsVectorAnd(spark, dir)
      .select("errors", "purchases").as[(Long, Long)].collect().toSeq
    assert(out == Seq((10L, 0L)), s"got $out")
  }
}
