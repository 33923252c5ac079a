package graft

import graft.operators.Survival

/** Edge semantics of the survival tier (Kaplan–Meier product-limit)
  * via a crafted cohort with a hand-computed KM table: staggered
  * enrollment, mixed deaths/censorings at one time, purchase-before-
  * signup exclusion, enrollment cutoff, and the boundary purchase AT
  * the study end (censored, not an event). */
class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-survival"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeCustomers(rows: Seq[(Long, String)]): Unit =
    rows.map { case (k, seg) => (k, s"Customer#$k", 0, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")

  test("kaplan_meier: staggered censoring, tied deaths, boundary-at-study-end") {
    var id = 0L
    def ev(u: Long, tpe: String, h: Long, extraSec: Long = 0L): (Long, Long, Long, String, Double, String) = {
      id += 1; (id, ns(t0 + h * hour + extraSec), u, tpe, 1.0, "{}")
    }
    writeEvents(Seq(
      // segment A: 4 users signup at h0; deaths at t=10,10,20; u4 censored
      ev(1, "signup", 0), ev(1, "purchase", 10),
      ev(2, "signup", 0), ev(2, "purchase", 10),
      ev(3, "signup", 0), ev(3, "purchase", 20),
      ev(4, "signup", 0), // never purchases -> censored at 144
      // segment B: u5 death at t=5; u6 signs up at h48 but its only
      // purchase is BEFORE the signup hour -> excluded, censored at 96
      ev(5, "signup", 0), ev(5, "purchase", 5),
      ev(6, "purchase", 24), ev(6, "signup", 48),
      // not enrolled: first signup after the study end (2024-01-07)
      ev(7, "signup", 24 * 9), ev(7, "purchase", 24 * 9 + 1),
      // segment C: purchase lands IN the study-end hour -> hour-trunc
      // p0 == study end, NOT < it -> censored at 144, survival stays 1
      ev(8, "signup", 0), ev(8, "purchase", 144, extraSec = 1800)))
    writeCustomers(Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B"), (7L, "B"), (8L, "C")))

    val rows = Survival.qUserKaplanMeier(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toList
    assert(rows == List(
      ("A", 10L, 4L, 2L, 0L, 0.5, 0.5),
      ("A", 20L, 2L, 1L, 0L, 0.5, 0.25),
      ("A", 144L, 1L, 0L, 1L, 0.0, 0.25),
      ("B", 5L, 2L, 1L, 0L, 0.5, 0.5),
      ("B", 96L, 1L, 0L, 1L, 0.0, 0.5),
      ("C", 144L, 1L, 0L, 1L, 0.0, 1.0)))
  }

  test("kaplan_meier: survival is non-increasing and at-risk bookkeeping is exact on a dense cohort") {
    var id = 0L
    val rows = (1L to 40L).flatMap { u =>
      val sUp = (u % 5) * 24 // staggered entry across 5 days
      val death = sUp + u    // varied durations; some cross the study end
      Seq((({ id += 1; id }), ns(t0 + sUp * hour), u, "signup", 1.0, "{}"),
        (({ id += 1; id }), ns(t0 + death * hour), u, "purchase", 1.0, "{}"))
    }
    writeEvents(rows)
    writeCustomers((1L to 40L).map(u => (u, if (u % 2 == 0) "X" else "Y")))
    val km = Survival.qUserKaplanMeier(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    // per segment: survival non-increasing in t, at_risk strictly decreasing
    km.groupBy(_._1).foreach { case (_, g) =>
      val srt = g.sortBy(_._2)
      srt.zip(srt.tail).foreach { case (a, b) =>
        assert(b._7 <= a._7); assert(b._3 == a._3 - a._4 - a._5)
      }
      // at-risk at the first time equals the segment cohort size
      assert(srt.head._3 == g.map(r => r._4 + r._5).sum)
    }
  }

  /** The crafted KM cohort (A: deaths 10,10,20 + censor 144; B: death 5
    * + censor 96; C: censor 144) reused for the other two estimators. */
  private def writeKmCohort(): Unit = {
    var id = 0L
    def ev(u: Long, tpe: String, h: Long, extraSec: Long = 0L): (Long, Long, Long, String, Double, String) = {
      id += 1; (id, ns(t0 + h * hour + extraSec), u, tpe, 1.0, "{}")
    }
    writeEvents(Seq(
      ev(1, "signup", 0), ev(1, "purchase", 10),
      ev(2, "signup", 0), ev(2, "purchase", 10),
      ev(3, "signup", 0), ev(3, "purchase", 20),
      ev(4, "signup", 0),
      ev(5, "signup", 0), ev(5, "purchase", 5),
      ev(6, "purchase", 24), ev(6, "signup", 48),
      ev(8, "signup", 0), ev(8, "purchase", 144, extraSec = 1800)))
    writeCustomers(Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B"), (8L, "C")))
  }

  test("nelson_aalen: hand-computed cumulative hazard and variance; censor-only steps carry the cumulatives") {
    writeKmCohort()
    val rows = Survival.qUserNelsonAalen(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect().toList
    assert(rows == List(
      // H = Σ d/n, Σ d/n²: A: 2/4 then 1/2; B: 1/2; C: never
      ("A", 10L, 4L, 2L, 0L, 0.5, 0.5, 0.125),
      ("A", 20L, 2L, 1L, 0L, 0.5, 1.0, 0.375),
      ("A", 144L, 1L, 0L, 1L, 0.0, 1.0, 0.375),
      ("B", 5L, 2L, 1L, 0L, 0.5, 0.5, 0.25),
      ("B", 96L, 1L, 0L, 1L, 0.0, 0.5, 0.25),
      ("C", 144L, 1L, 0L, 1L, 0.0, 0.0, 0.0)))
  }

  test("logrank: one-vs-rest O/E/V match the hand-worked hypergeometric table; expectations sum to total deaths") {
    writeKmCohort()
    def r6(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5) / 1e6
    def r9(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e9 + 0.5) / 1e9
    // event times 5 (d=1, n=7), 10 (d=2, n=6), 20 (d=1, n=4);
    // ng: A = 4,4,2; B = 2,1,1; C = 1,1,1
    def ev(dall: Long, ng: Long, nall: Long): (Double, Double) = (
      r9(dall.toDouble * ng / nall),
      r9((dall * ng * (nall - ng) * (nall - dall)).toDouble / (nall * nall * (nall - 1)).toDouble))
    val spine = Seq((1L, 7L), (2L, 6L), (1L, 4L))
    def expFor(ngs: Seq[Long], o: Long): (Long, Double, Double, Option[Double], Option[Double]) = {
      val tv = spine.zip(ngs).map { case ((da, na), g) => ev(da, g, na) }
      val e = r6(tv.map(_._1).sum); val v = r6(tv.map(_._2).sum)
      val z = r6((o - e) / math.sqrt(v))
      (o, e, v, Some(z), Some(r6((o - e) * (o - e) / v)))
    }
    val want = List(
      ("A", expFor(Seq(4L, 4L, 2L), 3L)),
      ("B", expFor(Seq(2L, 1L, 1L), 1L)),
      ("C", expFor(Seq(1L, 1L, 1L), 0L)))
    val got = Survival.qUserLogrank(spark, dir)
      .as[(String, Long, Double, Double, Option[Double], Option[Double])].collect().toList
    assert(got == want.map { case (sg, (o, e, v, z, c)) => (sg, o, e, v, z, c) }, s"got $got")
    assert(got.map(_._2).sum == 4L && r6(got.map(_._3).sum) == 4.0)
  }

  test("logrank: a single-segment cohort has zero variance and guards z/chi2 to NULL") {
    var id = 0L
    def ev(u: Long, tpe: String, h: Long): (Long, Long, Long, String, Double, String) = {
      id += 1; (id, ns(t0 + h * hour), u, tpe, 1.0, "{}")
    }
    // everyone is segment A: at every event time n_g = n ⇒ V = 0 exactly
    writeEvents(Seq(
      ev(1, "signup", 0), ev(1, "purchase", 10),
      ev(2, "signup", 0), ev(2, "purchase", 20)))
    writeCustomers(Seq((1L, "A"), (2L, "A")))
    val rows = Survival.qUserLogrank(spark, dir)
      .as[(String, Long, Double, Double, Option[Double], Option[Double])].collect().toList
    assert(rows == List(("A", 2L, 2.0, 0.0, None, None)), s"got $rows")
  }
}
