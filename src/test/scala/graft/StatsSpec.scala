package graft

import graft.operators.Stats

/** Edge semantics of the hypothesis-test tier (Stats) via crafted
  * fixtures with hand-computed closed-form statistics. */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-stats"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC (a Monday)

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  /** c(x) events in hour x across the full 720-h grid, one type. */
  private def series(c: Int => Int): Seq[(Long, Long, Long, String, Double, String)] = {
    var id = 0L
    (0 until 720).flatMap { x =>
      (0 until c(x)).map { _ =>
        id += 1
        (id, ns(t0 + x * hour), 1L, "click", 1.0, "{}")
      }
    }
  }

  test("ljung_box: alternating 0/1 hourly series has the closed-form r_k; constant series guards to NULL") {
    // c(x) = x mod 2 over n=720: sc=ss=360. Odd lags: sxy=0, ak=360,
    // bk=359 ⇒ num = 719·(−sc·n + sc²)·? — evaluated: r1 = −719·129600/93312000
    // = −0.998611…; even lags collapse to r_k = (n−k)/n (first two terms
    // cancel): r2 = 718/720 = 0.997222…
    writeEvents(series(x => x % 2))
    val r = Stats.qStatLjungBox(spark, dir)
      .select("k", "r").as[(Long, Option[Double])].collect().toMap
    assert(r(1L) == Some(-0.998611))
    assert(r(2L) == Some(0.997222))
    assert(r.size == 24)
    // Q is a running sum of nonnegative terms — monotone in k
    val q = Stats.qStatLjungBox(spark, dir).select("k", "q_lb")
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(q.zip(q.tail).forall { case (a, b) => b >= a })

    writeEvents(series(_ => 3)) // zero variance ⇒ den = 0 ⇒ NULL, not NaN
    val flat = Stats.qStatLjungBox(spark, dir)
      .select("r", "q_lb").as[(Option[Double], Option[Double])].collect()
    assert(flat.length == 24 && flat.forall(_ == ((None, None))))
  }

  private def twoSample(clicks: Seq[Double], views: Seq[Double]): Unit = {
    var id = 0L
    writeEvents(
      clicks.map { v => id += 1; (id, ns(t0), 1L, "click", v, "{}") } ++
        views.map { v => id += 1; (id, ns(t0), 1L, "view", v, "{}") })
  }

  test("ks: D and its argmax, ties resolved to the SMALLEST value") {
    // F1 over {1,2,3,4}, F2 over {3,4,5,6}: |F1−F2| peaks at 0.5 at both
    // v=2 and v=4 — the tie must resolve to v=2.
    twoSample(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6))
    val r = Stats.qStatKs(spark, dir)
      .select("ks_d", "at_value", "n1", "n2")
      .as[(Double, Double, Long, Long)].collect().toSeq
    assert(r == Seq((0.5, 2.0, 4L, 4L)))
  }

  test("ks: identical samples give D = 0") {
    twoSample(Seq(1, 2, 3), Seq(1, 2, 3))
    val r = Stats.qStatKs(spark, dir).select("ks_d").as[Double].collect().toSeq
    assert(r == Seq(0.0))
  }

  test("mannwhitney: full separation U and tie-free z; symmetric samples give z = 0") {
    // clicks {1,2,3} all below views {4,5,6}: R1=6 ⇒ U1 = 9+6−6 = 9;
    // z = (U1−μ−0.5)/σ = (9−4.5−0.5)/sqrt(9·7/12) = 4/2.2912878… = 1.745743
    twoSample(Seq(1, 2, 3), Seq(4, 5, 6))
    val r = Stats.qStatMannWhitney(spark, dir)
      .select("u1", "z", "n1", "n2").as[(Double, Double, Long, Long)].collect().toSeq
    assert(r == Seq((9.0, 1.745743, 3L, 3L)))

    twoSample(Seq(1, 2, 3), Seq(1, 2, 3)) // full ties ⇒ U1 = μ ⇒ z = 0 exactly
    val s = Stats.qStatMannWhitney(spark, dir)
      .select("u1", "z").as[(Double, Double)].collect().toSeq
    assert(s == Seq((4.5, 0.0)))
  }

  test("chi2: an exactly independent type×weekday table gives chi2 = 0, V = 0") {
    // Days 0..6 of Jan 2024 cover Mon..Sun once; 2 clicks + 4 views per
    // day ⇒ every cell O = R·C/N exactly.
    var id = 0L
    val rows = (0 until 7).flatMap { day =>
      (0 until 2).map { _ => id += 1; (id, ns(t0 + day * 24 * hour), 1L, "click", 1.0, "{}") } ++
        (0 until 4).map { _ => id += 1; (id, ns(t0 + day * 24 * hour), 1L, "view", 1.0, "{}") }
    }
    writeEvents(rows)
    val r = Stats.qStatChi2(spark, dir)
      .select("chi2", "dof", "cramers_v", "n").as[(Double, Long, Double, Long)].collect().toSeq
    assert(r == Seq((0.0, 6L, 0.0, 42L)))
  }

  test("chi2: a weekday-concentrated type is detected (chi2 > 0) with dof from the type count") {
    // clicks only on Monday, views uniform: dependence ⇒ chi2 > 0.
    var id = 0L
    val rows = (0 until 14).map { _ => id += 1; (id, ns(t0), 1L, "click", 1.0, "{}") } ++
      (0 until 7).flatMap { day =>
        (0 until 2).map { _ => id += 1; (id, ns(t0 + day * 24 * hour), 1L, "view", 1.0, "{}") }
      }
    writeEvents(rows)
    val r = Stats.qStatChi2(spark, dir)
      .select("chi2", "dof").as[(Double, Long)].collect().head
    assert(r._1 > 10.0 && r._2 == 6L)
  }
}
