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

  test("mutual_info: independent uniform cells give mi 0; a deterministic mapping gives nmi 1") {
    val day = 86400L
    // 2 types × {Mon, Tue}, all four cells equal ⇒ o·n = rt·ct exactly
    writeEvents((0 until 40).map { i =>
      (i.toLong + 1, ns(t0 + (i % 2) * day), 1L, if (i < 20) "click" else "view", 1.0, "{}")
    })
    val ind = Stats.qStatMutualInfo(spark, dir)
      .select("mi", "nmi").as[(Double, Option[Double])].collect().head
    assert(ind == ((0.0, Some(0.0))))

    // click only Monday, view only Tuesday ⇒ MI = H = ln 2, NMI = 1
    writeEvents((0 until 40).map { i =>
      val click = i < 20
      (i.toLong + 1, ns(t0 + (if (click) 0L else day)), 1L, if (click) "click" else "view", 1.0, "{}")
    })
    val dep = Stats.qStatMutualInfo(spark, dir)
      .select("mi", "h_row", "nmi").as[(Double, Double, Option[Double])].collect().head
    assert(dep == ((0.693147, 0.693147, Some(1.0))))
  }

  test("seq_entropy: a strictly alternating sequence has zero conditional entropy and unigram gain") {
    writeEvents((0 until 5).map { i =>
      (i.toLong + 1, ns(t0 + i * hour), 1L, if (i % 2 == 0) "a" else "b", 1.0, "{}")
    })
    def r6(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5) / 1e6
    val h1 = r6(-(0.6 * math.log(0.6) + 0.4 * math.log(0.4)))
    val r = Stats.qSeqEntropy(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect().head
    assert(r == ((5L, 4L, h1, 0.0, h1, r6(math.exp(h1)), 1.0)), s"got $r")
  }

  test("bootstrap_ci: constant-valued purchases give a degenerate CI at the constant with zero se") {
    writeEvents((1 to 50).map(i => (i.toLong, ns(t0 + i * hour), 1L, "purchase", 12.34, "{}")))
    val r = Stats.qStatBootstrapCi(spark, dir)
      .select("n", "mean_full", "n_replicates", "boot_mean", "se", "ci_lo", "ci_hi")
      .as[(Long, Double, Long, Double, Double, Double, Double)].collect().head
    assert(r == ((50L, 12.34, 32L, 12.34, 0.0, 12.34, 12.34)), s"got $r")
  }

  /** click spike at hour `ca`, view spike at hour `cb`, zeros elsewhere. */
  private def spikes(ca: Int, cb: Int): Unit = {
    writeEvents(Seq(
      (1L, ns(t0 + ca * hour), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + cb * hour), 1L, "view", 1.0, "{}")))
  }

  test("cross_corr: a shifted spike pair correlates exactly 1 at its lag, tiny negative off-lag") {
    spikes(10, 15)
    val r = Stats.qTsCrossCorr(spark, dir)
      .select("lag", "n", "r").as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r.size == 49)
    // at lag 5 the indicators align: r = (n·1 − 1)/(n − 1) = 1
    assert(r(5L) == ((715L, Some(1.0))))
    // at lag 0: num = 720·0 − 1 = −1, both variances 719 ⇒ −1/719
    assert(r(0L) == ((720L, Some(-0.001391))))
    // negative lag where the view spike precedes: never aligned here
    assert(r(-5L)._2.get < 0.0)
  }

  test("cross_corr: a constant (zero-variance) side guards to NULL, not NaN") {
    var id = 0L
    val rows = Seq({ id += 1; (id, ns(t0 + 10 * hour), 1L, "click", 1.0, "{}") }) ++
      (0 until 720).map { x => id += 1; (id, ns(t0 + x * hour), 1L, "view", 1.0, "{}") }
    writeEvents(rows)
    val r = Stats.qTsCrossCorr(spark, dir)
      .select("r").as[Option[Double]].collect()
    assert(r.length == 49 && r.forall(_.isEmpty))
  }

  test("ar2_fit: alternating series recovers the closed-form Yule-Walker pair; constant guards NULL") {
    writeEvents(series(x => x % 2))
    val row = Stats.qTsAr2Fit(spark, dir)
      .as[(String, Option[Double], Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head
    // r1/r2 are the Ljung-Box closed forms for c = x mod 2 (see above)
    val (r1, r2) = (-0.998611, 0.997222)
    def r6(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5) / 1e6
    val phi1 = r6(r1 * (1.0 - r2) / (1.0 - r1 * r1))
    val phi2 = r6((r2 - r1 * r1) / (1.0 - r1 * r1))
    assert(row == (("click", Some(r1), Some(r2), Some(phi1), Some(phi2),
      Some(r6(1.0 - phi1 * r1 - phi2 * r2)))))
    // an AR(1)-shaped pair r2 ≈ r1² must give phi2 ≈ 0: verified by the
    // identity directly on the recovered coefficients
    assert(math.abs(phi2 - (r2 - r1 * r1) / (1.0 - r1 * r1)) < 1e-6)

    writeEvents(series(_ => 3))
    val flat = Stats.qTsAr2Fit(spark, dir)
      .as[(String, Option[Double], Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(flat == (("click", None, None, None, None, None)))
  }
}
