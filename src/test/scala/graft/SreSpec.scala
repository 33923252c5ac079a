package graft

import graft.operators.Sre

/** Edge semantics of the SRE tier via crafted events fixtures (raw ns
  * LONG ts per §1.3). */
class SreSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-sre"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  // ---- apdex --------------------------------------------------------------

  test("apdex: boundary values 50 and 200 are satisfied and tolerating respectively") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 50.0, "{}"),   // exactly T ⇒ satisfied
      (2L, ns(t0), 1L, "click", 50.01, "{}"),  // just over T ⇒ tolerating
      (3L, ns(t0), 1L, "click", 200.0, "{}"),  // exactly 4T ⇒ tolerating
      (4L, ns(t0), 1L, "click", 200.01, "{}"))) // over 4T ⇒ frustrated
    val r = Sre.qTsApdex(spark, dir)
      .select("n", "n_sat", "n_tol", "apdex")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // (1 + 2*0.5) / 4 = 0.5
    assert(r == Seq((4L, 1L, 2L, 0.5)))
  }

  // ---- bollinger ----------------------------------------------------------

  test("bollinger: constant rate has zero-width bands and no breach; a spike breaches +1") {
    // one event every hour for 30 hours, plus 10 extra in hour 28
    val steady = (0 until 30).map(h => (h.toLong, ns(t0 + h * hour), 1L, "click", 1.0, "{}"))
    val burst = (0 until 10).map(i => (100L + i, ns(t0 + 28 * hour + 60), 1L, "click", 1.0, "{}"))
    writeEvents(steady ++ burst)
    val rows = Sre.qTsBollinger(spark, dir)
      .filter($"x" > 0)
      .select("h", "x", "ma", "sd", "breach")
      .as[(java.sql.Timestamp, Long, Double, Double, Long)].collect()
      .map(r => (r._1.toInstant.getEpochSecond, r._2, r._3, r._4, r._5)).toSeq
    val calm = rows.filter(_._1 == t0 + 27 * hour)
    // hours 23..27 all-ones frame: ma=1, sd=0, x=1 ⇒ no breach
    assert(calm == Seq((t0 + 27 * hour, 1L, 1.0, 0.0, 0L)), s"calm hour wrong: $calm")
    val spike = rows.filter(_._1 == t0 + 28 * hour).head
    assert(spike._2 == 11L && spike._5 == 1L, s"burst hour must breach above: $spike")
  }

  // ---- spike ratio --------------------------------------------------------

  test("spike ratio: flag fires exactly at 2x the 7-day same-hour baseline") {
    // hour 12 of each day: 3 events on days 0..6 (baseline 3), then 6 on
    // day 7 (ratio exactly 2.0 ⇒ spike) and 5 on day 8 (ratio < 2)
    val base = for (day <- 0 until 7; i <- 0 until 3)
      yield (day * 10L + i, ns(t0 + day * 86400 + 12 * hour), 1L, "click", 1.0, "{}")
    val d7 = (0 until 6).map(i => (700L + i, ns(t0 + 7 * 86400 + 12 * hour), 1L, "click", 1.0, "{}"))
    val d8 = (0 until 5).map(i => (800L + i, ns(t0 + 8 * 86400 + 12 * hour), 1L, "click", 1.0, "{}"))
    writeEvents(base ++ d7 ++ d8)
    val r = Sre.qTsSpikeRatio(spark, dir)
      .filter($"hod" === 12 && $"x" > 0)
      .select("dday", "x", "ratio", "spike")
      .as[(java.sql.Date, Long, Double, Long)].collect()
      .map(t => (t._1.toString, t._2, t._3, t._4)).toSeq.sortBy(_._1)
    // day 9's baseline window (Jan 2..8) contains the day-8 spike:
    // s = 6*3 + 6 = 24 ⇒ ratio = 5*7/24 = 1.4583
    assert(r == Seq(
      ("2024-01-08", 6L, 2.0, 1L),
      ("2024-01-09", 5L, 1.4583, 0L)), s"got $r")
  }

  // ---- winsorize ----------------------------------------------------------

  test("winsorize: clamp moves the mean toward the median and tallies clips") {
    // 18 values of 10.0 plus outliers 0.01 and 1000.0 (n=20 ⇒ p05/p95
    // interpolate inside the flat middle)
    val mids = (0 until 18).map(i => (i.toLong, ns(t0 + i), 1L, "click", 10.0, "{}"))
    writeEvents(mids ++ Seq(
      (100L, ns(t0 + 100), 1L, "click", 0.01, "{}"),
      (101L, ns(t0 + 101), 1L, "click", 1000.0, "{}")))
    val r = Sre.qTsWinsorize(spark, dir)
      .select("n", "n_lo", "n_hi", "mean_raw", "mean_wins")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(r._1 == 20L && r._2 == 1L && r._3 == 1L)
    // p05 = 0.01 + 0.95*(10-0.01) = 9.5005, p95 = 10 + 0.05*990 = 59.5
    // ⇒ mean_wins = (18*10 + 9.5005 + 59.5)/20 = 12.450025 ≪ raw 59.0005
    assert(r._5 < r._4, s"winsorized mean must drop below raw with a high outlier: $r")
    assert(r._4 == 59.0005 && r._5 == 12.450025, s"got $r")
  }

  // ---- token bucket -------------------------------------------------------

  test("rate limit: burst drains the 2-token bucket, the 2-hour refill re-admits") {
    // e1, e2 spend the full bucket; e3 one second later is rejected;
    // e4 exactly one refill period after e3 is admitted again
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + 1), 1L, "click", 1.0, "{}"),
      (3L, ns(t0 + 2), 1L, "click", 1.0, "{}"),
      (4L, ns(t0 + 2 + 7200), 1L, "click", 1.0, "{}")))
    val r = Sre.qTsRateLimit(spark, dir)
      .select("n_events", "n_admitted", "n_rejected")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((4L, 3L, 1L)), s"got $r")
  }

  // ---- local-timezone rollup ----------------------------------------------

  test("local day: 03:00 UTC in January lands on the PREVIOUS New York day (EST -5)") {
    import graft.operators.TimeSeries
    writeEvents(Seq(
      (1L, ns(t0 + 14 * 86400 + 3 * 3600), 1L, "click", 1.0, "{}"),  // Jan 15 03:00 UTC
      (2L, ns(t0 + 14 * 86400 + 6 * 3600), 1L, "click", 1.0, "{}"))) // Jan 15 06:00 UTC
    val r = TimeSeries.qTsLocalDay(spark, dir)
      .select("nyday", "cnt").collect()
      .map(row => row.getDate(0).toString -> row.getLong(1)).toMap
    assert(r == Map("2024-01-14" -> 1L, "2024-01-15" -> 1L), s"got $r")
  }

  // ---- exclusion funnel ---------------------------------------------------

  test("exclusion funnel: only errors INSIDE the conversion interval taint") {
    import graft.operators.TimeSeries
    writeEvents(Seq(
      // user 1: clean conversion
      (1L, ns(t0), 1L, "signup", 1.0, "{}"),
      (2L, ns(t0 + 100), 1L, "purchase", 1.0, "{}"),
      // user 2: error between signup and purchase ⇒ tainted
      (3L, ns(t0), 2L, "signup", 1.0, "{}"),
      (4L, ns(t0 + 50), 2L, "error", 1.0, "{}"),
      (5L, ns(t0 + 100), 2L, "purchase", 1.0, "{}"),
      // user 3: never converts
      (6L, ns(t0), 3L, "signup", 1.0, "{}"),
      // user 4: error AFTER the first purchase — conversion stays clean
      (7L, ns(t0), 4L, "signup", 1.0, "{}"),
      (8L, ns(t0 + 100), 4L, "purchase", 1.0, "{}"),
      (9L, ns(t0 + 200), 4L, "error", 1.0, "{}")))
    val r = TimeSeries.qTsFunnelExclusion(spark, dir)
      .select("n_signup", "n_converted", "n_tainted", "n_clean", "clean_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq((4L, 3L, 1L, 2L, 0.5)), s"got $r")
  }

  // ---- capped sessions ----------------------------------------------------

  test("capped sessions: exactly-2h stays one session, the next event splits; 31-min gap splits") {
    import graft.operators.TimeSeries
    // user 1: events every 20 min, 0..180 — duration reaches exactly 120 min
    // at event 7 (inclusive boundary holds), event at 140 min opens session 2
    val u1 = (0 to 9).map(i =>
      (i.toLong, ns(t0 + i * 20 * 60), 1L, "click", 1.0, "{}"))
    // user 2: gap rule alone — 31 min apart ⇒ two singleton sessions
    val u2 = Seq(
      (100L, ns(t0), 2L, "click", 1.0, "{}"),
      (101L, ns(t0 + 31 * 60), 2L, "click", 1.0, "{}"))
    writeEvents(u1 ++ u2)
    val r = TimeSeries.qTsSessionCapped(spark, dir)
      .select("user_id", "n_events", "dur_s").as[(Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, -t._2))
    assert(r == Seq(
      (1L, 7L, 7200L),  // 0..120 min inclusive
      (1L, 3L, 2400L),  // 140, 160, 180
      (2L, 1L, 0L), (2L, 1L, 0L)), s"got $r")
  }

  // ---- benford ------------------------------------------------------------

  test("benford: first significant digit comes from cents (0.03 -> 3, 12.31 -> 1)") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 0.03, "{}"),   // cents 3 ⇒ digit 3
      (2L, ns(t0), 1L, "click", 12.31, "{}"),  // cents 1231 ⇒ digit 1
      (3L, ns(t0), 1L, "click", 0.97, "{}"),   // cents 97 ⇒ digit 9
      (4L, ns(t0), 1L, "click", 100.00, "{}"))) // cents 10000 ⇒ digit 1
    val r = Sre.qTsBenford(spark, dir)
      .select("digit", "n").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 3L -> 1L, 9L -> 1L), s"got $r")
  }

  // ---- burn alert ------------------------------------------------------------

  test("burn_alert: only the hour where BOTH windows burn pages; steady 10% error rate never does") {
    // 100 events/hour, 10 errors (burn_1h = 5); hour 50 has 40 errors:
    // burn_1h = 20 > 14.4 and burn_6h = 50·90/600 = 7.5 > 6 ⇒ page
    var id = 0L
    val rows = (0 until 720).flatMap { x =>
      val nerr = if (x == 50) 40 else 10
      (0 until 100).map { i =>
        id += 1
        (id, ns(t0 + x * hour), 1L, if (i < nerr) "error" else "click", 1.0, "{}")
      }
    }
    writeEvents(rows)
    val r = Sre.qSreBurnAlert(spark, dir)
      .as[(java.time.LocalDateTime, Double, Double, Boolean)].collect().toSeq
    assert(r.length == 715) // hours 5..719 have full 6h windows
    val paged = r.filter(_._4)
    assert(paged.map(_._1) == Seq(java.time.LocalDateTime.of(2024, 1, 3, 2, 0))) // hour 50
    assert(paged.head._2 == 20.0 && paged.head._3 == 7.5)
    assert(r.filterNot(_._4).forall(x => x._2 == 5.0 || x._2 == 20.0 || x._3 <= 6.0))
  }

  // ---- root cause ----------------------------------------------------------

  test("root_cause: the grown value explains the whole delta with the JS surprise; an empty week guards surprise") {
    // week 1: 10 clicks + 10 views; week 2: 30 clicks + 10 views — click
    // explains ALL of ΔA = 20 (ep 1), view none (ep 0)
    def burst(n: Int, et: String, daySec: Long, hr: Int, base: Long) =
      (1 to n).map(i => (base + i, ns(t0 + daySec + hr * hour), 1L, et, 1.0, "{}"))
    writeEvents(
      burst(10, "click", 0L, 0, 0L) ++ burst(10, "view", 86400L, 1, 100L) ++
        burst(30, "click", 7L * 86400L, 0, 200L) ++ burst(10, "view", 8L * 86400L, 1, 300L))
    val r = Sre.qSreRootCause(spark, dir)
      .as[(String, String, Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(r.length == 6) // 2 values × {event_type, hod, dow}
    val et = r.filter(_._1 == "event_type").map(x => x._2 -> x).toMap
    def r6(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5) / 1e6
    def js(p: Double, q: Double): Double =
      r6(0.5 * (p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))))
    assert(et("click") == (("event_type", "click", 10L, 30L, Some(1.0), Some(js(0.5, 0.75)))))
    assert(et("view") == (("event_type", "view", 10L, 10L, Some(0.0), Some(js(0.5, 0.25)))))
    // hod and dow fan-outs carry the same split (clicks at hod 0/Monday)
    assert(r.filter(_._1 == "hod").map(_._2).sorted == Seq("0", "1"))
    assert(r.filter(_._1 == "dow").map(_._2).sorted == Seq("0", "1"))

    // week 2 empty: ep still defined ((0−F_v)/(0−F)), surprise guarded NULL
    writeEvents(burst(10, "click", 0L, 0, 0L) ++ burst(10, "view", 86400L, 1, 100L))
    val empty = Sre.qSreRootCause(spark, dir)
      .as[(String, String, Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(empty.forall(x => x._6.isEmpty && x._5.contains(0.5)), s"got $empty")
  }
}
