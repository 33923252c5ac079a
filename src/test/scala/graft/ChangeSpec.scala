package graft

import graft.operators.Change

/** Edge semantics of the change-detection tier (Change) via crafted
  * step/periodic fixtures (raw ns LONG ts per §1.3). */
class ChangeSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-change"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

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

  /** 5/hour for 15 days, then 15/hour — a clean mean step at x=360. */
  private def step(x: Int): Int = if (x < 360) 5 else 15

  test("changepoint: clean step at hour 360 is found exactly, with the segment means and SSE drop") {
    writeEvents(series(step))
    val r = Change.qTsChangepoint(spark, dir)
      .select("event_type", "split_h", "mean_before", "mean_after", "sse_drop")
      .as[(String, java.time.LocalDateTime, Double, Double, Double)].collect().toSeq
    // S = 360·5 + 360·15 = 7200; gain(360) = 1800²/360 + 5400²/360 = 90000;
    // S²/N = 7200²/720 = 72000 ⇒ sse_drop = 18000.
    assert(r == Seq(("click", java.time.LocalDateTime.of(2024, 1, 16, 0, 0), 5.0, 15.0, 18000.0)))
  }

  test("level_shift: rank-1 peak sits ON the step with the exact window means; all other peaks are flat") {
    writeEvents(series(step))
    val r = Change.qTsLevelShift(spark, dir)
      .select("rank", "h", "mean_before", "mean_after", "shift")
      .as[(Long, java.time.LocalDateTime, Double, Double, Double)].collect().toSeq
    val top = r.find(_._1 == 1L).get
    assert(top == ((1L, java.time.LocalDateTime.of(2024, 1, 16, 0, 0), 5.0, 15.0, 10.0)))
    assert(r.filter(_._1 != 1L).forall(_._5 == 0.0)) // no other genuine shift
  }

  test("page_hinkley: constant series never alarms (ph stays 0); a step alarms within a day of the step") {
    writeEvents(series(_ => 5))
    val flat = Change.qTsPageHinkley(spark, dir)
      .select("n_alarms", "max_ph").as[(Long, Double)].collect().toSeq
    assert(flat == Seq((0L, 0.0))) // term is exactly −δ ⇒ m is its own running min

    writeEvents(series(step))
    val (nAlarms, firstH) = Change.qTsPageHinkley(spark, dir)
      .select("n_alarms", "first_alarm_h")
      .as[(Long, java.time.LocalDateTime)].collect().head
    assert(nAlarms > 0L)
    val stepH = java.time.LocalDateTime.of(2024, 1, 16, 0, 0)
    assert(!firstH.isBefore(stepH) && firstH.isBefore(stepH.plusHours(24)))
  }

  test("backtest: daily-periodic series is perfect at both seasons (skill NULL); weekly-periodic is perfect only at 168 (skill 1)") {
    writeEvents(series(x => x % 24))
    val daily = Change.qTsBacktest(spark, dir)
      .select("mae_weekly", "mae_daily", "skill")
      .as[(Double, Double, Option[Double])].collect().head
    assert(daily._1 == 0.0 && daily._2 == 0.0 && daily._3.isEmpty)

    writeEvents(series(x => (x / 24) % 7))
    val weekly = Change.qTsBacktest(spark, dir)
      .select("mae_weekly", "mae_daily", "skill")
      .as[(Double, Double, Option[Double])].collect().head
    assert(weekly._1 == 0.0 && weekly._2 > 0.0 && weekly._3.contains(1.0))
  }

  test("burst: hysteresis keeps the episode open through between-threshold hours, closes below the mean") {
    // baseline 5, spike 30 at h100, then 7 (lo < 7 < hi) through h105:
    // S = 714·5 + 30 + 5·7 = 3635, mean ≈ 5.049, hi = 1.5·mean ≈ 7.57.
    // 30 enters; 7 marks 0 so the state HOLDS; 5 (< mean) exits ⇒ one
    // episode h100..h105, peak 30, total 30 + 5·7 = 65.
    writeEvents(series(x => if (x == 100) 30 else if (x >= 101 && x <= 105) 7 else 5))
    val r = Change.qTsBurst(spark, dir)
      .select("event_type", "start_h", "end_h", "n_hours", "peak", "total")
      .as[(String, java.time.LocalDateTime, java.time.LocalDateTime, Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq(("click",
      java.time.LocalDateTime.of(2024, 1, 5, 4, 0),
      java.time.LocalDateTime.of(2024, 1, 5, 9, 0), 6L, 30L, 65L)))
  }

  test("burst: separated spikes split into distinct episodes; a 2-level step never bursts") {
    // two isolated spikes with below-mean gaps ⇒ exactly two 1-hour episodes
    writeEvents(series(x => if (x == 100 || x == 200) 30 else 5))
    val r = Change.qTsBurst(spark, dir)
      .select("start_h", "n_hours", "peak", "total")
      .as[(java.time.LocalDateTime, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (java.time.LocalDateTime.of(2024, 1, 5, 4, 0), 1L, 30L, 30L),
      (java.time.LocalDateTime.of(2024, 1, 9, 8, 0), 1L, 30L, 30L)))

    // the 5→15 step: mean = 10, hi = 15, and 15 is NOT > 15 ⇒ no episode
    writeEvents(series(step))
    assert(Change.qTsBurst(spark, dir).count() == 0L)
  }
}
