package graft

import graft.operators.{Analytics, LlmScale, TimeSeries}
import org.apache.spark.sql.functions._

/** Runs catalog queries end-to-end on CRAFTED fixture tables (written as
  * parquet into a temp dir shaped like a testdata sfDir) — semantics the
  * synthetic fixtures can't pin down: hand-computable TWA/OHLC values, the
  * stratified sampler's fail-loud small-input guard, TF-IDF's zero-idf
  * edge. `events.ts` is written as a raw ns LONG, matching the post-read
  * shape Tables.events expects (§1.3 recipe). */
class CatalogFixtureSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-fixture"

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def us(sec: Long): Long = sec * 1000000L // epoch seconds → µs
  private def ns(sec: Long): Long = sec * 1000000000L

  test("TWA: value held until next same-day event; single-point days excluded") {
    val day = 1704067200L // 2024-01-01 00:00:00 UTC
    writeEvents(Seq(
      (1L, ns(day), 1L, "click", 10.0),        // [0,100) held at 10
      (2L, ns(day + 100), 1L, "click", 20.0),  // [100,400) held at 20
      (3L, ns(day + 400), 1L, "click", 40.0),  // last point: no segment
      (4L, ns(day), 2L, "view", 99.0),         // single event → no row
      (5L, ns(day + 86400), 1L, "click", 7.0)  // next day, single → no row
    ))
    val out = TimeSeries.qTsTwa(spark, dir)
      .select("user_id", "n_seg", "twa").as[(Long, Long, Double)].collect().toSeq
    // (10·100 + 20·300) / 400 = 17.5
    assert(out == Seq((1L, 2L, 17.5)))
  }

  test("OHLC: open/close by event time, high/low by value, within (hour, type)") {
    val h = 1704067200L
    writeEvents(Seq(
      (1L, ns(h + 10), 1L, "click", 5.0),
      (2L, ns(h + 20), 2L, "click", 9.0),
      (3L, ns(h + 30), 1L, "click", 1.0),
      (4L, ns(h + 40), 1L, "view", 3.0)  // other type: separate bar
    ))
    val bars = TimeSeries.qTsOhlc(spark, dir)
      .select("event_type", "open", "high", "low", "close", "n")
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq
    assert(bars == Seq(("click", 5.0, 9.0, 1.0, 1.0, 3L), ("view", 3.0, 3.0, 3.0, 3.0, 1L)))
  }

  test("stratified sample fails loudly when a stratum can't fill 20 under the prefilter") {
    // ids 1..40: exactly 11 md5 hashes start below '4' — under the 20 needed
    writeEvents((1L to 40L).map(i => (i, ns(1704067200L + i), i, "click", 1.0)))
    val ex = intercept[Exception] {
      Analytics.qSampleStratified(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("stratified sample")),
      s"expected the raise_error guard, got: $ex")
  }

  test("TF-IDF: corpus-wide terms score 0; rarer+repeated terms rank first") {
    Seq((1L, "apple banana banana"), (2L, "apple cherry"))
      .toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmScale.qTextTfidf(spark, dir)
      .select("doc_id", "rn", "term", "tf", "score")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val ln2r = BigDecimal(math.rint(math.log(2.0) * 1e6) / 1e6) // idf rounded to 6dp
    val s1 = (ln2r * 2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = ln2r.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, 1L, "banana", 2L, s1), (1L, 2L, "apple", 1L, 0.0),
      (2L, 1L, "cherry", 1L, s2), (2L, 2L, "apple", 1L, 0.0)))
  }
}
