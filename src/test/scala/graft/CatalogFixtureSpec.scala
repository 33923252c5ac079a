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

  test("gaps: only silences > 60min emitted, per type, incl. across midnight and empty days") {
    val t0 = 1704067200L // 2024-01-01 00:00 UTC
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0),
      (2L, ns(t0 + 1800), 1L, "click", 1.0),        // 30min: no gap
      (3L, ns(t0 + 1800 + 3700), 1L, "click", 1.0), // 3700s > 1h: intra-day gap
      (4L, ns(t0), 1L, "view", 1.0),
      (5L, ns(t0 + 3600), 1L, "view", 1.0),         // exactly 1h: NOT > 60min
      // midnight-crossing gap: day1 23:30 → day2 01:00 (5400s), hits the
      // cross-day edge-stitch path, not the intra-day lag
      (6L, ns(t0 + 84600), 1L, "error", 1.0),
      (7L, ns(t0 + 90000), 1L, "error", 1.0),
      // gap spanning a fully EMPTY day: day2 12:00 → day4 12:00
      (8L, ns(t0 + 86400 + 43200), 1L, "signup", 1.0),
      (9L, ns(t0 + 3 * 86400 + 43200), 1L, "signup", 1.0)
    ))
    val out = TimeSeries.qTsGaps(spark, dir)
      .select("event_type", "gap_s").as[(String, Long)].collect().toSeq
    assert(out == Seq(("click", 3700L), ("error", 5400L), ("signup", 2L * 86400)))
  }

  test("corr_pair: perfectly aligned day → r=1, perfectly opposed day → r=-1") {
    val d1 = 1704067200L; val d2 = d1 + 86400
    def rep(n: Int, ts: Long, ty: String): Seq[(Long, Long, String, Double)] =
      (1 to n).map(i => (ts + i, 1L, ty, 1.0)) // distinct ts within the hour
    val rows = (
      rep(1, d1, "click") ++ rep(1, d1, "view") ++
        rep(2, d1 + 3600, "click") ++ rep(2, d1 + 3600, "view") ++
        rep(3, d1 + 7200, "click") ++ rep(3, d1 + 7200, "view") ++
        rep(2, d2, "click") ++ rep(2, d2 + 3600, "view")
    ).zipWithIndex.map { case ((ts, u, ty, v), i) => (i.toLong, ns(ts), u, ty, v) }
    writeEvents(rows)
    val out = TimeSeries.qTsCorrPair(spark, dir)
      .select("n_hours", "r").as[(Long, Double)].collect().toSeq
    assert(out == Seq((3L, 1.0), (2L, -1.0)))
  }

  test("holt: hand-computed fold; 2-point day returns init; 1-point day drops") {
    val d1 = 1704067200L; val d2 = d1 + 86400; val d3 = d2 + 86400
    writeEvents(Seq(
      (1L, ns(d1), 1L, "click", 10.0),         // day1: [10, 12, 11]
      (2L, ns(d1 + 3600), 1L, "click", 12.0),
      (3L, ns(d1 + 7200), 1L, "click", 11.0),
      (4L, ns(d2), 1L, "click", 10.0),         // day2: [10, 12] → init only
      (5L, ns(d2 + 3600), 1L, "click", 12.0),
      (6L, ns(d3), 1L, "click", 99.0)          // day3: single point → dropped
    ))
    val out = TimeSeries.qTsHolt(spark, dir)
      .select("lvl", "trend", "fc1").as[(Double, Double, Double)].collect().toSeq
    // day1: l=12,b=2; x=11 → l'=0.5·11+0.5·14=12.5, b'=0.3·0.5+0.7·2=1.55
    assert(out == Seq((12.5, 1.55, 14.05), (12.0, 2.0, 14.0)))
  }

  test("contamination: shared 8-gram counted once, short docs dropped, clean doc 0.0") {
    Seq(
      (1L, "a b c d e f g h i j", "src0"),   // eval: 3 distinct 8-grams
      (2L, "too short to shingle", "src0"),  // eval: < 8 words → dropped
      (3L, "p q r s t u v w x y", "src0"),   // eval: clean (no train overlap)
      (4L, "a b c d e f g h x y", "src1"),   // train: shares exactly [a..h]
      (5L, "a b c d e f g h z z", "src2")    // train: shares [a..h] AGAIN (distinct'd)
    ).toDF("doc_id", "text", "source")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmScale.qTextContamination(spark, dir)
      .select("doc_id", "n_ngrams", "n_hit", "ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L, 0.333333), (3L, 3L, 0L, 0.0)))
  }

  test("cluster quality: orthogonal clusters → purity 1 and hand-computed margin; gap labels fail loudly") {
    def writeEmb(rows: Seq[(Long, Seq[Float], Int)]): Unit =
      rows.toDF("vec_id", "embedding", "label")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    writeEmb(Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0), (2L, Seq(0f, 1f, 0f, 0f), 0),
      (3L, Seq(0f, 0f, 1f, 0f), 1), (4L, Seq(0f, 0f, 0f, 1f), 1)))
    val out = LlmScale.qEmbClusterQuality(spark, dir)
      .select("label", "n_vecs", "purity", "avg_margin")
      .as[(Int, Long, Double, Double)].collect().toSeq
    // own = cos(e_i, (0.5, 0.5)-centroid) = 0.5/√0.5 → 0.707107; other = 0
    assert(out == Seq((0, 2L, 1.0, 0.707107), (1, 2L, 1.0, 0.707107)))

    writeEmb(Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 2))) // gap: 0, 2
    val ex = intercept[IllegalArgumentException] {
      LlmScale.qEmbClusterQuality(spark, dir).collect()
    }
    assert(ex.getMessage.contains("contiguous"), s"wrong failure: $ex")
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

  test("documents corpus stays ASCII in the Jaro-Winkler window (oracle-parity precondition)") {
    // ADVICE r11: the native JaroWinkler kernel compares UTF-16 code
    // units while DuckDB's jaro_winkler_similarity is byte-based; the
    // q_text_jaro_pairs gate is sound only while the 32-char prefixes it
    // feeds stay ASCII. Pin that invariant on both fixture SFs so a
    // generator change cannot silently break parity.
    for (sf <- Seq(sf0001, sf001)) {
      // Column#rlike takes the regex verbatim — an expr()-embedded SQL
      // string literal would eat the \x escapes and match garbage
      val nonAscii = Tables.documents(spark, sf)
        .filter(col("text").substr(1, 32).rlike("[^\\x00-\\x7F]"))
        .count()
      assert(nonAscii == 0,
        s"$sf: $nonAscii docs carry non-ASCII in the JW window - " +
          "q_text_jaro_pairs parity no longer holds; see JaroWinkler.scala kernel note")
    }
  }
}
