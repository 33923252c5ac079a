package graft

import graft.operators.{Graphs, Retrieval, Signal}

/** Edge semantics of the signal-analysis, graph and retrieval-eval tiers,
  * via crafted fixture tables in the sfDir shape (events.ts as raw ns
  * LONG per §1.3; embeddings as float arrays). */
class SignalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-signal"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  // ---- cross-correlation --------------------------------------------------

  test("xcorr: a series equal to the other shifted by 2h has r = 1.0 exactly at lag 2") {
    // click counts 1,2,3,1,2,3,... at hours 0..11; views identical at h+2.
    // On the gapless grid views ALSO match clicks' zero hours (both zero
    // after the active window), so the lag-2 pairing is (x, x) everywhere.
    val clicks = (0 until 12).flatMap { h =>
      (0 until (h % 3 + 1)).map(i => (h * 100L + i, ns(t0 + h * hour), 1L, "click", 1.0, "{}"))
    }
    val views = (0 until 12).flatMap { h =>
      (0 until (h % 3 + 1)).map(i => (9000L + h * 100L + i, ns(t0 + (h + 2) * hour), 1L, "view", 1.0, "{}"))
    }
    writeEvents(clicks ++ views)
    val out = Signal.qTsXcorrLag(spark, dir)
      .select("lg", "r").as[(Long, Double)].collect().toMap
    assert(out(2L) == 1.0, s"shifted copy must correlate perfectly at its lag: $out")
    assert(out(0L) < 1.0, s"unshifted pairing must not be perfect: $out")
  }

  // ---- M4 -----------------------------------------------------------------

  test("m4: open/close tie-break on equal timestamps goes to the lower event_id") {
    writeEvents(Seq(
      (2L, ns(t0), 1L, "click", 20.0, "{}"),  // same ts as event 1
      (1L, ns(t0), 1L, "click", 10.0, "{}"),  // lower id wins vopen
      (3L, ns(t0 + hour), 1L, "click", 5.0, "{}"),
      (5L, ns(t0 + 2 * hour), 1L, "click", 40.0, "{}"),
      (4L, ns(t0 + 2 * hour), 1L, "click", 30.0, "{}"))) // 5 > 4 ⇒ vclose = 40
    val row = Signal.qTsM4(spark, dir)
      .select("n", "vmin", "vmax", "vopen", "vclose")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(row == Seq((5L, 5.0, 40.0, 10.0, 40.0)))
  }

  // ---- exponential decay --------------------------------------------------

  test("decay scores are exact dyadic sums: events at day offsets 1,2,3 score 7/8") {
    // reference end is 2024-01-31 00:00; place events at 1, 2, 3 whole
    // days before it (d = 1, 2, 3 ⇒ 1/2 + 1/4 + 1/8)
    val end = t0 + 30 * 86400L
    writeEvents(Seq(
      (1L, ns(end - 86400L), 7L, "click", 1.0, "{}"),
      (2L, ns(end - 2 * 86400L), 7L, "click", 1.0, "{}"),
      (3L, ns(end - 3 * 86400L), 7L, "click", 1.0, "{}")))
    val out = Signal.qTsDecayTopk(spark, dir)
      .select("user_id", "n_events", "score").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((7L, 3L, 0.875)))
  }

  // ---- Holt-Winters -------------------------------------------------------

  test("holt-winters: a purely seasonal series deseasonalizes to zero level and trend") {
    // one event per hour, value a function of hour-of-day only — the
    // seasonal index absorbs everything; fc1 = the midnight index
    val rows = (0 until 30 * 24).map { i =>
      (i.toLong, ns(t0 + i * hour), 1L, "click", 100.0 + (i % 24) * 10.0, "{}")
    }
    writeEvents(rows)
    val out = Signal.qTsHoltWinters(spark, dir)
      .select("lvl", "trend", "fc1").as[(Double, Double, Double)].collect().toSeq
    assert(out == Seq((0.0, 0.0, 100.0)), s"got $out")
  }

  // ---- VWAP ---------------------------------------------------------------

  test("vwap weighs values by the JSON k: (10*1 + 20*3) / 4 = 17.5") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 10.0, """{"k": 1}"""),
      (2L, ns(t0 + 60), 1L, "click", 20.0, """{"k": 3}""")))
    val out = Signal.qTsVwap(spark, dir)
      .select("n", "vol", "vwap").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((2L, 4L, 17.5)))
  }

  // ---- interval merge -----------------------------------------------------

  test("interval merge: overlap chains, touching endpoints start a new island") {
    // ±30 min windows around high-value events: 10:00 and 10:30 overlap
    // (chain into [09:30, 11:00]); 11:30's window starts AT 11:00 —
    // touching, not overlapping ⇒ separate island
    writeEvents(Seq(
      (1L, ns(t0 + 10 * hour), 1L, "click", 200.0, "{}"),
      (2L, ns(t0 + 10 * hour + 1800), 1L, "click", 200.0, "{}"),
      (3L, ns(t0 + 11 * hour + 1800), 1L, "click", 200.0, "{}"),
      (4L, ns(t0), 1L, "click", 1.0, "{}"))) // below threshold: no interval
    val out = Signal.qTsIntervalMerge(spark, dir)
      .select("gid", "n_events", "dur_s").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 5400L), (2L, 1L, 3600L)), s"got $out")
  }

  test("interval overlap join reports floor-second overlap per (session, window)") {
    // user 1 session 10:00–11:00 (20-min steps); error impact window
    // around 10:30 ⇒ [10:00, 11:00] ⇒ full-session overlap 3600 s
    writeEvents(Seq(
      (1L, ns(t0 + 10 * hour), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + 10 * hour + 1200), 1L, "click", 1.0, "{}"),
      (3L, ns(t0 + 10 * hour + 2400), 1L, "click", 1.0, "{}"),
      (4L, ns(t0 + 11 * hour), 1L, "click", 1.0, "{}"),
      (5L, ns(t0 + 10 * hour + 1800), 99L, "error", 500.0, "{}")))
    val rows = Signal.qJoinIntervalOverlap(spark, dir)
      .select("user_id", "sid", "gid", "ov_s").as[(Long, Long, Long, Long)].collect().toSet
    // user 1's session overlaps fully; user 99's 1-event session overlaps 0-length
    assert(rows.contains((1L, 1L, 1L, 3600L)), s"got $rows")
  }

  // ---- graph tier ---------------------------------------------------------

  test("transitions: per-user consecutive pairs with row-normalized probabilities") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "b", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "a", 1.0, "{}"),
      (4L, ns(t0), 2L, "a", 1.0, "{}"),
      (5L, ns(t0 + 60), 2L, "b", 1.0, "{}")))
    val out = Graphs.qGraphTransitions(spark, dir)
      .select("src", "dst", "n", "p").as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("pagerank: a symmetric 2-cycle is the fixed point (0.5, 0.5)") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "b", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "a", 1.0, "{}"),
      (4L, ns(t0 + 180), 1L, "b", 1.0, "{}")))
    val out = Graphs.qGraphPagerank(spark, dir)
      .select("node", "rank").as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 0.5, "b" -> 0.5), s"got $out")
  }

  // ---- retrieval eval -----------------------------------------------------

  test("eval metrics: order-preserving quantization scores a perfect 1/1/1") {
    // equal-norm vectors with entries in {0, 1}: int8 quantization maps
    // them to {0, 127} exactly, so the quantized dot is a monotone
    // transform of cosine and every metric must be exactly 1.0
    val dim = 8
    def v(i: Int): Array[Float] = {
      val a = Array.fill(dim)(0f); a(i % (dim - 1)) = 1f; a(dim - 1) = 1f; a
    }
    val rows = (0 until 36).map(i => (i.toLong, v(i), i % 3))
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Retrieval.qSimEvalMetrics(spark, dir)
      .select("recall", "mrr", "ndcg").as[(Double, Double, Double)].collect().toSeq
    assert(out.size == 20 && out.forall(_ == ((1.0, 1.0, 1.0))), s"got $out")
  }

  test("mad: values 1..5 have median 3 and absolute-deviation median 1") {
    writeEvents((1 to 5).map(i => (i.toLong, ns(t0 + i * 60), 1L, "click", i.toDouble, "{}")))
    val out = Signal.qTsMad(spark, dir)
      .select("n", "med", "mad").as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq((5L, 3.0, 1.0)))
  }

  test("psi is exactly zero when week-1 and week-4 distributions are identical") {
    val w4 = t0 + 21 * 86400L // 2024-01-22
    val vals = Seq(10.0, 60.0, 120.0)
    writeEvents(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, ns(t0 + i * 60), 1L, "click", v, "{}") } ++
        vals.zipWithIndex.map { case (v, i) => (10L + i, ns(w4 + i * 60), 1L, "click", v, "{}") })
    val out = Signal.qTsDriftPsi(spark, dir)
      .select("n1", "n2", "psi").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((3L, 3L, 0.0)), s"got $out")
  }

  test("rolling corr of two identical series is 1.0 in every full window") {
    val rows = (0 until 30).flatMap { h =>
      (0 until (h % 3 + 1)).flatMap(i => Seq(
        (h * 100L + i, ns(t0 + h * hour), 1L, "click", 1.0, "{}"),
        (5000L + h * 100L + i, ns(t0 + h * hour), 1L, "view", 1.0, "{}")))
    }
    writeEvents(rows)
    val out = Signal.qTsRollingCorr(spark, dir).select("r").as[Double].collect().toSeq
    assert(out.nonEmpty && out.forall(_ == 1.0), s"got ${out.take(5)}")
  }

  test("paths: a 4-event stream yields its two consecutive triples") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "b", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "c", 1.0, "{}"),
      (4L, ns(t0 + 180), 1L, "d", 1.0, "{}")))
    val out = Graphs.qGraphPaths(spark, dir)
      .select("e1", "e2", "e3", "n").as[(String, String, String, Long)].collect().toSet
    assert(out == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L)))
  }

  test("attribution: each purchase credits the latest preceding non-purchase event") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "view", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "click", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "purchase", 1.0, "{}"),
      (4L, ns(t0 + 180), 1L, "purchase", 1.0, "{}"), // still credits click
      (5L, ns(t0), 2L, "purchase", 1.0, "{}")))      // no touch: excluded
    val out = Graphs.qGraphAttribution(spark, dir)
      .select("touch", "conversions", "share").as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("click", 2L, 1.0)))
  }

  test("sax motif: identical-shape days share a word; flat days have no shape") {
    // days 1 and 2 carry the same hourly ramp; every other grid day is
    // all-zero (sd = 0) and must be excluded, so exactly one motif row
    // remains, covering both shaped days with a non-decreasing word
    val rows = (0 until 48).map { i =>
      (i.toLong, ns(t0 + i * hour), 1L, "click", 10.0 * (i % 24), "{}")
    }
    writeEvents(rows)
    val out = Signal.qTsSaxMotif(spark, dir)
      .select("word", "n_days").as[(String, Long)].collect().toSeq
    assert(out.size == 1 && out.head._2 == 2L, s"got $out")
    val w = out.head._1
    assert(w.length == 8 && w == w.sorted.mkString, s"ramp must symbolize monotonically: $w")
  }

  // ---- features tier ------------------------------------------------------

  test("pit features: the label day's own events never reach its features") {
    import graft.operators.Features
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 10.0, "{}"),
      (2L, ns(t0 + 60), 1L, "click", 20.0, "{}"),
      (3L, ns(t0 + 86400L), 1L, "click", 5.0, "{}")))
    val out = Features.qFeatPit(spark, dir)
      .select("cnt7", "sum7", "last_v", "days_since")
      .as[(Long, Double, Option[Double], Option[Long])].collect().toSeq
    // day 1: no history; day 2: yesterday's 2 events, last value 20.0
    assert(out == Seq((0L, 0.0, None, None), (2L, 30.0, Some(20.0), Some(1L))), s"got $out")
  }

  test("pit features: the trailing frame is 7 days, but last-value carries further") {
    import graft.operators.Features
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 10.0, "{}"),
      (2L, ns(t0 + 9 * 86400L), 1L, "click", 5.0, "{}")))
    val out = Features.qFeatPit(spark, dir)
      .select("cnt7", "last_v", "days_since")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq((0L, None, None), (0L, Some(10.0), Some(9L))), s"got $out")
  }

  test("dq audit on real data: lineitem PK duplication is caught, name nulls are not") {
    import graft.operators.Features
    val out = Features.qDqAudit(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(out("lineitem_dup_pk") > 0, s"known duplicate PK must be flagged: $out")
    assert(out("customer_null_name") == 0 && out("orders_orphan_custkey") == 0, s"got $out")
  }

  test("sliding distinct: a user counts once per window it is present in") {
    import graft.operators.Features
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + 600), 1L, "click", 1.0, "{}"),  // same user+hour: still one
      (3L, ns(t0), 2L, "click", 1.0, "{}"),
      (4L, ns(t0 + 30 * hour), 1L, "click", 1.0, "{}")))
    val out = Features.qTsSlidingDistinct(spark, dir)
      .as[(java.time.LocalDateTime, Long)].collect()
      .map { case (w, n) => ((w.toEpochSecond(java.time.ZoneOffset.UTC) - t0) / hour, n) }.toMap
    assert(out(0L) == 2 && out(23L) == 2, s"both users serve windows 0..23: $out")
    assert(!out.contains(24L) && !out.contains(29L), s"empty windows emit no row: $out")
    assert(out(30L) == 1 && out(53L) == 1, s"user 1 serves windows 30..53: $out")
  }

  test("periodogram: a 12-on/12-off square wave peaks at period 24, with its 3rd harmonic at 8") {
    // hourly counts 2,2,...,2,1,1,...,1 repeating over 2 days: a 50%-duty
    // square wave of period 24 — even harmonics (12, 6) vanish, the odd
    // 3rd harmonic (24/3 = 8) carries 1/9 of the fundamental's power
    val rows = (0 until 48).flatMap { h =>
      val n = if (h % 24 < 12) 2 else 1
      (0 until n).map(i => (h * 10L + i, ns(t0 + h * hour), 1L, "click", 1.0, "{}"))
    }
    writeEvents(rows)
    val p = Signal.qTsPeriodogram(spark, dir)
      .select("period", "power").as[(Long, Double)].collect().toMap
    assert(p(24L) > p(8L) && p(8L) > p(12L), s"square-wave spectrum shape: $p")
    assert(p(12L) < 0.1 && p(6L) < 0.1, s"even harmonics must vanish: $p")
  }

  test("periodogram: a constant series has (rounded) zero power everywhere") {
    writeEvents((0 until 48).map(i => (i.toLong, ns(t0 + i * hour), 1L, "click", 1.0, "{}")))
    val p = Signal.qTsPeriodogram(spark, dir).select("power").as[Double].collect().toSeq
    assert(p.size == 4 && p.forall(_ == 0.0), s"got $p")
  }

  test("triangles: a 3-cycle closes into exactly one canonical triple; a pendant edge does not") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "b", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "c", 1.0, "{}"),
      (4L, ns(t0 + 180), 1L, "a", 1.0, "{}"),   // u1: a→b→c→a = cycle
      (5L, ns(t0), 2L, "a", 1.0, "{}"),
      (6L, ns(t0 + 60), 2L, "d", 1.0, "{}")))   // u2: a→d = pendant
    val out = Graphs.qGraphTriangles(spark, dir)
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(("a", "b", "c")), s"got $out")
  }

  test("degree: pure sources and pure sinks both appear with zero-filled sides") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "b", 1.0, "{}"),
      (3L, ns(t0 + 120), 1L, "b", 1.0, "{}"))) // edges a→b, b→b
    val out = Graphs.qGraphDegree(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 1L, 0L, 0L), ("b", 1L, 1L, 2L, 2L)), s"got $out")
  }

  test("rrf fusion: a candidate identical to the query tops both channels at 2/61") {
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (20L, Array(1f, 0f, 0f, 0f), 0),     // identical: rank 1 in both channels
      (21L, Array(0.9f, 0.1f, 0.2f, 0.1f), 1),
      (22L, Array(-1f, -0.5f, -0.5f, -0.5f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Retrieval.qSimRrfFusion(spark, dir)
      .select("cid", "ra", "rb", "rrf").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.head == ((20L, 1L, 1L, 0.032787)), s"got $out") // round(2/61, 6)
    assert(out.map(_._1) == Seq(20L, 21L, 22L), s"fused order: $out")
  }

  test("mmr: a diverse lower-relevance candidate outranks a redundant near-duplicate") {
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (20L, Array(0.95f, 0.312f, 0f, 0f), 0),  // top relevance → pick 1
      (21L, Array(0.94f, 0.342f, 0f, 0f), 0),  // nearly duplicates 20: heavy penalty
      (22L, Array(0.8f, -0.6f, 0f, 0f), 0))    // diverse: wins pick 2 on MMR score
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Retrieval.qSimMmr(spark, dir)
      .select("pick", "cid").as[(Long, Long)].collect().toSeq
    // pool exhausts at 3 candidates: picks 4-5 must vanish, not error
    assert(out == Seq((1L, 20L), (2L, 22L), (3L, 21L)), s"got $out")
  }

  test("hard negatives exclude the query's own label and rank by similarity") {
    val rows = Seq(
      (0L, Array(1f, 0f), 0),
      (20L, Array(1f, 0f), 0),   // same label: must NOT appear
      (21L, Array(0.9f, 0.1f), 1),
      (22L, Array(0f, 1f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Retrieval.qEmbHardNegatives(spark, dir)
      .select("cid", "cl", "rank").as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((21L, 1, 1L), (22L, 2, 2L)), s"got $out")
  }

  test("target encode: LOO mean never sees the row's own value; singletons drop") {
    import graft.operators.Features
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "click", 2.0, "{}"),
      (3L, ns(t0 + 120), 1L, "click", 3.0, "{}"),
      (4L, ns(t0 + 180), 1L, "view", 9.0, "{}"))) // singleton category
    val out = Features.qFeatTargetEncode(spark, dir)
      .select("event_id", "enc").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2.5), (2L, 2.0), (3L, 1.5)), s"got $out")
  }

  test("curriculum phases are equal quartiles in difficulty order") {
    val docs = (1 to 8).map { i =>
      // average word length grows with i: i tokens of length i
      val w = "x" * i
      (i.toLong, List.fill(4)(w).mkString(" "), if (i <= 4) "en" else "de", "s")
    }
    docs.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Retrieval.qDocsCurriculum(spark, dir)
      .select("phase", "n_docs", "toks").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 8L), (2L, 2L, 8L), (3L, 2L, 8L), (4L, 2L, 8L)), s"got $out")
  }

  test("scd2: runs collapse, intervals chain end-to-start, only the last is current") {
    import graft.operators.Features
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0 + 60), 1L, "click", 1.0, "{}"),    // same status: same run
      (3L, ns(t0 + 120), 1L, "view", 1.0, "{}"),
      (4L, ns(t0 + 180), 1L, "click", 1.0, "{}")))  // back to click: NEW run
    val r = Features.qScd2Build(spark, dir)
      .select("status", "valid_from", "valid_to", "is_current")
      .collect().map { x =>
        def sec(i: Int): Long = x.getAs[java.time.LocalDateTime](i)
          .toEpochSecond(java.time.ZoneOffset.UTC)
        (x.getString(0), sec(1), if (x.isNullAt(2)) -1L else sec(2), x.getLong(3))
      }.toSeq
    assert(r == Seq(
      ("click", t0, t0 + 120, 0L),
      ("view", t0 + 120, t0 + 180, 0L),
      ("click", t0 + 180, -1L, 1L)), s"got $r")
  }

  test("matrix_profile: equals a brute-force driver recompute with the same rounding discipline") {
    // deterministic pseudo-random 6-hour bucket counts; v(b) events at hour 6b
    val v = (0 until 120).map(b => (b * b * 31 + 7 * b) % 23 + 1).toArray
    var id = 0L
    val rows = (0 until 120).flatMap { b =>
      (0 until v(b)).map { _ => id += 1; (id, ns(t0 + b * 6 * hour), 1L, "click", 1.0, "{}") }
    }
    writeEvents(rows)
    def r6(x: Double): Double = { val m = math.floor(math.abs(x) * 1e6 + 0.5) / 1e6; if (x < 0) -m else m }
    val m = 8
    val zl = Array.ofDim[Long](113, m)
    for (i <- 0 to 112) {
      val w = (0 until m).map(k => v(i + k).toDouble)
      val s1 = w.sum; val s2 = w.map(x => x * x).sum
      val mu = r6(s1 / m)
      val sd = r6(math.sqrt(math.max((s2 - s1 * s1 / m) / m, 0.0) + 1e-6))
      for (k <- 0 until m) {
        val z = r6((v(i + k) - mu) / sd)
        val mm = math.floor(math.abs(z * 1e6) + 0.5); zl(i)(k) = (if (z < 0) -mm else mm).toLong
      }
    }
    val want = (0 to 112).map { i =>
      val cands = for {
        j <- 0 to 112 if math.abs(j - i) >= m / 2
      } yield (((0 until m).map(k => { val d = zl(i)(k) - zl(j)(k); d * d }).sum), j)
      val (d2, j) = cands.min
      (i.toLong, j.toLong, r6(math.sqrt(d2.toDouble) / 1e6))
    }
    val got = Signal.qTsMatrixProfile(spark, dir)
      .select("i", "nn", "dist").as[(Long, Long, Double)].collect().toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("series_dist: 2-vs-5 per hour for 720 hours gives l1 = 2160, l2 = 3·√720") {
    import graft.operators.Signal
    val rows = (0 until 720).flatMap { x =>
      (1 to 2).map(i => (x * 10L + i, ns(t0 + x * 3600L), 1L, "click", 1.0, "{}")) ++
        (3 to 7).map(i => (x * 10L + i, ns(t0 + x * 3600L), 1L, "view", 1.0, "{}"))
    }.zipWithIndex.map { case (r, i) => r.copy(_1 = i.toLong) }
    writeEvents(rows)
    val r = Signal.qTsSeriesDist(spark, dir)
      .select("et_a", "et_b", "l1", "l2").as[(String, String, Long, Double)].collect().toSeq
    val l2 = { val v = 3.0 * math.sqrt(720.0); math.floor(v * 1e6 + 0.5) / 1e6 }
    assert(r == Seq(("click", "view", 2160L, l2)), s"got $r")
  }

  // ---- rolling median --------------------------------------------------------

  test("rolling_median: a single 30-count spike never moves the trailing median or IQR (the anti-mean point)") {
    var id = 0L
    val rows = (0 until 720).flatMap { x =>
      val c = if (x == 100) 30 else 5
      (0 until c).map { _ => id += 1; (id, ns(t0 + x * hour), 1L, "click", 1.0, "{}") }
    }
    writeEvents(rows)
    val r = Signal.qTsRollingMedian(spark, dir)
      .select("med", "iqr").as[(Double, Double)].collect().toSeq
    assert(r.length == 720 - 23)
    assert(r.forall(_ == ((5.0, 0.0))), s"spike leaked into the rolling median")
  }

  // ---- Haar energies --------------------------------------------------------

  test("haar: alternating hours put all energy at level 1; a half-split step puts it all at level 9") {
    def grid(c: Int => Int): Seq[(Long, Long, Long, String, Double, String)] = {
      var id = 0L
      (0 until 512).flatMap { x =>
        (0 until c(x)).map { _ => id += 1; (id, ns(t0 + x * hour), 1L, "click", 1.0, "{}") }
      }
    }
    // 1,0,1,0,…: every pair-block detail is 1 ⇒ E1 = 256·1/2 = 128; deeper
    // blocks balance their halves exactly ⇒ 0
    writeEvents(grid(x => 1 - x % 2))
    val alt = Signal.qTsHaarEnergy(spark, dir)
      .select("level", "n_coef", "energy").as[(Long, Long, Double)].collect().toSeq
    assert(alt == (1 to 9).map(l => (l.toLong, (512L >> l), if (l == 1) 128.0 else 0.0)), s"got $alt")

    // 0…0 then 10…10 at x ≥ 256: only the level-9 whole-series block
    // straddles the step: d = −2560 ⇒ E9 = 2560²/512 = 12800
    writeEvents(grid(x => if (x < 256) 0 else 10))
    val step = Signal.qTsHaarEnergy(spark, dir)
      .select("level", "energy").as[(Long, Double)].collect().toSeq
    assert(step == (1 to 9).map(l => (l.toLong, if (l == 9) 12800.0 else 0.0)), s"got $step")
  }

  // ---- STOMP long-series matrix profile -----------------------------------

  /** From-scratch all-pairs z-normalized reference (the textbook O(n²·m)
    * definition the gated q_ts_matrix_profile also follows, without the
    * cross-engine rounding lifts). */
  private def naiveProfile(vals: Array[Double], m: Int, excl: Int): Array[(Int, Double)] = {
    val n = vals.length - m + 1
    val zs = Array.tabulate(n) { i =>
      val w = vals.slice(i, i + m)
      val mu = w.sum / m
      val sd = math.sqrt(math.max(w.map(x => x * x).sum / m - mu * mu, 0.0))
      if (sd == 0.0) Array.fill(m)(0.0) else w.map(x => (x - mu) / sd)
    }
    Array.tabulate(n) { i =>
      var bj = -1; var bd = Double.PositiveInfinity
      for (j <- 0 until n if math.abs(j - i) >= math.max(excl, 1)) {
        var d2 = 0.0; var k = 0
        while (k < m) { val dd = zs(i)(k) - zs(j)(k); d2 += dd * dd; k += 1 }
        if (d2 < bd) { bd = d2; bj = j }
      }
      (bj, math.sqrt(bd))
    }
  }

  test("qTsMad (graft_med_mad aggregate) ≡ the two-pass percentile form") {
    // odd and even group sizes, exact ties, negatives — the median
    // interpolation and the pre-rounded deviation pass must match the
    // built-in percentile() two-pass shape bit-for-bit
    val vals = Map(
      ("a", 0) -> Seq(1.0, 2.0, 2.0, 9.5, -3.25),       // odd n, ties
      ("a", 1) -> Seq(4.125, 0.5, 0.5, 8.0),            // even n → blend
      ("b", 0) -> Seq(7.0),                             // singleton
      ("b", 1) -> Seq(2.5, 2.5, 2.5, 2.5, 1.0, 100.75)) // heavy ties
    var id = 0L
    val rows = vals.toSeq.flatMap { case ((et, day), vs) =>
      vs.map { v =>
        id += 1
        (id, ns(t0 + day.toLong * 86400 + id % 7 * hour), 1L, et, v, "{}")
      }
    }
    writeEvents(rows)
    val got = Signal.qTsMad(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4))).toList
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
    val med = ev
      .groupBy(col("event_type").as("met"), date_trunc("day", col("ts")).cast("date").as("dday"))
      .agg(graft.operators.Num.roundd(expr("percentile(value, 0.5)"), 4).as("med"),
        count(lit(1)).as("n"))
    val want = ev.join(broadcast(med),
        col("event_type") === col("met") &&
          date_trunc("day", col("ts")).cast("date") === col("dday"))
      .select(col("event_type"), col("dday"), col("med"), col("n"),
        abs(col("value") - col("med")).as("ad"))
      .groupBy("event_type", "dday", "n", "med")
      .agg(graft.operators.Num.roundd(expr("percentile(ad, 0.5)"), 4).as("mad"))
      .select("event_type", "dday", "n", "med", "mad")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4))).toList.sorted
    assert(got.sorted == want, s"got $got\nwant $want")
  }

  test("gated matrix profile (exact kernel) is frame-equal to the pair-join form") {
    // several types with distinct shapes: a periodic one, a bursty one, a
    // sparse one (mostly empty buckets), plus rows outside the 120-bucket
    // window that both forms must ignore
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double, String)]()
    var id = 0L
    def add(et: String, bucket: Int, n: Int): Unit =
      (0 until n).foreach { _ =>
        rows += ((id, ns(t0 + bucket.toLong * 6 * hour + (id % 5) * hour), 1L, et, 1.0, "{}")); id += 1
      }
    for (b <- 0 until 120) {
      add("periodic", b, 3 + (b % 7))
      if (b % 11 == 0) add("bursty", b, 40 + b % 13)
      if (b % 37 == 0) add("sparse", b, 1)
    }
    add("periodic", 150, 9) // beyond the window: dropped by both forms
    writeEvents(rows.toSeq)
    val got = Signal.qTsMatrixProfile(spark, dir).collect().map(_.toSeq)
    val want = Signal.matrixProfilePairJoinForm(spark, dir).collect().map(_.toSeq)
    assert(got.length == want.length, s"row counts: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"row mismatch: $g vs $w") }
    assert(got.length == 3 * 113, "113 window starts per type")
  }

  test("stompKernel equals the all-pairs z-normalized reference on a planted-motif series") {
    // deterministic LCG noise + a motif planted twice + a constant shelf
    var seed = 0x2545F4914F6CDD1DL
    def rnd(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 11).toDouble / (1L << 53).toDouble }
    val n = 400; val m = 16
    val vals = Array.tabulate(n + m - 1) { t =>
      val motif =
        if (t >= 50 && t < 50 + m) 10.0 * math.sin((t - 50) * 0.7)
        else if (t >= 300 && t < 300 + m) 10.0 * math.sin((t - 300) * 0.7)
        else 0.0
      if (t >= 150 && t < 180) 42.0 // truly constant shelf (σ = 0 windows)
      else motif + math.sin(t * 0.05) * 3.0 + rnd()
    }
    val got = Signal.stompKernel(vals, m, excl = m / 2)
    val want = naiveProfile(vals, m, excl = m / 2)
    assert(got.length == want.length)
    var mismatchedNn = 0
    for (i <- got.indices) {
      assert(math.abs(got(i)._2 - want(i)._2) <= 1e-6,
        s"dist at $i: stomp ${got(i)._2} vs naive ${want(i)._2}")
      if (got(i)._1 != want(i)._1) {
        // only acceptable when the two candidates tie within float noise
        mismatchedNn += 1
        assert(math.abs(got(i)._2 - want(i)._2) <= 1e-9, s"nn differs at $i beyond a tie")
      }
    }
    assert(mismatchedNn <= 2, s"$mismatchedNn nn mismatches")
    // the planted motif pair finds itself
    assert(got(50)._1 == 300 && got(300)._1 == 50,
      s"motif pair missed: ${got(50)} / ${got(300)}")
    assert(got(50)._2 < 1.0, s"motif distance not small: ${got(50)._2}")
    // constant shelf: windows fully inside it are distance 0 to each other
    assert(got(155)._2 == 0.0 && math.abs(got(155)._1 - 155) >= m / 2)
  }

  test("matrixProfileStomp distributes the kernel per key and matches it") {
    val m = 8
    val mk = (k: String, scale: Double) =>
      (0 until 120).map(i => (k, i.toLong, math.sin(i * 0.3) * scale + (i % 7)))
    val df = (mk("a", 5.0) ++ mk("b", 2.0)).toDF("key", "ord", "v")
      .repartition(7) // kernel must group-and-sort, not trust input order
    val out = Signal.matrixProfileStomp(df, "key", "ord", "v", m, m / 2)
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.sortBy(_._2) }
    for (k <- Seq("a", "b")) {
      val vals = mk(k, if (k == "a") 5.0 else 2.0).map(_._3).toArray
      val want = Signal.stompKernel(vals, m, m / 2)
      val rows = out(k)
      assert(rows.length == want.length, s"$k row count")
      for (i <- want.indices) {
        assert(rows(i)._3 == want(i)._1.toLong, s"$k nn at $i")
        assert(math.abs(rows(i)._4 - want(i)._2) <= 1e-12, s"$k dist at $i")
      }
    }
  }
}
