package graft

import graft.operators.{Fit, Mining}

/** Edge semantics of the trend-fit (Fit) and corpus-mining (Mining)
  * tiers via crafted fixtures (raw ns LONG ts per §1.3). */
class FitMiningSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-fitmining"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val hour = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): Unit =
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  /** c(x) = x events in hour x across the full 720-h grid, one type. */
  private def lineEvents(outlierAt: Option[Int]): Seq[(Long, Long, Long, String, Double, String)] = {
    var id = 0L
    (0 until 720).flatMap { x =>
      val c = x + outlierAt.map(o => if (x == o) 1000 else 0).getOrElse(0)
      (0 until c).map { _ =>
        id += 1
        (id, ns(t0 + x * hour), 1L, "click", 1.0, "{}")
      }
    }
  }

  // ---- regr_fit / theil_sen ----------------------------------------------

  test("regr_fit: perfect line c = x gives slope 1, intercept 0, r2 1") {
    writeEvents(lineEvents(None))
    val r = Fit.qTsRegrFit(spark, dir)
      .select("event_type", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(r == Seq(("click", 1.0, 0.0, 1.0)))
  }

  test("theil_sen: median pairwise slope is 1 on the line AND under a 1000-count outlier hour (where OLS moves)") {
    writeEvents(lineEvents(None))
    val clean = Fit.qTsTheilSen(spark, dir)
      .select("event_type", "n_pairs", "slope")
      .as[(String, Long, Double)].collect().toSeq
    assert(clean == Seq(("click", 720L * 719 / 2, 1.0)))

    writeEvents(lineEvents(Some(360)))
    val robust = Fit.qTsTheilSen(spark, dir)
      .select("slope").as[Double].collect().toSeq
    assert(robust == Seq(1.0)) // 719 of 258840 pair slopes moved — median didn't
    val ols = Fit.qTsRegrFit(spark, dir).select("slope").as[Double].head()
    assert(ols != 1.0) // the same outlier drags the OLS fit
  }

  // ---- drawdown -----------------------------------------------------------

  test("drawdown: cum [10,6,3,8] has peak 10, max_dd 7, trough at hour 2") {
    writeEvents(Seq(
      (1L, ns(t0 + 0 * hour), 1L, "click", 10.0, "{}"),
      (2L, ns(t0 + 1 * hour), 1L, "click", -4.0, "{}"),
      (3L, ns(t0 + 2 * hour), 1L, "click", -3.0, "{}"),
      (4L, ns(t0 + 3 * hour), 1L, "click", 5.0, "{}")))
    val r = Fit.qTsDrawdown(spark, dir)
      .select("event_type", "peak", "max_dd", "trough_h")
      .as[(String, Double, Double, java.time.LocalDateTime)].collect().toSeq
    assert(r.map(t => (t._1, t._2, t._3)) == Seq(("click", 10.0, 7.0)))
    assert(r.head._4 == java.time.LocalDateTime.of(2024, 1, 1, 2, 0))
  }

  // ---- capped cumsum ------------------------------------------------------

  test("capped_cumsum: clamps at 200 and 0; same-ts events fold in event_id order") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 200.0, "{}"),     // 100+160 -> clamp 200
      (2L, ns(t0 + 1), 1L, "click", 10.0, "{}"),  // 200-30 -> 170
      // same ts: event_id order decides the fold
      (4L, ns(t0 + 2), 1L, "click", 0.0, "{}"),   // applied AFTER 3
      (3L, ns(t0 + 2), 1L, "click", 0.0, "{}"),   // 170-40 -> 130; then 4: 130-40 -> 90
      (5L, ns(t0 + 3), 1L, "click", 0.0, "{}"),   // 50
      (6L, ns(t0 + 4), 1L, "click", 0.0, "{}"),   // 10
      (7L, ns(t0 + 5), 1L, "click", 0.0, "{}"),   // 10-40 -> clamp 0
      (8L, ns(t0 + 6), 1L, "click", 90.0, "{}"))) // 0+50 -> 50
    val m = Fit.qTsCappedCumsum(spark, dir)
      .select("event_id", "bal").as[(Long, Double)].collect().toMap
    assert(m == Map(1L -> 200.0, 2L -> 170.0, 3L -> 130.0, 4L -> 90.0,
      5L -> 50.0, 6L -> 10.0, 7L -> 0.0, 8L -> 50.0))
  }

  // ---- ma_cross -----------------------------------------------------------

  test("ma_cross: spike day fires golden, decay fires death; flat prefix emits nothing") {
    val day = 86400L
    val rows =
      (0 to 13).map(i => ((i + 1).toLong, ns(t0 + i * day), 1L, "click", 10.0, "{}")) ++
        Seq((15L, ns(t0 + 14 * day), 1L, "click", 100.0, "{}")) ++
        (15 to 21).map(i => ((i + 1).toLong, ns(t0 + i * day), 1L, "click", 1.0, "{}"))
    writeEvents(rows)
    val r = Fit.qTsMaCross(spark, dir)
      .select("d", "signal").as[(java.sql.Date, String)].collect().toSeq
      .map(t => (t._1.toLocalDate.getDayOfMonth, t._2))
    assert(r == Seq((15, "golden"), (22, "death"))) // days 14 and 21 (0-based)
  }

  // ---- power_iter ---------------------------------------------------------

  test("power_iter: axis-dominated corpus converges to that axis, lam = top Gram eigenvalue") {
    writeEmb(Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (4L, Array(0.0f, 0.5f, 0.0f, 0.0f), 0)))
    val r = Mining.qEmbPowerIter(spark, dir)
      .select("i", "loading", "lam").as[(Long, Double, Double)].collect().toSeq
    assert(r == Seq((1L, 1.0, 3.0), (2L, 0.0, 3.0), (3L, 0.0, 3.0), (4L, 0.0, 3.0)))
  }

  // ---- bigrams ------------------------------------------------------------

  test("bigrams: 'a b a b' yields 'a b'x2 then 'b a'x1; 1-token and empty docs drop out") {
    writeDocs(Seq(
      (1L, "a b a b", "en", "s"),
      (2L, "x", "en", "s"),
      (3L, "", "en", "s")))
    val r = Mining.qDocsBigrams(spark, dir)
      .select("rk", "bg", "cnt").as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "a b", 2L), (2L, "b a", 1L)))
  }

  // ---- winnow -------------------------------------------------------------

  test("winnow: a shared 6-token run guarantees a shared fingerprint; disjoint docs never pair") {
    writeDocs(Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "s"),
      (2L, "z1 z2 w3 w4 w5 w6 w7 w8 z9 z10", "en", "s"), // shares run w3..w8 (6 tokens)
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "en", "s")))
    val pairs = Mining.qDocsWinnow(spark, dir)
      .select("d1", "d2", "shared").as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists { case (d1, d2, sh) => d1 == 1L && d2 == 2L && sh >= 1L })
    assert(!pairs.exists { case (d1, d2, _) => d1 == 3L || d2 == 3L })
  }

  // ---- dup rate -----------------------------------------------------------

  test("dup_rate: cross-source exact dup counts in BOTH sources; unique doc does not") {
    writeDocs(Seq(
      (1L, "same text here", "en", "a"),
      (2L, "same text here", "en", "a"),
      (3L, "unique text one", "en", "a"),
      (4L, "same text here", "en", "b"),
      (5L, "unique text two", "en", "b")))
    val m = Mining.qDocsDupRate(spark, dir)
      .select("source", "n_docs", "n_dup", "dup_rate")
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m("a") == ((3L, 2L, 0.666667)))
    assert(m("b") == ((2L, 1L, 0.5)))
  }

  // ---- season strength ----------------------------------------------------

  test("season_strength: a pure hour-of-day cycle scores 1.0 with the right peak; a 2-event blip scores near 0") {
    val day = 86400L
    val rows =
      (0 until 30).flatMap(dd => Seq(
        (dd * 2 + 1L, ns(t0 + dd * day + 5 * hour), 1L, "click", 1.0, "{}"),
        (dd * 2 + 2L, ns(t0 + dd * day + 5 * hour), 1L, "click", 1.0, "{}"))) ++
        Seq((1000L, ns(t0), 1L, "error", 1.0, "{}"),
          (1001L, ns(t0 + day + hour), 1L, "error", 1.0, "{}"))
    writeEvents(rows)
    val m = graft.operators.Fit.qTsSeasonStrength(spark, dir)
      .select("event_type", "peak_hod", "strength")
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("click") == ((5L, 1.0)))
    val (_, s2) = m("error")
    assert(s2 > 0.0 && s2 < 0.1) // two off-cycle events: daily cycle explains almost nothing
  }

  // ---- ngram novelty ------------------------------------------------------

  test("ngram_novelty: later doc sharing one gram of two scores 0.5; the first doc scores 1") {
    writeDocs(Seq(
      (1L, "a b c d", "en", "s"),  // grams: abc, bcd — both first here
      (2L, "a b c x", "en", "s"))) // abc seen in doc 1, bcx novel -> 0.5
    val m = Mining.qDocsNgramNovelty(spark, dir)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m(1L) == ((2L, 2L, 1.0)))
    assert(m(2L) == ((2L, 1L, 0.5)))
  }

  // ---- bpe step -----------------------------------------------------------

  test("bpe_step: merging the argmax pair 'a b' leaves 'a ab' as the next round's top pair") {
    writeDocs(Seq((1L, "aab aab ab", "en", "s")))
    // vocab: aab f=2 (pairs 'a a'x2, 'a b'x2), ab f=1 ('a b'x1) -> best 'a b' cnt 3
    // merged: aab -> 'a ab' (pair 'a ab' f=2); ab -> single symbol, no pairs
    val r = Mining.qTextBpeStep(spark, dir)
      .select("rk", "p", "cnt", "bp", "bcnt")
      .as[(Long, String, Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "a ab", 2L, "a b", 3L)))
  }

  // ---- wilson ci ----------------------------------------------------------

  test("wilson_ci: x=0 day pins lo to 0; p=0.5 day gives a symmetric interval (lo+hi=1)") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0, "{}"),
      (2L, ns(t0), 1L, "click", 1.0, "{}"),
      (3L, ns(t0), 1L, "click", 1.0, "{}"),
      (4L, ns(t0), 1L, "click", 1.0, "{}"),
      (5L, ns(t0 + 86400), 1L, "error", 1.0, "{}"),
      (6L, ns(t0 + 86400), 1L, "error", 1.0, "{}"),
      (7L, ns(t0 + 86400), 1L, "click", 1.0, "{}"),
      (8L, ns(t0 + 86400), 1L, "click", 1.0, "{}")))
    val m = graft.operators.Fit.qTsWilsonCi(spark, dir)
      .select("d", "p", "lo", "hi").as[(java.sql.Date, Double, Double, Double)]
      .collect().map(t => t._1.toLocalDate.getDayOfMonth -> (t._2, t._3, t._4)).toMap
    val (p1, lo1, hi1) = m(1)
    assert(p1 == 0.0 && lo1 == 0.0 && hi1 > 0.0 && hi1 < 1.0)
    val (p2, lo2, hi2) = m(2)
    assert(p2 == 0.5 && lo2 + hi2 == 1.0 && lo2 > 0.0 && lo2 < 0.5)
  }

  // ---- line dedup ---------------------------------------------------------

  test("line_dedup: a shared 16-token line counts as duplicated in both docs") {
    val lineA = Array.fill(16)("a").mkString(" ")
    val lineB = (1 to 16).map(i => s"b$i").mkString(" ")
    val lineC = (1 to 16).map(i => s"c$i").mkString(" ")
    writeDocs(Seq(
      (1L, s"$lineA $lineB", "en", "s"),
      (2L, s"$lineA $lineC", "en", "s"),
      (3L, (1 to 16).map(i => s"d$i").mkString(" "), "en", "s")))
    val m = Mining.qDocsLineDedup(spark, dir)
      .select("doc_id", "n_lines", "n_dup", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m(1L) == ((2L, 1L, 0.5)))
    assert(m(2L) == ((2L, 1L, 0.5)))
    assert(m(3L) == ((1L, 0L, 0.0)))
  }

  // ---- kmeans step --------------------------------------------------------

  test("kmeans_step: near-seed point joins its seed; equidistant point ties to the smallest cid") {
    writeEmb(Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(-1.0f, 0.0f), 0),
      (4L, Array(0.0f, -1.0f), 0),
      (5L, Array(0.8f, 0.2f), 0),   // nearest seed 1
      (6L, Array(0.0f, 0.0f), 0))) // equidistant to all 4 -> cid 1
    val r = Mining.qEmbKmeansStep(spark, dir)
      .select("cid", "i", "n", "c_new").as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(r((1L, 1L)) == ((3L, 0.6)))      // mean(1, 0.8, 0) = 0.6
    assert(r((1L, 2L)) == ((3L, 0.066667))) // mean(0, 0.2, 0) rounded
    assert(r((2L, 1L)) == ((1L, 0.0)) && r((2L, 2L)) == ((1L, 1.0)))
    assert(r((3L, 1L)) == ((1L, -1.0)) && r((4L, 2L)) == ((1L, -1.0)))
  }

  test("semdedup: near-dups of the exemplar drop by centroid order; angularly-orthogonal members survive") {
    // orthogonal unit-basis seeds (ids 1-4 are the k-means seeds)
    writeEmb(Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 0),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f), 0),
      // 5, 7: both angularly near seed 1 — the whole chain drops except
      // the exemplar (5 also outranks 7 by centroid sim)
      (5L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (7L, Array(0.8f, 0.2f, 0.0f, 0.0f), 0),
      // 6: euclid-assigned to cluster 2 (tie to smallest cid) but
      // ORTHOGONAL to its centroid — no near-dup edge, survives
      (6L, Array(-0.2f, 0.0f, 0.0f, 0.0f), 0)))
    val r = Mining.qEmbSemdedup(spark, dir)
      .select("vec_id", "cid", "dropped").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_)._2 == 0L), s"orthogonal seeds survive: $r")
    assert(r(5L)._2 == 1L && r(7L)._2 == 1L, s"near-dups of the exemplar drop: $r")
    assert(r(6L) == ((2L, 0L)), s"orthogonal member of cluster 2 survives: $r")
  }

  test("dsir: target-only words score positive, raw-only words negative, weights rank accordingly") {
    writeDocs(Seq(
      (1L, "alpha alpha alpha", "en", "web"),   // pure target vocabulary
      (2L, "omega omega omega", "zh", "web"),   // raw-only vocabulary
      (3L, "alpha omega", "zh", "web")))        // mixed
    val r = Mining.qDocsDsirWeight(spark, dir)
      .select("doc_id", "n_toks", "dsir_w").as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // alpha: ct=3 (doc1 is the en slice) vs omega: ct=0 — alpha's log
    // ratio must exceed omega's, so w(doc1) > w(doc3) > w(doc2)
    assert(r(1L)._1 == 3L && r(2L)._1 == 3L && r(3L)._1 == 2L)
    assert(r(1L)._2 > r(3L)._2 && r(3L)._2 > r(2L)._2, s"ordering violated: $r")
    assert(r(1L)._2 > 0 && r(2L)._2 < 0, s"signs violated: $r")
  }

  // ---- phash --------------------------------------------------------------

  test("phash: PNG and BMP containers decode to the identical aHash; nbits equals popcount") {
    import graft.operators.Multimodal
    val png = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeImage(5L, "png")))
    val bmp = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeImage(5L, "bmp")))
    assert(Multimodal.aHash64(png) == Multimodal.aHash64(bmp))
    writeDocs(Seq((1L, "x", "en", "s"), (2L, "y", "en", "s")))
    val rows = graft.operators.LlmScale.qMultimodalPhash(spark, dir)
      .select("phash", "nbits").as[(String, Long)].collect().toSeq
    assert(rows.size == 2)
    rows.foreach { case (ph, nb) =>
      assert(ph.length == 64 && ph.forall(c => c == '0' || c == '1'))
      assert(nb == ph.count(_ == '1'))
    }
  }

  // ---- kalman --------------------------------------------------------------

  test("kalman: constant series keeps level exactly at the constant; gain matches the driver-side Riccati fold") {
    // one event per hour for all 720 hours: z = 1 everywhere, so the
    // innovation z - x is 0 at every step and the level never moves,
    // while the gain runs the P-recurrence to its rounded fixed point.
    writeEvents((0 until 720).map(x => (x.toLong, ns(t0 + x * hour), 1L, "click", 1.0, "{}")))
    def r6(v: Double): Double = { val m = math.floor(math.abs(v) * 1e6 + 0.5) / 1e6; if (v < 0) -m else m }
    // driver-side replay of the same rounded fold
    var p = 1.0; var kExp = 0.0
    (1 until 720).foreach { _ =>
      val pp = r6(p + 1.0); kExp = r6(pp / (pp + 4.0)); p = r6((1.0 - kExp) * pp)
    }
    val r = Fit.qTsKalman(spark, dir)
      .select("x", "level", "gain").as[(Long, Double, Double)].collect().toSeq
    assert(r.map(_._1) == (690L until 720L).toSeq, s"got hours ${r.map(_._1)}")
    assert(r.forall(_._2 == 1.0), s"level must stay at the constant: $r")
    // the gain is settled well before hour 690: every reported row shows the fixed point
    assert(r.forall(_._3 == kExp), s"gain must equal the replayed fixed point $kExp: $r")
    // sanity: the rounded fixed point is the analytic steady state K = (sqrt(17)-1)/... ~ 0.390388
    assert(math.abs(kExp - 0.390388) < 2e-6, s"fixed point drifted: $kExp")
  }

  // ---- lang confusion -----------------------------------------------------

  test("lang_confusion: mislabeled doc lands off-diagonal with recall share 1") {
    writeDocs(Seq(
      (1L, "the a of and to", "en", "s"),
      (2L, "the a of and to", "zh", "s"))) // zh-labeled but en-looking
    val r = graft.operators.LlmScale.qTextLangConfusion(spark, dir)
      .select("lang", "pred_lang", "n", "recall")
      .as[(String, String, Long, Double)].collect().toSet
    assert(r == Set(("en", "en", 1L, 1.0), ("zh", "en", 1L, 1.0)))
  }

  // ---- array hof ----------------------------------------------------------

  test("array_hof: [0.5,-0.25,1.0] gives dim 3, n_pos 2, l2 sqrt(1.3125), relu 1.5") {
    writeEmb(Seq((1L, Array(0.5f, -0.25f, 1.0f), 0)))
    val r = Mining.qEmbArrayHof(spark, dir)
      .select("vec_id", "dim", "n_pos", "l2", "relu_sum")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq((1L, 3L, 2L, 1.145644, 1.5)))
  }

  // ---- PMI collocations ---------------------------------------------------

  test("pmi: 'x y x y …' scores exactly ln(c_xy·N²/(B·c_x·c_y)); sub-threshold bigrams drop") {
    writeDocs(Seq((1L, "x y x y x y x y x y", "en", "s")))
    // tokens x:5 y:5 N=10, bigrams B=9; 'x y' 5 times (≥5), 'y x' 4 (<5)
    val r = Mining.qDocsPmi(spark, dir)
      .select("bg", "cxy", "pmi").as[(String, Long, Double)].collect().toSeq
    val want = { // ln(5·100/(9·25)) computed the engines' way
      val v = math.log(5.0 * 10.0 * 10.0 / (9.0 * 5.0 * 5.0))
      math.floor(v * 1e6 + 0.5) / 1e6
    }
    assert(r == Seq(("x y", 5L, want)), s"got $r")
  }

  // ---- weighted sampling --------------------------------------------------

  test("weighted_sample: order equals a driver-side Efraimidis–Spirakis recompute") {
    val docs = (1L to 10L).map(i => (i, "t" * (10 * i).toInt, "en", "s"))
    writeDocs(docs.map { case (id, t, l, src) => (id, t, l, src) })
    def esKey(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ws:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hmod = (BigInt(hex.take(15), 16) % 1000000).toLong
      val u = (hmod.toDouble + 0.5) / 1e6
      val v = math.log(u) / w.toDouble
      val m = math.floor(math.abs(v) * 1e9 + 0.5) / 1e9
      if (v < 0) -m else m
    }
    val want = docs.map { case (id, t, _, _) => (id, esKey(id, t.length.toLong)) }
      .sortBy { case (id, k) => (-k, id) }.map(_._1)
    val got = Mining.qDocsWeightedSample(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  // ---- seasonal decomposition ----------------------------------------------

  /** c(x) events in hour x across the full 720-h grid, one type. */
  private def seriesEvents(c: Int => Int): Seq[(Long, Long, Long, String, Double, String)] = {
    var id = 0L
    (0 until 720).flatMap { x =>
      (0 until c(x)).map { _ =>
        id += 1
        (id, ns(t0 + x * hour), 1L, "click", 1.0, "{}")
      }
    }
  }

  test("seasonal_decomp: pure daily pattern recovers hod − 11.5; pure linear trend decomposes to zero seasonal") {
    // c = x mod 24: every 2×24-MA window sees each hod once ⇒ trend is
    // flat 11.5 and the normalized index is exactly hod − 11.5
    writeEvents(seriesEvents(x => x % 24))
    val daily = Fit.qTsClassicalDecomp(spark, dir)
      .select("hod", "n_days", "seasonal").as[(Long, Long, Double)].collect().toSeq
    assert(daily == (0 until 24).map(j => (j.toLong, 29L, j - 11.5)))

    // c = x: the centered MA reproduces the line ⇒ detrended ≡ 0
    writeEvents(seriesEvents(x => x))
    val flat = Fit.qTsClassicalDecomp(spark, dir)
      .select("seasonal").as[Double].collect().toSeq
    assert(flat.length == 24 && flat.forall(_ == 0.0))
  }

  // ---- source divergence -----------------------------------------------------

  test("source_divergence: identical distributions give js 0; disjoint vocabularies give ln 2") {
    writeDocs(Seq(
      (1L, "a a b", "en", "s1"), (2L, "a a b", "en", "s2"), // identical dists
      (3L, "x y", "en", "s3")))                             // disjoint from both
    val r = Mining.qDocsSourceDivergence(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val ln2 = r6(math.log(2.0))
    assert(r == Seq(
      ("s1", "s2", 2L, 0.0), ("s1", "s3", 4L, ln2), ("s2", "s3", 4L, ln2)), s"got $r")
  }

  // ---- theta forecast -------------------------------------------------------

  test("theta: constant series forecasts the constant at every horizon; linear series matches the driver fold") {
    def r6(v: Double): Double = math.signum(v) * math.floor(math.abs(v) * 1e6 + 0.5) / 1e6
    writeEvents(seriesEvents(_ => 5))
    val const = Fit.qTsTheta(spark, dir)
      .select("slope", "ses_level", "fc1", "fc6", "fc24")
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(const == ((0.0, 5.0, 5.0, 5.0, 5.0)))

    writeEvents(seriesEvents(x => x))
    val ses = (1 until 720).foldLeft(0.0)((acc, x) => 0.2 * x + 0.8 * acc)
    def fc(h: Int) = r6(ses + 1.0 / 2 * ((h - 1) + 5.0 - math.pow(0.8, 720.0) * 5.0))
    val lin = Fit.qTsTheta(spark, dir)
      .select("slope", "ses_level", "fc1", "fc6", "fc24")
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(lin == ((1.0, r6(ses), fc(1), fc(6), fc(24))), s"got $lin")
  }

  // ---- Kneser–Ney bigram LM -----------------------------------------------

  test("kn_bigram: hand-computed seen / backoff-smoothed / unseen-context probabilities") {
    // Train (src1): "a b a b" ⇒ c12 (a,b)=2 (b,a)=1; "b c" ⇒ (b,c)=1.
    // B = 3 distinct bigrams, V = 3 ⇒ pc(w) = (nr+1)/6: seen words 2/6,
    // unseen 1/6. ctx a: c1=2 nl=1; ctx b: c1=2 nl=2.
    // Eval (src0) "a b z a":
    //   (a,b): (max(2−.75,0) + .75·1·(2/6)) / 2          = 0.75
    //   (b,z): (0 + .75·2·(1/6)) / 2                      = 0.125
    //   (z,a): unseen context ⇒ pc(a)                     = 1/3
    // kn_nll = −(ln .75 + ln .125 + ln 1/3)/3, each ln rounded 6 dp.
    writeDocs(Seq(
      (1L, "a b a b", "en", "src1"), (2L, "b c", "en", "src1"),
      (3L, "a b z a", "en", "src0")))
    val r = Mining.qTextKnBigram(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    def r6(v: Double): Double = -(math.floor(math.abs(v) * 1e6 + 0.5) / 1e6)
    val want = {
      val s = r6(math.log(0.75)) + r6(math.log(0.125)) + r6(math.log(1.0 / 3.0))
      math.floor(-s / 3.0 * 1e4 + 0.5) / 1e4
    }
    assert(r == Seq((3L, 3L, want)), s"got $r want $want")
  }
}
