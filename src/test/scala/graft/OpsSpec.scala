package graft

import graft.operators.{Corpus, Ops}

/** Edge semantics of the operational-metrics tier (Ops.scala) and the
  * round-9 corpus additions (shuffle / budget cap / BM25 / chunking /
  * decontamination), via crafted fixture tables written in the same
  * sfDir shape as CorpusSpec (events.ts as raw ns LONG per §1.3). */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-ops"

  private def ns(sec: Long): Long = sec * 1000000000L
  private val day = 86400L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def words(tok: Int, w: String = "w"): String = List.fill(tok)(w).mkString(" ")

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // ---- new-series churn ---------------------------------------------------

  test("new_series: a returning user counts only on its first day") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0),            // user 1 first seen day 1
      (2L, ns(t0 + day), 1L, "click", 1.0),      // user 1 again day 2 — not new
      (3L, ns(t0 + day), 2L, "click", 1.0)))     // user 2 first seen day 2
    val out = Ops.qTsNewSeries(spark, dir)
      .select("new_users", "cum_users").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (1L, 2L)))
  }

  // ---- cardinality report -------------------------------------------------

  test("cardinality: day total is distinct across types, not the sum") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0),
      (2L, ns(t0 + 60), 1L, "error", 1.0),   // same user, second metric
      (3L, ns(t0 + 120), 2L, "click", 1.0)))
    val out = Ops.qTsCardinality(spark, dir)
      .select("event_type", "n_series", "day_series", "frac")
      .as[(String, Long, Long, Double)].collect().toSeq
    // 2 distinct users on the day; click saw both, error saw one
    assert(out == Seq(("click", 2L, 2L, 1.0), ("error", 1L, 2L, 0.5)))
  }

  // ---- burn rate ----------------------------------------------------------

  test("burn_rate: trailing window is a ratio of sums and gates the alert") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "error", 1.0),          // hour 0: 1/2 errors
      (2L, ns(t0 + 60), 1L, "click", 1.0),
      (3L, ns(t0 + 3600), 1L, "click", 1.0),   // hour 1: 0/2 errors
      (4L, ns(t0 + 3660), 2L, "click", 1.0)))
    val out = Ops.qTsBurnRate(spark, dir)
      .select("burn1", "burn6", "alert").as[(Double, Double, Long)].collect().toSeq
    // hour 0: r1 = 0.5 → burn 2.0 (both windows) → alert
    // hour 1: r1 = 0 → burn1 0; burn6 = (1/4)/0.25 = 1.0 (not > 1) → no alert
    assert(out == Seq((2.0, 2.0, 1L), (0.0, 1.0, 0L)))
  }

  // ---- availability -------------------------------------------------------

  test("availability: counts distinct observed minutes, not events") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0),
      (2L, ns(t0 + 1), 1L, "click", 1.0),      // same minute — no extra credit
      (3L, ns(t0 + 60), 1L, "click", 1.0),
      (4L, ns(t0 + 120), 1L, "click", 1.0)))
    val out = Ops.qTsAvailability(spark, dir)
      .select("n_min").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  // ---- budget cap ---------------------------------------------------------

  test("budget_cap: the doc that reaches the cap exactly is kept, the next dropped") {
    writeDocs(Seq(
      (1L, words(600), "en", "a"),
      (2L, words(400), "en", "a"),   // cum 1000 == B → kept
      (3L, words(1), "en", "a"),     // cum 1001 → dropped
      (4L, words(5), "en", "b")))
    val out = Corpus.qDocsBudgetCap(spark, dir)
      .select("source", "n_kept", "tok_kept", "n_drop", "tok_drop")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 2L, 1000L, 1L, 1L), ("b", 1L, 5L, 0L, 0L)))
  }

  // ---- chunking -----------------------------------------------------------

  test("chunks: W-token doc is one chunk; one token over pays a stride chunk") {
    writeDocs(Seq(
      (1L, words(128), "en", "a"),   // exactly W → 1 chunk, no overhead
      (2L, words(129), "en", "b")))  // → chunks at offsets 0, 96: 128 + 33 tokens
    val out = Corpus.qDocsChunks(spark, dir)
      .select("source", "n_chunks", "chunk_tok", "overhead")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 128L, 0L), ("b", 2L, 161L, 32L)))
  }

  // ---- BM25 ---------------------------------------------------------------

  test("bm25: OR semantics, two-term doc outranks, absent doc excluded") {
    writeDocs(Seq(
      (1L, "a a b", "en", "s"),  // both query terms (a, b are the top-2 by tf)
      (2L, "a b", "en", "s"),
      (3L, "c", "en", "s")))     // neither term — must not appear
    val out = Corpus.qTextBm25(spark, dir)
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L) && out.map(_._2) == Seq(2L, 2L))
    val scores = Corpus.qTextBm25(spark, dir).select("score").as[Double].collect()
    assert(scores(0) > scores(1))
  }

  // ---- decontamination ----------------------------------------------------

  test("decontaminate: 8-gram hit drops the train doc; short docs survive") {
    val gram = (1 to 8).map(i => s"t$i").mkString(" ")
    writeDocs(Seq(
      (1L, s"eval $gram", "en", "src0"),        // eval doc carrying the 8-gram
      (2L, s"intro $gram outro", "en", "src1"), // train doc sharing it → dropped
      (3L, words(20, "x"), "en", "src1"),       // clean train doc → survives
      (4L, "tiny doc", "en", "src1")))          // <8 words → survives by definition
    val out = Corpus.qTextDecontaminate(spark, dir)
      .select("lang", "n_docs", "id_sum").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("en", 2L, 7L)))
  }

  // ---- alert FOR duration -------------------------------------------------

  test("alert_for: a 2-hour breach stays pending, a 3-hour breach fires once") {
    def hour(k: Long, errFirst: Boolean): Seq[(Long, Long, Long, String, Double)] = Seq(
      (k * 10 + 1, ns(t0 + k * 3600), 1L, if (errFirst) "error" else "click", 1.0),
      (k * 10 + 2, ns(t0 + k * 3600 + 60), 2L, "click", 1.0))
    // hours 0,1 breach (ratio 0.5); hour 2 clean; hours 3,4,5 breach; 6 clean
    writeEvents(Seq(0L, 1L, 3L, 4L, 5L).flatMap(hour(_, errFirst = true)) ++
      Seq(2L, 6L).flatMap(hour(_, errFirst = false)))
    val out = Ops.qTsAlertFor(spark, dir)
      .selectExpr("unix_micros(cast(start_h as timestamp))",
        "unix_micros(cast(end_h as timestamp))", "n_hours", "peak")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(((t0 + 3 * 3600) * 1000000L, (t0 + 5 * 3600) * 1000000L, 3L, 0.5)))
  }

  // ---- alert lifecycle: batch twin vs streaming for-machine ---------------

  test("alert transitions: fire at 3rd breach hour, resolve on clean; stream ≡ batch when sealed") {
    // hour → target sum (two events each): breach needs svr > 800
    // 0,1,2,3 breach (fire@2) | 4 clean (resolve) | 5,6 breach only (2 < forN,
    // resolves silently) | 7 clean | 8,9,10 breach (fire@10) | 11 clean
    // (resolve) | 12 breach + 13 clean: the unsealed tail the stream omits
    val plan = Map(0L -> 900.0, 1L -> 900.0, 2L -> 900.0, 3L -> 900.0, 4L -> 100.0,
      5L -> 900.0, 6L -> 900.0, 7L -> 100.0, 8L -> 900.0, 9L -> 900.0, 10L -> 900.0,
      11L -> 100.0, 12L -> 900.0, 13L -> 100.0)
    var id = 0L
    val rows = plan.toSeq.sortBy(_._1).flatMap { case (k, sv) =>
      Seq.tabulate(2) { i =>
        id += 1
        (id, ns(t0 + k * 3600 + 7 * id), 1L, "m", sv / 2)
      }
    }
    writeEvents(rows)
    val expected = Seq(("fire", 2L, 900.0), ("resolve", 4L, 100.0),
      ("fire", 10L, 900.0), ("resolve", 11L, 100.0))
      .map { case (k, h, sv) => ("m", k, (t0 + h * 3600) * 1000000L, sv) }

    val batch = Ops.valueTransitions(spark, dir, 800.0)
      .selectExpr("event_type", "kind", "unix_micros(cast(h as timestamp))", "mv")
      .as[(String, String, Long, Double)].collect().toSeq
    // batch sees the tail hours too, but they produce no transition
    assert(batch == expected, s"batch twin: $batch")

    for ((rdir, name) <- Seq(
        streaming.StreamReplay.rewriteOrdered(spark, dir, 3) -> "t_for",
        streaming.StreamReplay.rewriteJittered(spark, dir, 3, jitterMinutes = 4) -> "t_for_ooo")) {
      val got = streaming.StreamReplay.runToCompletion(spark,
          streaming.StatefulFor.forStream(
            streaming.StreamingQueries.eventsStream(spark, rdir)
              .withWatermark("ts", "10 minutes")).toDF(), name)
        .as[(String, String, Long, Double)].collect().toSeq
        .sortBy(t => (t._1, t._3))
      assert(got == expected, s"$name: $got")
    }
  }

  // ---- source interleave --------------------------------------------------

  test("interleave: positions cycle sources until the short source runs dry") {
    writeDocs(Seq(
      (1L, words(2), "en", "a"), (2L, words(2), "en", "a"), (3L, words(2), "en", "a"),
      (10L, words(2), "en", "b")))
    val out = Corpus.qDocsInterleave(spark, dir)
      .select("pos", "source", "doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 1L), (2L, "b", 10L), (3L, "a", 2L), (4L, "a", 3L)))
  }

  // ---- Zipf profile -------------------------------------------------------

  test("zipf: an exact power-law vocabulary regresses to slope -1") {
    // freq = 24 / rank for ranks 1..4 → ln(freq) = ln 24 − 1·ln(rank):
    // a perfect line, so the fit must return slope −1, intercept ln 24
    val text = (List.fill(24)("a") ++ List.fill(12)("b") ++
      List.fill(8)("c") ++ List.fill(6)("d")).mkString(" ")
    writeDocs(Seq((1L, text, "en", "s")))
    val out = Corpus.qTextZipf(spark, dir)
      .select("lang", "n_terms", "slope", "intercept")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(("en", 4L, -1.0)))
    assert(math.abs(out.head._4 - math.log(24)) < 1e-3)
  }

  // ---- epoch shuffle ------------------------------------------------------

  test("shuffle: dense positions, hash-ordered, reproducible") {
    writeDocs((1L to 30L).map(i => (i, words(3), "en", "s")))
    val a = Corpus.qDocsShuffle(spark, dir)
      .select("pos", "doc_id", "h").as[(Long, Long, Long)].collect().toSeq
    assert(a.map(_._1) == (1L to 30L))
    assert(a.map(_._3) == a.map(_._3).sorted)
    val b = Corpus.qDocsShuffle(spark, dir)
      .select("pos", "doc_id", "h").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  // ---- incident MTTR / MTBF -----------------------------------------------

  test("mttr: adjacent breach hours form one incident; MTBF spans onsets; lone incident has NULL MTBF") {
    // hours 0..9, 1 event/h except 10 events at hours 2,3 and 7:
    // mean 3.7 → breach at n=10 only → incidents {2,3} (len 2) and {7}
    val rows = (0 until 10).flatMap { h =>
      val n = if (h == 2 || h == 3 || h == 7) 10 else 1
      (0 until n).map(i => (h * 100L + i, ns(t0 + h * 3600L), 1L, "click", 1.0))
    }
    writeEvents(rows)
    val out = Ops.qTsMttr(spark, dir)
      .as[(String, Long, Double, Option[Double], Long)].collect().toSeq
    assert(out == Seq(("click", 2L, 1.5, Some(5.0), 2L)), s"got $out")
    // one breach island only → no onset gap to average
    writeEvents((0 until 10).flatMap { h =>
      val n = if (h == 2 || h == 3) 10 else 1
      (0 until n).map(i => (h * 100L + i, ns(t0 + h * 3600L), 1L, "click", 1.0))
    })
    val lone = Ops.qTsMttr(spark, dir)
      .as[(String, Long, Double, Option[Double], Long)].collect().toSeq
    assert(lone == Seq(("click", 1L, 2.0, None, 2L)), s"got $lone")
  }

  // ---- A/B z-test ---------------------------------------------------------

  test("ab ztest: counts partition the user set; degenerate pooled rate yields NULL z") {
    // 40 users, half purchase (by user id parity — independent of the
    // md5 variant assignment, so both variants see mixed conversions)
    writeEvents((1 to 40).map(u =>
      (u.toLong, ns(t0 + u), u.toLong, if (u % 2 == 0) "purchase" else "view", 1.0)))
    val r = Ops.qAbZtest(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].collect().head
    val (na, ca, nb, cb, ra, rb, z) = r
    assert(na + nb == 40 && ca + cb == 20, s"got $r")
    assert(ra >= 0 && ra <= 1 && rb >= 0 && rb <= 1)
    assert(z.isDefined && (z.get.sign == (ra - rb).sign || z.get == 0.0), s"got $r")
    // every user converts → pooled rate 1 → z defined NULL, never ±inf
    writeEvents((1 to 10).map(u => (u.toLong, ns(t0 + u), u.toLong, "purchase", 1.0)))
    val z1 = Ops.qAbZtest(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].collect().head._7
    assert(z1.isEmpty, s"degenerate z must be NULL, got $z1")
  }

  // ---- top-k churn --------------------------------------------------------

  test("topk churn: entered/exited/stayed partition the union of both heads") {
    // week1 (days 1-7): users 1,2,3 ranked 1..3; week4 (days 22-28):
    // users 2,3,4 — user 1 exits, user 4 enters, 2 and 3 stay
    val w4 = t0 + 21 * 86400L
    val rows =
      Seq((1L, 30.0), (2L, 20.0), (3L, 10.0)).zipWithIndex.map { case ((u, v), i) =>
        (i.toLong, ns(t0 + i * 60), u, "purchase", v) } ++
      Seq((2L, 30.0), (3L, 20.0), (4L, 10.0)).zipWithIndex.map { case ((u, v), i) =>
        (100L + i, ns(w4 + i * 60), u, "purchase", v) }
    writeEvents(rows)
    val out = Ops.qTsTopkChurn(spark, dir)
      .select("user_id", "status").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "exited"), (2L, "stayed"), (3L, "stayed"), (4L, "entered")), s"got $out")
  }

  // ---- time to convert ----------------------------------------------------

  test("time_to_convert: first purchase AFTER the first view; pre-view purchases never count") {
    writeEvents(Seq(
      (1L, ns(t0), 1L, "view", 1.0),
      (2L, ns(t0 + 100), 1L, "purchase", 1.0),
      (3L, ns(t0 + 50), 1L, "purchase", 1.0),   // earlier post-view purchase wins
      (4L, ns(t0 - 10), 2L, "purchase", 1.0),   // pre-view purchase: excluded
      (5L, ns(t0), 2L, "view", 1.0),
      (6L, ns(t0), 3L, "view", 1.0)))           // never converts
    val out = Ops.qTsTimeToConvert(spark, dir)
      .select("n_conv", "p50_s", "p90_s", "avg_s").as[(Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 50.0, 50.0, 50.0)), s"got $out")
  }

  test("fair share: waterline splits exactly — demands 1,2,3,10 at capacity 8 give w = 2.5") {
    // k = 2 (1 and 2 fully served), w = (8-3)/2 = 2.5; allocations sum to C
    writeEvents(
      Seq((1L, ns(t0), 1L, "click", 1.0)) ++
      (0 until 2).map(i => (10L + i, ns(t0 + i), 2L, "click", 1.0)) ++
      (0 until 3).map(i => (20L + i, ns(t0 + i), 3L, "click", 1.0)) ++
      (0 until 10).map(i => (30L + i, ns(t0 + i), 4L, "click", 1.0)))
    val r = Ops.qOpsFairShare(spark, dir)
      .select("user_id", "dem", "alloc", "satisfied")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 1.0, 1L), (2L, 2L, 2.0, 1L),
      (3L, 3L, 2.5, 0L), (4L, 10L, 2.5, 0L)), s"got $r")
    assert(r.map(_._3).sum == 8.0, "allocations must exhaust the capacity")
  }

  test("bfs distances: chain counts hops, disconnected states report -1") {
    // user 1 walks signup -> click -> purchase; user 2 only errors
    writeEvents(Seq(
      (1L, ns(t0), 1L, "signup", 1.0),
      (2L, ns(t0 + 60), 1L, "click", 1.0),
      (3L, ns(t0 + 120), 1L, "purchase", 1.0),
      (4L, ns(t0), 2L, "error", 1.0),
      (5L, ns(t0 + 60), 2L, "error", 1.0)))
    val r = Ops.qGraphBfsDist(spark, dir)
      .select("node", "hops").as[(String, Long)].collect().toMap
    assert(r == Map("signup" -> 0L, "click" -> 1L, "purchase" -> 2L, "error" -> -1L), s"got $r")
  }

  test("markov2: a deterministic chain squares to the two-step hop") {
    import graft.operators.Graphs
    // one user cycling signup -> click -> purchase -> signup ... :
    // P(signup->click)=1, P(click->purchase)=1 => P2(signup->purchase)=1
    val cyc = Seq("signup", "click", "purchase")
    val rows = (0 until 9).map(i => (i.toLong, ns(t0 + i * 60), 1L, cyc(i % 3), 1.0))
    writeEvents(rows)
    val r = Graphs.qGraphMarkov2(spark, dir)
      .select("src", "dst", "p2").as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r(("signup", "purchase")) == 1.0, s"got $r")
    assert(r(("click", "signup")) == 1.0 && r(("purchase", "click")) == 1.0, s"got $r")
    assert(r.size == 3, s"deterministic cycle has exactly 3 two-step arcs: $r")
  }

  test("link_predict: a path A-B-C scores exactly the endpoints; a triangle scores its own edges") {
    import graft.operators.Graphs
    // one user walking a -> b -> c: undirected path, candidates = {(a,c)}
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0), (2L, ns(t0 + 60), 1L, "b", 1.0),
      (3L, ns(t0 + 120), 1L, "c", 1.0)))
    val path = Graphs.qGraphLinkPredict(spark, dir)
      .select("a", "b", "cn", "jaccard", "adamic_adar", "is_edge")
      .as[(String, String, Long, Double, Double, Boolean)].collect().toSeq
    // cn=1 (via b, deg 2); jaccard = 1/(1+1-1) = 1; AA = 1/ln 2 = 1.442695
    assert(path == Seq(("a", "c", 1L, 1.0, 1.442695, false)), s"got $path")

    // walk a -> b -> c -> a: a triangle — every pair shares the third node
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0), (2L, ns(t0 + 60), 1L, "b", 1.0),
      (3L, ns(t0 + 120), 1L, "c", 1.0), (4L, ns(t0 + 180), 1L, "a", 1.0)))
    val tri = Graphs.qGraphLinkPredict(spark, dir)
      .select("a", "b", "cn", "jaccard", "is_edge")
      .as[(String, String, Long, Double, Boolean)].collect().toSeq
    // deg all 2 ⇒ jaccard = 1/(2+2-1); every candidate is already an edge
    assert(tri == Seq(("a", "b", 1L, 0.333333, true), ("a", "c", 1L, 0.333333, true),
      ("b", "c", 1L, 0.333333, true)), s"got $tri")
  }

  test("attribution_multi: U-shape splits 40/20/40 over 3 touches, 100 on a single touch; linear is 1/k") {
    import graft.operators.Graphs
    writeEvents(Seq(
      // user 1: click → view → signup → purchase  (k=3)
      (1L, ns(t0), 1L, "click", 1.0), (2L, ns(t0 + 60), 1L, "view", 1.0),
      (3L, ns(t0 + 120), 1L, "signup", 1.0), (4L, ns(t0 + 180), 1L, "purchase", 1.0),
      // user 2: click → purchase  (k=1)
      (5L, ns(t0), 2L, "click", 1.0), (6L, ns(t0 + 60), 2L, "purchase", 1.0)))
    val r = Graphs.qGraphAttributionMulti(spark, dir)
      .select("touch", "conversions", "linear_credit", "u_credit")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      ("click", 2L, 1.333333, 1.4),   // 1/3 + 1 ; 0.4 + 1.0
      ("signup", 1L, 0.333333, 0.4),  // newest of the three
      ("view", 1L, 0.333333, 0.2)),   // middle
      s"got $r")
  }

  test("ltv_cohort: staggered cohorts accumulate revenue by week offset; pre-signup purchases drop") {
    import graft.operators.TimeSeries
    writeEvents(Seq(
      (1L, ns(t0), 1L, "signup", 1.0),                         // cohort week 0
      (2L, ns(t0 + day), 1L, "purchase", 10.0),                // offset 0
      (3L, ns(t0 + 8 * day), 1L, "purchase", 20.0),            // offset 1
      (4L, ns(t0 + 7 * day), 2L, "signup", 1.0),               // cohort week 1
      (5L, ns(t0 + 3 * day), 2L, "purchase", 99.0),            // BEFORE signup week: dropped
      (6L, ns(t0 + 9 * day), 2L, "purchase", 5.0)))            // offset 0
    val r = TimeSeries.qUserLtvCohort(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 1L, 10.0, 10.0), (0L, 1L, 1L, 20.0, 30.0),
      (1L, 0L, 1L, 5.0, 5.0)), s"got $r")
  }

  test("sql_recursive_bfs: a signup→click→view chain walks to min-hop distances via the recursive CTE") {
    import graft.operators.Relational
    writeEvents(Seq(
      (1L, ns(t0), 1L, "signup", 1.0), (2L, ns(t0 + 60), 1L, "click", 1.0),
      (3L, ns(t0 + 120), 1L, "view", 1.0),
      // a second user provides a shortcut signup→view: min() must pick 1
      (4L, ns(t0), 2L, "signup", 1.0), (5L, ns(t0 + 60), 2L, "view", 1.0)))
    val r = Relational.qSqlRecursiveBfs(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("click", 1L), ("signup", 0L), ("view", 1L)), s"got $r")
  }

  test("attribution_markov: a corpus with no conversions guards every effect to NULL, not NaN") {
    import graft.operators.Graphs
    writeEvents(Seq(
      (1L, ns(t0), 1L, "click", 1.0), (2L, ns(t0 + 60), 1L, "view", 1.0),
      (3L, ns(t0), 2L, "view", 1.0)))
    val r = Graphs.qGraphAttributionMarkov(spark, dir)
      .as[(String, Double, Double, Option[Double], Option[Double])].collect().toSeq
    // p_base = 0 (no CONV anywhere) ⇒ removal effects and shares NULL
    assert(r.nonEmpty && r.forall(x => x._2 == 0.0 && x._4.isEmpty && x._5.isEmpty), s"got $r")
  }

  test("cuped: y = 2x gives theta 2, zero adjusted effect, full variance reduction; constant x guards NULL") {
    import graft.operators.Ops
    // user u: u purchases pre-cutoff, 2u post-cutoff — whatever the md5
    // split, cov = 2·var ⇒ θ = 2, Δ_cuped = 0 exactly, ρ² = 1
    def fixture(y: Long => Long, x: Long => Long) = {
      var id = 0L
      (1L to 12L).flatMap { u =>
        (1L to x(u)).map { _ => id += 1; (id, ns(t0 + u * 3600), u, "purchase", 1.0) } ++
          (1L to y(u)).map { _ => id += 1; (id, ns(t0 + 16 * day + u * 3600), u, "purchase", 1.0) }
      }
    }
    writeEvents(fixture(y = u => 2 * u, x = u => u))
    val r = Ops.qAbCuped(spark, dir)
      .as[(Long, Long, Double, Option[Double], Option[Double], Option[Double])].collect().head
    assert(r._1 + r._2 == 12L && r._4 == Some(2.0) && r._5 == Some(0.0) && r._6 == Some(1.0), s"got $r")

    writeEvents(fixture(y = u => u % 3 + 1, x = _ => 3L))
    val flat = Ops.qAbCuped(spark, dir)
      .as[(Long, Long, Double, Option[Double], Option[Double], Option[Double])].collect().head
    assert(flat._4.isEmpty && flat._5.isEmpty && flat._6.isEmpty)
  }

  test("attribution_markov: removal effects match the closed-form absorption drop; post-purchase touches excluded") {
    import graft.operators.Graphs
    writeEvents(Seq(
      // u1: click → view → CONV
      (1L, ns(t0), 1L, "click", 1.0), (2L, ns(t0 + 60), 1L, "view", 1.0),
      (3L, ns(t0 + 120), 1L, "purchase", 1.0),
      // u2: click → CONV (the trailing view is AFTER the purchase: excluded)
      (4L, ns(t0), 2L, "click", 1.0), (5L, ns(t0 + 60), 2L, "purchase", 1.0),
      (6L, ns(t0 + 120), 2L, "view", 1.0),
      // u3: view → NULL; u4: direct START → CONV
      (7L, ns(t0), 3L, "view", 1.0), (8L, ns(t0), 4L, "purchase", 1.0)))
    // chain: START→{click 2, view 1, CONV 1}/4; click→{view, CONV}/2;
    // view→{CONV, NULL}/2 ⇒ p(view)=.5, p(click)=.75, p(START)=.75.
    // remove click: p=.375 ⇒ re=.5; remove view: p=.5 ⇒ re=1/3;
    // shares .5/.833333 = .6 and .333333/.833333 = .4.
    val r = Graphs.qGraphAttributionMarkov(spark, dir)
      .as[(String, Double, Double, Option[Double], Option[Double])].collect().toSeq
    assert(r == Seq(
      ("click", 0.75, 0.375, Some(0.5), Some(0.6)),
      ("view", 0.75, 0.5, Some(0.333333), Some(0.4))), s"got $r")
  }

  test("cluster_coef: the triangle is cc=1 everywhere; a path has cc=0 at the middle, NULL at deg-1 tips") {
    import graft.operators.Graphs
    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0), (2L, ns(t0 + 60), 1L, "b", 1.0),
      (3L, ns(t0 + 120), 1L, "c", 1.0), (4L, ns(t0 + 180), 1L, "a", 1.0)))
    val tri = Graphs.qGraphClusterCoef(spark, dir)
      .select("node", "deg", "tri", "cc")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(tri == Seq(("a", 2L, 1L, Some(1.0)), ("b", 2L, 1L, Some(1.0)),
      ("c", 2L, 1L, Some(1.0))), s"got $tri")

    writeEvents(Seq(
      (1L, ns(t0), 1L, "a", 1.0), (2L, ns(t0 + 60), 1L, "b", 1.0),
      (3L, ns(t0 + 120), 1L, "c", 1.0)))
    val path = Graphs.qGraphClusterCoef(spark, dir)
      .select("node", "deg", "tri", "cc")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(path == Seq(("a", 1L, 0L, None), ("b", 2L, 0L, Some(0.0)),
      ("c", 1L, 0L, None)), s"got $path")
  }
}
