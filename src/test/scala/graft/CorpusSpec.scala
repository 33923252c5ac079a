package graft

import graft.operators.{Corpus, TimeSeries}

/** Edge semantics of the corpus-management tier (Corpus.scala) and the
  * round-8 time-series diagnostics, exercised through the REAL catalog
  * queries over crafted fixture tables (same device as CatalogFixtureSpec:
  * parquet written into a temp dir shaped like a testdata sfDir;
  * `events.ts` as raw ns LONG per the §1.3 recipe). */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-corpus"

  /** doc with exactly `tok` whitespace tokens */
  private def words(tok: Int): String = List.fill(tok)("w").mkString(" ")

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def ns(sec: Long): Long = sec * 1000000000L
  private val day = 1704067200L // 2024-01-01 00:00:00 UTC

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  // ---- greedy bin packing -------------------------------------------------

  test("pack_greedy: exact fit stays, overflow opens a bin, oversized doc gets its own") {
    writeDocs(Seq(
      (1L, words(600), "en", "a"),  // bin 0 (fill 600)
      (2L, words(424), "en", "a"),  // bin 0 (fill 1024 — exact capacity fits)
      (3L, words(1), "en", "a"),    // bin 1 (1024+1 overflows)
      (4L, words(2000), "en", "a"), // bin 2 (oversized → own bin)
      (5L, words(10), "en", "a"),   // bin 3 (2000+10 > C always after oversized)
      (6L, words(3000), "fr", "b")  // fr bin 0: FIRST doc oversized keeps bin 0
    ))
    val out = Corpus.qDocsPackGreedy(spark, dir)
      .select("lang", "bin", "n_docs", "tokens").as[(String, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("en", 0L, 2L, 1024L), ("en", 1L, 1L, 1L), ("en", 2L, 1L, 2000L),
      ("en", 3L, 1L, 10L), ("fr", 0L, 1L, 3000L)))
  }

  // ---- concat-and-chunk packing ------------------------------------------

  test("seq_pack: spans cross cuts, n_starts counts openers, tail fill is the remainder") {
    writeDocs(Seq(
      (1L, words(300), "en", "a"), // tokens [0,300) → seq 0
      (2L, words(300), "en", "a"), // [300,600) → seqs 0-1
      (3L, words(700), "en", "a")  // [600,1300) → seqs 1-2
    ))
    val out = Corpus.qDocsSeqPack(spark, dir)
      .select("seq_id", "n_docs", "n_starts", "fill").as[(Long, Long, Long, Long)]
      .collect().toSeq
    // seq 0: docs 1,2 both START at offsets < 512; seq 1: doc2 spills in, doc3 starts
    assert(out == Seq((0L, 2L, 2L, 512L), (1L, 2L, 1L, 512L), (2L, 1L, 0L, 276L)))
  }

  // ---- profiling ----------------------------------------------------------

  test("profile_stats: null column values drop from n_nonnull and n_distinct") {
    writeDocs(Seq((1L, "aa", "en", "s1"), (2L, "bb", "en", "s2"), (3L, "cc", "fr", "s1")))
    // null out one lang value post-hoc: rewrite with a null row
    Seq((1L, "aa", "en", "s1", 2L), (2L, "bb", null.asInstanceOf[String], "s2", 2L),
      (3L, "cc", "fr", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Corpus.qProfileStats(spark, dir)
      .select("col", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("lang") == ("lang", 3L, 2L, 2L, "en", "fr"))
    assert(rows("doc_id") == ("doc_id", 3L, 3L, 3L, "1", "3"))
    assert(rows("source")._4 == 2L) // s1, s2
  }

  // ---- blocked edit distance ---------------------------------------------

  test("editdist: 32-char prefix cap ignores later differences; pairs stay in-lang") {
    val p32 = "x" * 32
    writeDocs(Seq(
      (1L, p32 + "SAME-PREFIX-DIFFERENT-TAIL-AAA", "en", "a"),
      (2L, p32 + "completely different afterwards", "en", "a"),
      (3L, "abcd", "fr", "a"),
      (4L, "abXd", "fr", "a")
    ))
    val out = Corpus.qTextEditdist(spark, dir)
      .select("id_a", "id_b", "dist", "sim").as[(Long, Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq((1L, 2L, 0L, 1.0), (3L, 4L, 1L, 0.75)))
  }

  // ---- inverted-index search ---------------------------------------------

  test("text_search: AND semantics — docs with only one query term are excluded") {
    writeDocs(Seq(
      (1L, "alpha alpha alpha beta", "en", "a"), // both terms → hit, score 4
      (2L, "alpha alpha", "en", "a"),            // only alpha → excluded
      (3L, "beta beta beta", "en", "a"),         // only beta → excluded
      (4L, "alpha beta other", "en", "a")        // both → hit, score 2
    ))
    val out = Corpus.qTextSearch(spark, dir)
      .select("doc_id", "tf1", "tf2", "score").as[(Long, Long, Long, Long)]
      .collect().toSeq
    // global counts: alpha 6 > beta 5 → q1 = alpha
    assert(out == Seq((1L, 3L, 1L, 4L), (4L, 1L, 1L, 2L)))
  }

  // ---- absent-series detection -------------------------------------------

  test("ts_absent: last_seen exactly at the cutoff midnight is NOT absent (strict <)") {
    writeEvents(Seq(
      (1L, ns(day), 1L, "click", 1.0),               // day 1, then silent → absent
      (2L, ns(day + 86400 - 1), 2L, "click", 1.0),   // 1ns before midnight → absent
      (3L, ns(day + 86400), 3L, "click", 1.0),       // exactly at cutoff → NOT absent
      (4L, ns(day + 86400 + 7200), 4L, "click", 1.0) // inside last day → NOT absent
    ))
    val out = TimeSeries.qTsAbsent(spark, dir)
      .select("user_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  // ---- CUSUM --------------------------------------------------------------

  test("ts_cusum: resets at zero, tracks max, counts alarms above mu/2") {
    // one event per hour, values 10,10,40,10 → mu 17.5, h 8.75
    // pos: 0, 0, 22.5 (alarm), 15 (alarm)
    writeEvents(Seq(
      (1L, ns(day), 1L, "click", 10.0),
      (2L, ns(day + 3600), 1L, "click", 10.0),
      (3L, ns(day + 7200), 1L, "click", 40.0),
      (4L, ns(day + 10800), 1L, "click", 10.0)
    ))
    val out = TimeSeries.qTsCusum(spark, dir)
      .select("n_hours", "mu", "cusum_end", "cusum_max", "n_alarms")
      .as[(Long, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq((4L, 17.5, 15.0, 22.5, 2L)))
  }

  // ---- shard routing ------------------------------------------------------

  test("shard_assign: conserves docs and tokens, skew is tokens*S/total") {
    val docs = (1L to 200L).map(i => (i, words((i % 7).toInt + 1), "en", s"s${i % 3}"))
    writeDocs(docs)
    val out = Corpus.qDocsShardAssign(spark, dir)
      .select("shard", "n_docs", "tokens", "n_sources", "skew")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == out.map(_._1).sorted)
    assert(out.forall { case (sh, _, _, _, _) => sh >= 0 && sh < 16 })
    assert(out.map(_._2).sum == 200L)
    val totalTok = docs.map { case (i, _, _, _) => (i % 7) + 1 }.sum
    assert(out.map(_._3).sum == totalTok)
    out.foreach { case (_, _, tok, nsrc, skew) =>
      assert(nsrc >= 1 && nsrc <= 3)
      assert(math.abs(skew - tok * 16.0 / totalTok) <= 5.001e-5) // 4-dp round
    }
    // deterministic routing: a rerun yields the identical report
    val again = Corpus.qDocsShardAssign(spark, dir)
      .select("shard", "n_docs", "tokens", "n_sources", "skew")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(again == out)
  }

  // ---- provenance overlap -------------------------------------------------

  test("source_overlap: counts distinct shared prefixes once per pair, a<b ordered") {
    writeDocs(Seq(
      // fingerprint = first 16 chars; pad to make prefixes well-defined
      (1L, "aaaaaaaaaaaaaaaa tail one", "en", "s1"),
      (2L, "aaaaaaaaaaaaaaaa tail two", "en", "s2"),   // s1~s2 share fp a
      (3L, "aaaaaaaaaaaaaaaa tail thr", "en", "s2"),   // duplicate (fp, s2) collapses
      (4L, "bbbbbbbbbbbbbbbb tail", "en", "s1"),
      (5L, "bbbbbbbbbbbbbbbb tail", "en", "s3"),       // s1~s3 share fp b
      (6L, "cccccccccccccccc only", "en", "s3")))      // unshared fp drops out
    val out = Corpus.qSourceOverlap(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("s1", "s2", 1L), ("s1", "s3", 1L)))
  }

  // ---- train/val/test split -----------------------------------------------

  test("docs_split: disjoint, exhaustive, deterministic 90/5/5 hash split") {
    val docs = (1L to 400L).map(i => (i, words((i % 5).toInt + 1), if (i % 2 == 0) "en" else "fr", "s"))
    writeDocs(docs)
    val out = Corpus.qDocsSplit(spark, dir)
      .select("split", "lang", "n_docs", "tokens").as[(String, String, Long, Long)]
      .collect().toSeq
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(out.map(_._3).sum == 400L) // exhaustive: every doc in exactly one split
    val totalTok = docs.map { case (i, _, _, _) => (i % 5) + 1 }.sum
    assert(out.map(_._4).sum == totalTok)
    val bySplit = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // hash split at n=400: train ≈ 360 — loose band, but catches a broken mod
    assert(bySplit("train") > 300L && bySplit("train") < 400L, bySplit.toString)
    assert(Corpus.qDocsSplit(spark, dir).collect().toSeq ==
      Corpus.qDocsSplit(spark, dir).collect().toSeq) // deterministic
  }

  // ---- length distribution ------------------------------------------------

  test("docs_length_dist: interpolated percentiles on a known token profile") {
    // tokens 1..100 in one source: p50 = 50.5, p90 = 90.1, p99 = 99.01
    writeDocs((1L to 100L).map(i => (i, words(i.toInt), "en", "s1")))
    val out = Corpus.qDocsLengthDist(spark, dir)
      .select("source", "n_docs", "p50", "p90", "p99", "mx")
      .as[(String, Long, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq(("s1", 100L, 50.5, 90.1, 99.01, 100L)))
  }

  // ---- near-dup provenance ------------------------------------------------

  test("dedup_source_overlap: cross-source candidates only, pair order normalized") {
    val t1 = "alpha beta gamma delta epsilon zeta"
    writeDocs(Seq(
      (1L, t1, "en", "s1"),
      (2L, t1, "en", "s2"),          // (1,2) cross: s1~s2
      (3L, t1, "en", "s1"),          // (1,3) same source drops; (2,3) → s1~s2
      (4L, "totally different words here now", "en", "s3")))
    val out = graft.operators.LlmScale.qDedupSourceOverlap(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("s1", "s2", 2L)))
  }

  // ---- seasonal decomposition --------------------------------------------

  test("ts_seasonal_decomp: constant series decomposes to exactly-zero seasonal; edge hours drop") {
    // 48 hourly events, 1 per hour → cnt ≡ 1; full 25-hour windows exist
    // only for hours 12..35 → 24 rows, each bit-exactly 0.0
    writeEvents((0 until 48).map(i =>
      (i.toLong, ns(day + i * 3600L), 1L, "click", 1.0)))
    val out = TimeSeries.qTsSeasonalDecomp(spark, dir)
      .select("hod", "n", "seasonal").as[(Long, Long, Double)].collect().toSeq
    assert(out.size == 24)
    assert(out.forall { case (_, n, sea) => n == 1L && sea == 0.0 })
    assert(out.map(_._1).sorted == (0L until 24L))
  }

  // ---- cross-document repeated 8-grams ------------------------------------

  test("substring_dup: an 8-word span shared by two docs is reported; a 7-word overlap is not") {
    val span8 = "a b c d e f g h"            // 8 shared words
    val span7 = "p q r s t u v"              // only 7 shared words
    writeDocs(Seq(
      (1L, s"x1 $span8 y1", "en", "s"),
      (2L, s"x2 x3 $span8", "en", "s"),
      (3L, s"$span7 k1", "en", "s"),
      (4L, s"$span7 k2", "en", "s")))
    val out = Corpus.qTextSubstringDup(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq((span8, 2L, 2L)), s"got $out")
  }

  test("substring_dup: three copies of one doc count n_docs=3 and every gram once per doc") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens → 3 grams per doc
    writeDocs(Seq((1L, text, "en", "s"), (2L, text, "en", "s"), (3L, text, "en", "s")))
    val out = Corpus.qTextSubstringDup(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out.size == 3 && out.forall { case (_, nd, no) => nd == 3L && no == 3L }, s"got $out")
  }
}
