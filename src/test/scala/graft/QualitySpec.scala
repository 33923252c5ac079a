package graft

import graft.operators.Quality

/** Edge semantics of the corpus-quality tier via crafted documents /
  * embeddings fixtures in the sfDir shape. */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-quality"

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): Unit =
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  // ---- fertility ----------------------------------------------------------

  test("fertility: chars/token counts the separator chars ('ab cd' = 5 chars, 2 tokens)") {
    writeDocs(Seq(
      (1L, "ab cd", "en", "a"),     // 5 chars, 2 tokens
      (2L, "abcdefgh", "fr", "a"))) // 8 chars, 1 token
    val m = Quality.qTextFertility(spark, dir)
      .select("lang", "tokens", "chars", "chars_per_tok")
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m("en") == ((2L, 5L, 2.5)))
    assert(m("fr") == ((1L, 8L, 8.0)))
  }

  // ---- entropy ------------------------------------------------------------

  test("entropy: uniform two-word text gives H = ln 2 and norm 1; one word gives 0") {
    writeDocs(Seq(
      (1L, "x y x y", "en", "a"),  // 2+2 uniform ⇒ H = ln 2 ≈ 0.6931, norm 1.0
      (2L, "z z z z", "fr", "a"))) // single type ⇒ H = 0, norm NULL
    val m = Quality.qTextEntropy(spark, dir)
      .select("lang", "n_tokens", "vocab", "entropy")
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m("en") == ((4L, 2L, 0.6931)))
    assert(m("fr") == ((4L, 1L, 0.0)))
    val norm = Quality.qTextEntropy(spark, dir)
      .select("lang", "norm_entropy").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(norm("en").contains(1.0))
    assert(norm("fr").isEmpty, "single-type vocabulary must leave norm undefined, not divide by zero")
  }

  // ---- type-token ratio ---------------------------------------------------

  test("ttr: 'a a a b' scores 0.5; the source mean averages pre-rounded per-doc ratios") {
    writeDocs(Seq(
      (1L, "a a a b", "en", "s1"),     // 2 types / 4 tokens = 0.5
      (2L, "p q r", "en", "s1"),       // 3/3 = 1.0
      (3L, "m m m m m m", "en", "s2"))) // 1/6 = 0.1667 (rounded)
    val m = Quality.qTextTtr(spark, dir)
      .select("source", "n_docs", "avg_ttr", "min_ttr", "max_ttr")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(m("s1") == ((2L, 0.75, 0.5, 1.0)))
    assert(m("s2") == ((1L, 0.1667, 0.1667, 0.1667)))
  }

  // ---- held-out cross-entropy ---------------------------------------------

  test("heldout nll: add-one smoothing charges unseen words 1/(N+V) exactly") {
    writeDocs(Seq(
      (1L, "a a b", "en", "src1"),  // train: c(a)=2, c(b)=1, N=3, V=2
      (2L, "a c", "en", "src0")))   // eval: P(a)=3/5, P(c)=1/5
    val r = Quality.qTextHeldoutPpl(spark, dir)
      .select("doc_id", "n_tokens", "nll").as[(Long, Long, Double)].collect().toSeq
    // nll = -(round(ln .6, 6) + round(ln .2, 6))/2 = (0.510826 + 1.609438)/2
    assert(r == Seq((2L, 2L, 1.0601)), s"got $r")
  }

  // ---- embedding norm distribution ----------------------------------------

  test("norm dist: 3-4-5 vectors and the zero vector land exactly") {
    writeEmb(Seq(
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(0.0f, 0.0f), 1)))
    val m = Quality.qEmbNormDist(spark, dir)
      .select("label", "n", "p50", "mean_norm", "mn", "mx")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    assert(m(0L) == ((2L, 5.0, 5.0, 5.0, 5.0)))
    assert(m(1L) == ((1L, 0.0, 0.0, 0.0, 0.0)))
  }

  // ---- embedding dimension stats ------------------------------------------

  test("emb dim stats: a constant dimension is dead (var 0), a varying one is not") {
    // dim 0 constant 0.5 ⇒ variance 0 ⇒ dead; dim 1 alternates ±1 ⇒ var 1
    writeEmb(Seq(
      (1L, Array(0.5f, 1.0f), 0),
      (2L, Array(0.5f, -1.0f), 0),
      (3L, Array(0.5f, 1.0f), 1),
      (4L, Array(0.5f, -1.0f), 1)))
    val m = Quality.qEmbDimStats(spark, dir)
      .select("dim", "n", "mean", "variance", "dead")
      .as[(Long, Long, Double, Double, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(m(0L) == ((4L, 0.5, 0.0, 1L)))
    assert(m(1L) == ((4L, 0.0, 1.0, 0L)))
  }

  // ---- whitening ----------------------------------------------------------

  test("whiten: values {1,5} per dim standardize to ±1 under the ε-guarded variance") {
    writeEmb(Seq(
      (1L, Array(1.0f, 5.0f), 0),
      (2L, Array(5.0f, 1.0f), 0)))
    // mean 3, var 4 ⇒ w = ∓2/√4.000001 → ±1.0 at 6 dp
    val r = Quality.qEmbWhiten(spark, dir)
      .select("vec_id", "dim", "w").as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 0L, -1.0), (1L, 1L, 1.0), (2L, 0L, 1.0), (2L, 1L, -1.0)), s"got $r")
  }

  // ---- Gopher rules -------------------------------------------------------

  test("gopher_rules: each rule fails on exactly its crafted violator") {
    val good = (List.fill(30)("the dog and cat sat") :+ "of that have with").mkString(" ")
    writeDocs(Seq(
      (1L, good, "en", "s"),                                    // passes all
      // 8 words (mean wlen 3.125, 2 stops, all alpha) — only wc fails
      (2L, "the and dog cat sat bird fox hen", "en", "s"),
      // 62 words, Σlen 65 < 3·62 — only mean-wlen fails
      (3L, ("the of " + List.fill(60)("a").mkString(" ")), "en", "s"),
      // one 200-char '#' word: 2000 ≥ 155 words — only the symbol rule
      (4L, good + " " + "#" * 200, "en", "s"),
      // 120 numeric words of 122 (alpha 2/122), Σlen 425 ≥ 3·122 — only alpha
      (5L, (List.fill(60)("4242 777") :+ "the of").mkString(" "), "en", "s"),
      // 240 words, zero stop words — only the stop rule
      (6L, List.fill(60)("dog cat sat bird").mkString(" "), "en", "s")))
    val r = Quality.qDocsGopherRules(spark, dir)
      .select("n_docs", "fail_wc", "fail_wlen", "fail_sym", "fail_alpha", "fail_stop", "n_pass")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 1L, 1L, 1L, 1L, 1L, 1L)), s"got $r")
  }

  // ---- model-eval tier ------------------------------------------------------

  test("kappa: hand-worked 2x2 confusion; perfect agreement gives kappa 1") {
    // 'the a' votes en; 'der und' votes de — a fully controllable labeler
    writeDocs(Seq(
      (1L, "the a", "en", "s"), (2L, "the a", "en", "s"),   // en->en x2
      (3L, "der und", "de", "s"),                           // de->de
      (4L, "the a", "de", "s")))                            // de->en (miss)
    // n=4, agree=3, rows: de 2, en 2; cols: de 1, en 3; chance=2*1+2*3=8
    // po=0.75, pe=0.5, kappa=(4*3-8)/(16-8)=0.5
    val k = Quality.qEvalKappa(spark, dir)
      .select("n", "agree", "po", "pe", "kappa")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(k == ((4L, 3L, 0.75, 0.5, 0.5)), s"got $k")
    writeDocs(Seq((1L, "the a", "en", "s"), (2L, "der und", "de", "s")))
    val p = Quality.qEvalKappa(spark, dir)
      .select("kappa").as[Double].collect().head
    assert(p == 1.0, s"perfect agreement must give kappa 1, got $p")
  }

  test("prf: per-class precision/recall/F1 from the same hand confusion") {
    writeDocs(Seq(
      (1L, "the a", "en", "s"), (2L, "the a", "en", "s"),
      (3L, "der und", "de", "s"), (4L, "the a", "de", "s")))
    val rows = Quality.qEvalPrf(spark, dir)
      .select("label", "support", "predicted", "tp", "precision", "recall", "f1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).sortBy(_._1)
    // de: support 2, predicted 1, tp 1 -> p 1.0, r 0.5, f1 2/3
    assert(rows(0) == (("de", 2L, 1L, 1L, Some(1.0), Some(0.5), Some(0.666667))))
    // en: support 2, predicted 3, tp 2 -> p 2/3, r 1.0, f1 0.8
    assert(rows(1) == (("en", 2L, 3L, 2L, Some(0.666667), Some(1.0), Some(0.8))))
  }

  test("calibration: smoothed posterior bins and gaps match hand arithmetic") {
    writeDocs(Seq(
      // 'the a of' -> s_en=3, total=3: p=(3+1)/(3+4)=4/7=0.571429, bin 5
      (1L, "the a of", "en", "s"),
      (2L, "the a of", "de", "s"),
      // 'der und' -> s_de=2: p=1/6=0.166667, bin 1
      (3L, "der und", "de", "s"),
      // no votes -> p=0.25 prior, bin 2
      (4L, "xyzzy qwerty", "zh", "s")))
    val rows = Quality.qEvalCalibration(spark, dir)
      .select("bin", "n", "n_pos", "mean_p", "pos_rate", "gap")
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 1L, 0L, 0.166667, 0.0, -0.166667),
      (2L, 1L, 0L, 0.25, 0.0, -0.25),
      (5L, 2L, 1L, 0.571429, 0.5, -0.071429)), s"got ${rows.toSeq}")
  }

  test("auc: rank-sum AUC equals the brute-force pair probability with ties") {
    // scores are n_chars = text lengths; pos = lang 'en'
    writeDocs(Seq(
      (1L, "aaaa", "en", "s"),      // pos score 4
      (2L, "aa", "en", "s"),        // pos score 2
      (3L, "aa", "de", "s"),        // neg score 2 (tie with pos)
      (4L, "a", "de", "s"),         // neg score 1
      (5L, "aaaaa", "de", "s")))    // neg score 5
    // pairs (pos, neg): (4,2)+ (4,1)+ (4,5)- (2,2)= (2,1)+ (2,5)-
    // AUC = (3 + 0.5*1) / 6 = 0.583333
    val a = Quality.qEvalAuc(spark, dir)
      .select("n_pos", "n_neg", "auc")
      .as[(Long, Long, Double)].collect().head
    assert(a == ((2L, 3L, 0.583333)), s"got $a")
  }
}
