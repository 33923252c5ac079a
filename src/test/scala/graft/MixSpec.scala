package graft

import graft.operators.Mix

/** Hand-worked pins for the data-mixing tier (round 16) over a crafted
  * corpus (the TokenSpec fixture device: parquet written into a temp dir
  * shaped like a testdata sfDir). */
class MixSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-mix"

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("temperature: α=0.3 lifts the low-resource language, shares renormalize to 1") {
    // en: 9 tokens, fr: 1 token → p_raw (0.9, 0.1); w = p^0.3 rounded 9dp;
    // hand-worked: 0.9^0.3 = 0.968886637, 0.1^0.3 = 0.501187234
    writeDocs(Seq(
      (1L, "a b c d e f g h i", "en", "s1"),
      (2L, "x", "fr", "s1")))
    val got = Mix.qMixTemperature(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toList
    val wEn = 0.968886637; val wFr = 0.501187234
    val pEn = BigDecimal(wEn / (wEn + wFr)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pFr = BigDecimal(wFr / (wEn + wFr)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(g => (g._1, g._2)) == List(("en", 9L), ("fr", 1L)), s"got $got")
    assert(got(0)._3 == 0.9 && got(1)._3 == 0.1, s"raw shares: $got")
    assert(got(0)._4 == pEn && got(1)._4 == pFr, s"temp shares: $got vs ($pEn, $pFr)")
    assert(got(1)._5 > 1.0 && got(0)._5 < 1.0,
      s"α<1 must boost the small language and damp the big one: $got")
    assert(math.abs(got(0)._4 + got(1)._4 - 1.0) < 1e-9, "shares must renormalize")
  }

  test("epochs: a tiny source hits the 4-epoch cap; a dominant one does not") {
    // s_small: 1 token of 100 → α=0.5 share lifts it far above 4 epochs
    writeDocs(Seq(
      (1L, Seq.fill(99)("w").mkString(" "), "en", "s_big"),
      (2L, "x", "en", "s_small")))
    val got = Mix.qMixEpochs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(5))).toList
    assert(got == List(("s_big", 99L, 0L), ("s_small", 1L, 1L)),
      s"cap flags wrong: $got")
    val full = Mix.qMixEpochs(spark, dir).collect()
    val small = full.find(_.getString(0) == "s_small").get
    assert(small.getDouble(6) == 4.0, s"capped alloc must be 4×tokens: ${small.getDouble(6)}")
    val big = full.find(_.getString(0) == "s_big").get
    assert(big.getDouble(4) < 4.0 && big.getDouble(4) > 0.0, s"big epochs sane: ${big.getDouble(4)}")
  }

  test("domain matrix: shares sum to 1 along both margins; independent grid has lift 1") {
    // 2 sources × 2 langs, token mass proportional product (independent):
    // s1/en 6, s1/fr 3, s2/en 2, s2/fr 1 → lift = 1 everywhere
    writeDocs(Seq(
      (1L, "a b c d e f", "en", "s1"),
      (2L, "a b c", "fr", "s1"),
      (3L, "a b", "en", "s2"),
      (4L, "a", "fr", "s2")))
    val got = Mix.qMixDomainMatrix(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got.map(g => (g._1, g._2, g._3)) ==
      List(("s1", "en", 6L), ("s1", "fr", 3L), ("s2", "en", 2L), ("s2", "fr", 1L)))
    assert(got.forall(_._6 == 1.0), s"independent grid must have lift 1: $got")
    assert(got.filter(_._1 == "s1").map(_._4).sum == 1.0, "row shares sum to 1")
    assert(got.filter(_._2 == "en").map(_._5).sum == 1.0, "col shares sum to 1")
  }

  test("hhi: uniform shares give hhi = 1/n and eff_domains = n; a monopoly gives 1") {
    writeDocs(Seq(
      (1L, "a b", "en", "s1"), (2L, "a b", "en", "s2"),
      (3L, "a b", "en", "s3"), (4L, "a b", "en", "s4")))
    val got = Mix.qMixHhi(spark, dir).collect().head
    assert(got.getLong(0) == 4L && got.getDouble(1) == 0.25 &&
      got.getDouble(2) == 4.0 && got.getDouble(3) == 0.25, s"got $got")
    writeDocs(Seq((1L, "a b c", "en", "only")))
    val mono = Mix.qMixHhi(spark, dir).collect().head
    assert(mono.getLong(0) == 1L && mono.getDouble(1) == 1.0 && mono.getDouble(2) == 1.0)
  }

  test("dedup discount: exact dup mass drops per source; first occurrence keeps") {
    // s1: two copies of a 4-token text + one unique 2-token doc →
    // raw 10, unique 6; s2: one copy of the SAME text (dup of doc 1,
    // min doc_id keeps in s1) → raw 4, unique 0
    writeDocs(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c d", "en", "s1"),
      (3L, "e f", "en", "s1"),
      (4L, "a b c d", "en", "s2")))
    val got = Mix.qMixDedupDiscount(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toList
    assert(got == List(("s1", 3L, 10L, 6L, 0.6), ("s2", 1L, 4L, 0L, 0.0)), s"got $got")
  }
}
