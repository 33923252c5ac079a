package graft

import graft.operators.Token

/** Hand-worked pins for the tokenizer-design tier (round 15) over a
  * crafted corpus (same fixture device as CorpusSpec: parquet written
  * into a temp dir shaped like a testdata sfDir). */
class TokenSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-token"

  private def writeDocs(rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("bpe pairs: counts every in-word adjacent char pair; single chars drop") {
    writeDocs(Seq(
      (1L, "aaa ab", "en", "s1"), // aaa -> aa, aa ; ab -> ab
      (2L, "x aa", "en", "s1"))) // x too short; aa -> aa
    val got = Token.qTokBpePairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("aa", 3L), ("ab", 1L)), s"got $got")
  }

  test("fertility: pieces = ceil(len/4), ratio one rounded divide") {
    // en: words len 1,4,5,8 -> pieces 1,1,2,2 = 6 over 4 words = 1.5
    writeDocs(Seq(
      (1L, "a bbbb ccccc dddddddd", "en", "s1"),
      (2L, "zz", "fr", "s1"))) // fr: one word len 2 -> 1 piece
    val got = Token.qTokFertility(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(got == List(("en", 4L, 6L, 1.5), ("fr", 1L, 1L, 1.0)), s"got $got")
  }

  test("vocab coverage: occurrences outside the top-k vocabulary are OOV mass") {
    // "a" x3 and "b" x2 dominate; with the query's top-1000 everything is
    // in-vocab here, so pin the structural columns instead via a rare word
    writeDocs(Seq(
      (1L, "a a a b", "s1lang", "s1"),
      (2L, "b rare", "s1lang", "s2")))
    val got = Token.qTokVocabCoverage(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    // vocab = {a, b, rare} (3 distinct <= 1000): zero OOV everywhere
    assert(got == List(("s1", 4L, 4L, 0.0), ("s2", 2L, 2L, 0.0)), s"got $got")
  }

  test("byte ratio: multibyte text shows bytes_per_char > 1") {
    writeDocs(Seq(
      (1L, "abcd", "en", "s1"), // 4 bytes / 4 chars
      (2L, "ééé", "fr", "s1"))) // 6 bytes / 3 chars in UTF-8
    val got = Token.qTokByteRatio(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(got == List(("en", 4L, 4L, 1.0), ("fr", 6L, 3L, 2.0)), s"got $got")
  }

  test("alphabet coverage: chars outside the top-64 alphabet count as fallback") {
    // 70 distinct non-ASCII chars once each (xx) plus 'a' x100 (en): the
    // alphabet takes 'a' + the 63 SMALLEST singles (count DESC, char ASC
    // is a total order), so exactly 7 of xx's 70 occurrences fall back
    val singles = (160 to 229).map(_.toChar).mkString("")
    writeDocs(Seq(
      (1L, "a" * 100, "en", "s1"),
      (2L, singles, "xx", "s1")))
    val got = Token.qTokAlphabetCoverage(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("en") == ((100L, 100L, 0.0)), s"got $got")
    assert(got("xx") == ((70L, 63L, 0.1)), s"got $got")
  }
}
