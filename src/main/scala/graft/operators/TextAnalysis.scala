package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis operators for corpus curation: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All per-document projections — codegen'd expressions, no UDFs, no
  * shuffle — so they compose freely into scan→score→filter pipelines that
  * stream through a 100 TB corpus at parquet-scan speed.
  */
object TextAnalysis {

  /** Stopword tables for the n-gram/stopword-voting language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"))

  /** Adds `pred_lang` + one `s_<lang>` vote column per language.
    * Ties break alphabetically (deterministic). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val base = df.withColumn("__tok", expr(s"array_distinct(split($textCol, ' '))"))
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.foldLeft(base) { (acc, l) =>
      acc.withColumn(s"s_$l",
        size(array_intersect(col("__tok"), array(stopwords(l).map(lit): _*))).cast("long"))
    }
    val m = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.init.foldRight(lit(langs.last)) { (l, el) =>
      when(col(s"s_$l") === m, l).otherwise(el)
    }
    scored.withColumn("pred_lang", pred).drop("__tok")
  }

  /** Adds n_tok / avg_wlen / stop_ratio / score quality columns. The score
    * is a linear proxy (length, word shape, stopword density) — cheap, and
    * monotone enough to threshold-filter junk before expensive stages. */
  def quality(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("n_tok", size(col("__w")).cast("long"))
      .withColumn("avg_wlen",
        expr("aggregate(__w, 0, (acc, x) -> acc + length(x))").cast("double") / col("n_tok"))
      .withColumn("stop_ratio",
        expr("size(filter(__w, x -> x in ('the', 'a', 'of', 'and', 'to')))").cast("double") / col("n_tok"))
      .withColumn("score",
        col("stop_ratio") * 0.3 + col("avg_wlen") * 0.05 + length(col(textCol)) * 0.0005)
      .drop("__w")

  /** Within-document repetition signals (the Gopher-style boilerplate
    * filters): type-token ratio (distinct/total tokens) and the
    * most-frequent-token share. Pure per-row HOF expressions — no
    * token-level explode/shuffle; the whole filter is a codegen'd
    * projection, linear at any corpus size. The top-count is O(d·n) per
    * row in distinct tokens d — fine for natural documents, where d
    * saturates long before n. */
  def repetition(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("n_tok", size(col("__w")).cast("long"))
      .withColumn("distinct_tok", expr("size(array_distinct(__w))").cast("long"))
      .withColumn("top_cnt", expr(
        "array_max(transform(array_distinct(__w), x -> size(filter(__w, y -> y = x))))").cast("long"))
      .withColumn("ttr", col("distinct_tok").cast("double") / col("n_tok"))
      .withColumn("top_ratio", col("top_cnt").cast("double") / col("n_tok"))
      .drop("__w")

  /** Whitespace token count + a chars-per-token BPE-ish estimate
    * (⌈len/4⌉ per word, min 1 — the classic "~4 chars per BPE token"). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("ws_tokens", size(col("__w")).cast("long"))
      .withColumn("bpe_tokens", expr(
        "aggregate(__w, 0L, (acc, x) -> acc + greatest(1L, cast(ceil(length(x) / 4.0) as bigint)))"))
      .drop("__w")

  /** Rolling-hash document fingerprint (winnowing): polynomial rolling hash
    * over every `window`-char substring, then the per-document minimum set
    * (bottom-k of distinct window hashes). Identical documents share all
    * fingerprints; documents sharing long runs share some. Pure expression:
    * each window hash is an independent fold, so the "rolling" computation
    * parallelizes per position instead of threading sequential state. */
  def rollingFingerprint(df: DataFrame, textCol: String,
                         window: Int = 16, k: Int = 4): DataFrame =
    df.withColumn("fingerprints", expr(
      s"""slice(array_sort(array_distinct(transform(
         |  sequence(1, greatest(1, length($textCol) - ${window - 1})),
         |  i -> aggregate(sequence(0, ${window - 1}),
         |                 0L,
         |                 (acc, j) -> (acc * 31 + coalesce(ascii(substr($textCol, i + j, 1)), 0)) % 1000000007)
         |))), 1, $k)""".stripMargin))
}
