package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mining tier over the documents/embeddings tables — the
  * text-statistics and fingerprinting operators a training-data
  * pipeline runs between ingest and dedup: corpus-level bigram
  * vocabularies (phrase mining / tokenizer-merge candidates),
  * winnowing fingerprints (Schleimer et al. 2003's local algorithm —
  * the plagiarism-detection complement to MinHash: guarantees any
  * shared run of ≥ t+w-1 tokens surfaces a shared fingerprint),
  * per-source duplication-rate reporting, and higher-order array
  * functions over embeddings (the codegen'd transform/filter/aggregate
  * family — no UDF, no collect).
  *
  * Determinism (SURVEY §2.0): tokenization is the catalog's shared
  * space-split + non-empty filter; n-gram hashes ride the shared
  * 60-bit md5 device ([[Dedup.h60]]); float embeddings round per
  * ELEMENT into exact micro-unit longs before any sum, so aggregates
  * are order-free; every query ends in a total ORDER BY.
  *
  * Scale notes: bigram counting is explode → hash-aggregate (map-side
  * partial combine keeps shuffle at distinct-bigram width, not token
  * volume). Winnowing is per-document local work (one projection, no
  * shuffle) until the fingerprint self-join — which is the standard
  * LSH-bucket join on fp, skew-bounded because each fingerprint is a
  * 60-bit hash min over a content window. The array HOF query is a
  * pure narrow projection: one scan, zero shuffles before the sort.
  */
object Mining {
  type Q = (SparkSession, String) => DataFrame

  /** Non-empty space-split tokens of `text` as column `tk`. */
  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tk", expr("filter(split(text, ' '), x -> x != '')"))

  /** Top-30 word bigrams across the corpus — the phrase-vocabulary
    * report (tokenizer-merge candidates, collocation mining). Bigram
    * arrays build with zip_with over two slices (codegen'd, no UDF),
    * then one explode + hash aggregate; rank is total-ordered
    * (count desc, bigram asc). */
  val qDocsBigrams: Q = (s, d) =>
    withTokens(Tables.documents(s, d))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1), (a, b) -> concat(a, ' ', b))"))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
      // TakeOrdered head FIRST (distributed top-k over the vocab), THEN
      // rank the surviving 30 rows — never a global window over the
      // full bigram vocabulary
      .orderBy(desc("cnt"), asc("bg")).limit(30)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("cnt"), asc("bg"))).cast("long"))
      .select("rk", "bg", "cnt")
      .orderBy("rk")

  /** Winnowing near-dup pairs: token-3-gram hashes per document, each
    * w=4 window keeps its minimum hash as a fingerprint, distinct
    * fingerprints join doc-to-doc — top-50 pairs by shared-fingerprint
    * count. Guarantee: any shared token run of ≥ 3+4-1 = 6 tokens
    * yields at least one shared fingerprint (the winnowing paper's
    * correctness property), which MinHash's random sampling cannot
    * promise. All per-doc work is one codegen'd projection; the only
    * shuffle is the fp-bucket self-join. */
  val qDocsWinnow: Q = (s, d) => {
    val fps = withTokens(Tables.documents(s, d))
      .filter(size(col("tk")) >= 6)
      .withColumn("h", expr(
        s"transform(sequence(1, size(tk)-2), i -> ${
          Dedup.h60("'wn'", "concat(element_at(tk,i), ' ', element_at(tk,i+1), ' ', element_at(tk,i+2))")})"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(h)-3), i -> array_min(slice(h, i, 4))))"))
        .as("fp"))
    val a = fps.select(col("doc_id").as("d1"), col("fp"))
    val b = fps.select(col("doc_id").as("d2"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
      .orderBy(desc("shared"), asc("d1"), asc("d2"))
      .limit(50)
  }

  /** Duplication-rate report per source: how many docs share their
    * exact text fingerprint with at least one other doc anywhere in
    * the corpus — the first number a corpus audit asks for, and the
    * before/after metric around any dedup pass. Two hash aggregates
    * (fingerprint counts, then per-source rollup); the fp join is
    * broadcast-size (distinct duplicated fps ≪ corpus). */
  val qDocsDupRate: Q = (s, d) => {
    val fp = Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("fp"))
    val counts = fp.groupBy("fp").agg(count(lit(1)).as("n"))
    fp.join(counts, Seq("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        Num.roundd(col("n_dup").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"))
      .orderBy("source")
  }

  /** Higher-order array functions over embeddings — size / filter /
    * transform / aggregate as one codegen'd narrow projection (the
    * no-UDF contract for vector columns): dimension, positive-dim
    * count, L2 norm and ReLU mass. Each float rounds per element into
    * an exact micro-unit long BEFORE any sum, so both engines aggregate
    * identical integers in any order. */
  val qEmbArrayHof: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        expr("cast(size(filter(v, x -> x > 0d)) as bigint)").as("n_pos"),
        expr("transform(v, x -> if(x < 0, -floor(abs(x)*1000000 + 0.5d), floor(abs(x)*1000000 + 0.5d)))")
          .as("m"))
      .select(col("vec_id"), col("dim"), col("n_pos"),
        Num.roundd(sqrt(expr("aggregate(m, 0L, (a, x) -> a + x*x)").cast("double")) / 1e6, 6)
          .as("l2"),
        Num.roundd(expr("aggregate(m, 0L, (a, x) -> a + greatest(x, 0L))").cast("double") / 1e6, 6)
          .as("relu_sum"))
      .orderBy("vec_id")

  // ---- catalog ------------------------------------------------------------

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_docs_bigrams", qDocsBigrams, Some(
      "WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x != '') tk FROM documents), " +
        "b AS (SELECT unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) bg FROM t WHERE len(tk) >= 2), " +
        "c AS (SELECT bg, CAST(count(*) AS BIGINT) cnt FROM b GROUP BY 1), " +
        "r AS (SELECT bg, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, bg ASC) AS BIGINT) rk FROM c) " +
        "SELECT rk, bg, cnt FROM r WHERE rk <= 30 ORDER BY rk")),
    ("q_docs_winnow", qDocsWinnow, Some(
      "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') tk FROM documents), " +
        "g AS (SELECT doc_id, [CAST('0x' || substr(md5('wn' || ':' || tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 15) AS BIGINT) " +
        "FOR i IN range(1, len(tk)-1)] h FROM t WHERE len(tk) >= 6), " +
        "f AS (SELECT doc_id, unnest(list_distinct([list_min(h[i:i+3]) FOR i IN range(1, len(h)-2)])) fp FROM g), " +
        "p AS (SELECT a.doc_id d1, b.doc_id d2, CAST(count(*) AS BIGINT) shared " +
        "FROM f a JOIN f b ON b.fp = a.fp AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT d1, d2, shared FROM p ORDER BY shared DESC, d1, d2 LIMIT 50")),
    ("q_docs_dup_rate", qDocsDupRate, Some(
      "WITH fp AS (SELECT source, md5(text) fp FROM documents), " +
        "c AS (SELECT fp, CAST(count(*) AS BIGINT) n FROM fp GROUP BY 1) " +
        "SELECT source, CAST(count(*) AS BIGINT) n_docs, " +
        "CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) n_dup, " +
        "round(CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) dup_rate " +
        "FROM fp JOIN c USING (fp) GROUP BY 1 ORDER BY 1")),
    ("q_emb_array_hof", qEmbArrayHof, Some(
      "WITH t AS (SELECT vec_id, CAST(len(embedding) AS BIGINT) dim, " +
        "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) n_pos, " +
        "list_transform(embedding, x -> CAST(CASE WHEN x < 0 " +
        "THEN -floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5) " +
        "ELSE floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5) END AS BIGINT)) m FROM embeddings) " +
        "SELECT vec_id, dim, n_pos, " +
        "round(sqrt(CAST(list_sum(list_transform(m, x -> x * x)) AS DOUBLE)) / 1000000, 6) l2, " +
        "round(CAST(list_sum(list_transform(m, x -> greatest(x, CAST(0 AS BIGINT)))) AS DOUBLE) / 1000000, 6) relu_sum " +
        "FROM t ORDER BY vec_id")))
}
