package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-evaluation tier: the measurement queries a training-data /
  * RAG pipeline runs over its own embedding index — IR quality metrics
  * (recall@k, MRR, nDCG) of a degraded ranking against the exact one,
  * and curriculum phase assignment over the document corpus.
  *
  * The evaluated system is int8 symmetric quantization (the
  * q_emb_quantize storage format): ground truth = exact cosine top-10,
  * prediction = top-10 by QUANTIZED integer dot product. That makes the
  * eval fully oracle-checkable — both rankings are deterministic (the
  * quantized dot is an exact integer, the cosine is the bit-reproducible
  * graft_cosine/list_cosine_similarity pair) — while measuring a real
  * degradation (recall@10 lands ≈0.5–0.9 on the synthetic corpus, not a
  * vacuous 1.0 — full-precision dot ordering IS cosine ordering on
  * near-unit-norm vectors, which is why the non-quantized form makes a
  * useless eval).
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** Int8 symmetric per-vector quantization: q_i = floor(x_i·127/max|x| +
    * 0.5) — the explicit floor(+0.5) form is engine-portable (no
    * BigDecimal-vs-IEEE rounding split). */
  private def quantExpr(vec: String): String =
    s"transform($vec, x -> cast(floor(cast(x as double) * 127.0d / " +
      s"array_max(transform($vec, y -> abs(cast(y as double)))) + 0.5d) as bigint))"

  /** recall@10 / MRR@10 / nDCG@10 of int8-quantized dot-product retrieval
    * vs exact cosine, per query vector (the 20 lowest vec_ids probe the
    * rest of the corpus). Brute-force scoring: the 20-row query side
    * BROADCASTS onto one corpus scan (at 100 TB, feed the candidate side
    * from the ANN index probes instead — the metrics pipeline is
    * unchanged). Both rankings tie-break on candidate id; the integer
    * dot product is exact, so ranks are engine-identical. nDCG's ideal
    * DCG is the left-to-right fold Σ 1/log2(i+1), i=1..10, on both
    * engines. */
  val qSimEvalMetrics: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val qs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qi", expr(quantExpr("qv")))
    val cs = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("ci", expr(quantExpr("cv")))
    val wg = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val wp = Window.partitionBy("qid").orderBy(col("qdot").desc, col("cid"))
    cs.crossJoin(broadcast(qs))
      .withColumn("cos", Llm.cosineNative(s, "qv", "cv"))
      .withColumn("qdot", {
        // codegen'd long multiply-add (functions/LongDotProduct.scala) — the
        // interpreted zip_with form costs ~µs per pair inside this
        // queries×corpus join; FunctionsSpec holds the two forms equal
        graft.functions.GraftFunctions.register(s)
        expr("graft_dot_long(qi, ci)")
      })
      .withColumn("grk", row_number().over(wg))
      .withColumn("prk", row_number().over(wp))
      .filter(col("prk") <= 10)
      .withColumn("rel", when(col("grk") <= 10, 1).otherwise(0))
      .groupBy("qid")
      .agg(
        Num.roundd(sum("rel") / lit(10.0), 6).as("recall"),
        Num.roundd(coalesce(max(when(col("rel") === 1, lit(1.0) / col("prk"))), lit(0.0)), 6).as("mrr"),
        Num.roundd(
          sum(col("rel") / log2(col("prk").cast("double") + 1)) /
            expr("aggregate(sequence(1, 10), 0.0d, (acc, i) -> acc + 1.0d / log2(cast(i + 1 as double)))"),
          6).as("ndcg"))
      .orderBy("qid")
  }

  /** Curriculum phase assignment: rank the corpus by a difficulty proxy
    * (average word length) and split into 4 equal phases — the
    * easy-to-hard ordering a curriculum-training schedule consumes; the
    * report gives each phase's size, token budget and language spread.
    *
    * ntile over a global ORDER BY is a single-partition window — correct
    * and exact, which is what the hash gate needs, but the 100 TB path
    * replaces it with one quantile pass (exact or t-digest) and a
    * map-side bucket assignment against the 3 broadcast cut points; the
    * report stage is unchanged. */
  val qDocsCurriculum: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("cast(size(split(coalesce(text, ''), ' ')) as bigint)").as("tok"))
      .withColumn("awl", Num.roundd(col("n_chars").cast("double") / col("tok"), 6))
      .withColumn("phase", ntile(4).over(Window.orderBy("awl", "doc_id")).cast("long"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("toks"),
        Num.roundd(Num.roundd(sum("awl"), 8) / count(lit(1)), 6).as("avg_awl"),
        countDistinct("lang").as("n_langs"))
      .orderBy("phase")

  // ---- catalog ------------------------------------------------------------

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_sim_eval_metrics", qSimEvalMetrics, Some(
      "WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 20), " +
        "c AS (SELECT vec_id cid, CAST(embedding AS DOUBLE[]) cv FROM embeddings WHERE vec_id >= 20), " +
        "qq AS (SELECT qid, qv, list_transform(qv, x -> CAST(floor(x * 127.0 / " +
        "list_max(list_transform(qv, y -> abs(y))) + 0.5) AS BIGINT)) qi FROM q), " +
        "cq AS (SELECT cid, cv, list_transform(cv, x -> CAST(floor(x * 127.0 / " +
        "list_max(list_transform(cv, y -> abs(y))) + 0.5) AS BIGINT)) ci FROM c), " +
        "pr AS (SELECT qid, cid, list_cosine_similarity(qv, cv) cos, list_dot_product(qi, ci) qdot " +
        "FROM qq CROSS JOIN cq), " +
        "rk AS (SELECT qid, cid, " +
        "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) grk, " +
        "row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) prk FROM pr), " +
        "hits AS (SELECT qid, prk, CASE WHEN grk <= 10 THEN 1 ELSE 0 END rel FROM rk WHERE prk <= 10) " +
        "SELECT qid, round(sum(rel) / 10.0, 6) recall, " +
        "round(coalesce(max(CASE WHEN rel = 1 THEN CAST(1 AS DOUBLE) / prk END), 0.0), 6) mrr, " +
        "round(sum(rel / log2(CAST(prk + 1 AS DOUBLE))) / " +
        "(SELECT sum(CAST(1 AS DOUBLE) / log2(CAST(i + 1 AS DOUBLE))) FROM range(1, 11) t(i)), 6) ndcg " +
        "FROM hits GROUP BY qid ORDER BY qid")),
    ("q_docs_curriculum", qDocsCurriculum, Some(
      "WITH sc AS (SELECT doc_id, lang, n_chars, " +
        "CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) tok FROM documents), " +
        "aw AS (SELECT doc_id, lang, tok, round(CAST(n_chars AS DOUBLE) / tok, 6) awl FROM sc), " +
        "ph AS (SELECT lang, tok, awl, CAST(ntile(4) OVER (ORDER BY awl, doc_id) AS BIGINT) phase FROM aw) " +
        "SELECT phase, CAST(count(*) AS BIGINT) n_docs, CAST(sum(tok) AS BIGINT) toks, " +
        "round(round(sum(awl), 8) / count(*), 6) avg_awl, CAST(count(DISTINCT lang) AS BIGINT) n_langs " +
        "FROM ph GROUP BY 1 ORDER BY 1")),
  )
}
