package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline scale tier (builder brief): near-dup dedup (MinHash,
  * SimHash, n-gram Jaccard), embedding near-dup + ANN, text analysis
  * (language-ID, quality scoring, token counting, fingerprinting), and the
  * multimodal binary-column plumbing.
  *
  * Everything here is deterministic and cross-engine reproducible: all
  * hashing derives from md5 (identical in Spark and DuckDB) mapped to 60-bit
  * ints — `conv(substr(md5(x),1,15),16,10)` in Spark ≡
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` in DuckDB — so even the
  * MinHash/SimHash sketches hash-match the oracle exactly. Ratios divide
  * exact integer counts; score formulas are linear (no transcendentals,
  * whose last-ulp behavior differs between libm and the JVM).
  *
  * Scale notes: every operator is a per-row projection (codegen'd
  * higher-order functions, no UDFs) followed by at most one equi-join or
  * hash aggregate — linear in corpus size, shuffle only on join keys. The
  * pairwise queries here join on consecutive doc_ids (a bounded 1:1 join)
  * purely to give the sketches a deterministic oracle; the unbounded
  * candidate-generation path (LSH banding → bucket join) lives in
  * graft.operators.Dedup / Similarity.
  */
object LlmScale {
  type Q = (SparkSession, String) => DataFrame

  /** documents with distinct word-3-gram array `g` (docs with ≥3 words) —
    * the library shingler, aliased to the oracle queries' column name. */
  private def withNgrams(s: SparkSession, d: String): DataFrame =
    Dedup.withShingles(Tables.documents(s, d), "text")
      .withColumnRenamed("shingles", "g")

  /** Consecutive-id doc pairs — a bounded deterministic pairing that lets
    * the pairwise sketches carry exact oracles. */
  private def pairs(docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id").as("id_a"), col("g").as("ga"))
    val b = docs.select(col("doc_id").as("id_b"), col("g").as("gb"))
    a.join(b, col("id_b") === col("id_a") + 1)
  }

  // ---- dedup: n-gram Jaccard ---------------------------------------------

  val qTextNgramJaccard: Q = (s, d) =>
    pairs(withNgrams(s, d))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .select(
        col("id_a"), col("id_b"),
        Num.roundd(
          col("inter").cast("double") /
            (size(col("ga")) + size(col("gb")) - col("inter")), 6).as("jac"))
      .orderBy("id_a")

  // ---- dedup: MinHash (8 seeded hash functions over 3-gram shingles) ------

  val qDedupMinhash: Q = (s, d) => {
    val docs = Dedup.minHash(
      Dedup.withShingles(Tables.documents(s, d), "text"), numHashes = 8)
    val a = docs.select(col("doc_id").as("id_a"), col("sig").as("sa"))
    val b = docs.select(col("doc_id").as("id_b"), col("sig").as("sb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("agree",
        expr("size(filter(sequence(0,7), i -> element_at(sa, i+1) = element_at(sb, i+1)))").cast("long"))
      .select(col("id_a"), col("id_b"), col("agree"),
        (col("agree") / 8.0).as("est_jac"))
      .orderBy("id_a")
  }

  // ---- dedup: SimHash (60-bit, over distinct tokens) ----------------------

  val qDedupSimhash: Q = (s, d) => {
    val docs = Dedup.simhashBits(Tables.documents(s, d), "text")
    val a = docs.select(col("doc_id").as("id_a"), col("simhash_bits").as("ba"))
    val b = docs.select(col("doc_id").as("id_b"), col("simhash_bits").as("bb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        expr("size(filter(sequence(0,59), i -> element_at(ba, i+1) != element_at(bb, i+1)))")
          .cast("long").as("hamming"))
      .orderBy("id_a")
  }

  // ---- dedup: FULL-CORPUS banded LSH (the actual scale path) --------------

  /** Full-corpus MinHash-LSH candidate generation: 8-hash signatures over
    * 3-gram shingles, 4 bands × 2 rows, candidates = distinct band-bucket
    * collisions over ALL documents (id_a < id_b). Unlike the
    * consecutive-pair sketch queries above, the plan here IS the banding
    * bucket join — shuffle volume bands × corpus, never corpus². The
    * oracle formulates banding independently (joins on the raw band
    * slices, no md5 band key), so this is a cross-algorithm check. */
  val qDedupLshBands: Q = (s, d) =>
    Dedup.lshCandidates(
        Dedup.minHashFromText(Tables.documents(s, d), "text", numHashes = 8),
        "doc_id", bands = 4)
      .orderBy("id_a", "id_b")

  /** The full near-dup pipeline: banded LSH candidates verified with exact
    * n-gram Jaccard ≥ 0.2. Verification cost is per-candidate, not
    * per-pair — the only corpus-sized work is the banding shuffle. */
  val qDedupLshVerified: Q = (s, d) =>
    Dedup.nearDupPairs(
        Tables.documents(s, d),
        "doc_id", "text", threshold = 0.2, numHashes = 8, bands = 4)
      .select(col("id_a"), col("id_b"), Num.roundd(col("jaccard"), 6).as("jac"))
      .orderBy("id_a", "id_b")

  /** Cross-source NEAR-dup provenance matrix: the LSH band-collision
    * candidates (same sketch parameters as [[qDedupLshBands]]) rolled up to
    * source pairs — how many candidate duplicate pairs link each pair of
    * sources. This is the scale-path version of the Corpus tier's
    * prefix-fingerprint overlap report: the band keys ARE the blocking
    * fingerprints a 100 TB pipeline has already computed for dedup, so the
    * mirror-site report is one extra rollup over state that exists anyway.
    *
    * Scale: candidate generation is the banding shuffle (bands × corpus);
    * the source lookup joins the candidate PAIRS (tiny relative to the
    * corpus) back to the doc→source projection twice on doc_id. */
  val qDedupSourceOverlap: Q = (s, d) => {
    // r17: the banding signature comes from the cascade's memoized
    // extended sketch (Dedup.sketchSliced — positions 0..7 of the affine
    // family ARE the 8-hash sketch), so this report stops re-sketching
    // the corpus the dedup build already sketched. Candidate set is
    // byte-identical (same band keys over the same positions).
    val cands = Dedup.lshCandidates(
      Dedup.sketchSliced(Tables.documents(s, d), "doc_id", "text", numHashes = 8),
      "doc_id", bands = 4)
    val srcs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    cands
      .join(srcs.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(srcs.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(col("sa.source") =!= col("sb.source"))
      .select(least(col("sa.source"), col("sb.source")).as("src_a"),
        greatest(col("sa.source"), col("sb.source")).as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  // ---- dedup: clustering (connected components over verified pairs) -------

  /** The end of the dedup pipeline: verified near-dup pairs → connected
    * components → (doc_id, cluster_id = min doc in the cluster,
    * cluster_size). A downstream "keep one per cluster" is then the
    * trivial filter doc_id = cluster_id. The oracle recomputes components
    * independently via a recursive transitive-closure CTE — a genuine
    * cross-algorithm check on the distributed label propagation. */
  val qDedupCluster: Q = (s, d) => {
    val edges = Dedup.nearDupPairs(
        Tables.documents(s, d), "doc_id", "text",
        threshold = 0.2, numHashes = 8, bands = 4)
      .select("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges)
    val sizes = comp.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** The one-call dedup pipeline END-TO-END under the gate: LSH candidates
    * → Jaccard verify → connected components → drop every non-representative
    * (Dedup.dedupCorpus). Output is the surviving corpus checksummed per
    * lang; the oracle rebuilds the same survivors from its independent
    * recursive-CTE clustering. A pass proves the whole pipeline — not just
    * each stage — keeps exactly cluster representatives + singletons. */
  val qDedupSurvivors: Q = (s, d) => {
    Dedup.dedupCorpus(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.2, numHashes = 8, bands = 4)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"), sum("n_chars").as("chars"))
      .orderBy("lang")
  }

  /** Incremental dedup under the gate: src0 plays the NEW ingest batch,
    * every other source the EXISTING corpus. The corpus contributes only
    * its banded signature index (Dedup.bandSigIndex — the artifact a
    * corpus build persists); the batch is sketched, bucket-joined
    * against the index, and verified by signature agreement ≥ 0.5.
    * Per batch doc: corpus-dup count, earlier-batch-dup count, and the
    * keep decision. The oracle rebuilds the same screen from the shared
    * signature CTEs with banding formulated independently. */
  val qDedupIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val idx = Dedup.bandSigIndex(
      Dedup.minHashFromText(
        docs.filter(col("source") =!= "src0").select("doc_id", "text"),
        "text", numHashes = 8),
      "doc_id", bands = 4)
    Dedup.incrementalDedup(idx, docs.filter(col("source") === "src0"),
        "doc_id", "text", estThreshold = 0.5, numHashes = 8, bands = 4)
      .orderBy("doc_id")
  }

  // ---- similarity: embedding near-dup (exact, thresholded) ----------------

  val qEmbNeardup: Q = (s, d) =>
    Similarity.allPairsAboveThreshold(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b"), Num.roundd(col("sim"), 6).as("sim"))
      .orderBy("id_a", "id_b")

  // ---- similarity: ANN via random-hyperplane LSH (oracle-less: approx) ----

  /** Sign-random-projection LSH: 6 md5-seeded ±1 hyperplanes bucket the
    * vectors; probe vec 0 searches its own bucket only, exact cosine inside.
    * Declared without oracle (approximate by construction); recall vs the
    * exact top-k is asserted in the test suite. */
  val qSimAnnLsh: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val bucketed = e.withColumn("bucket", Similarity.srpBucket("embedding", 6))
    val probe = bucketed.filter(col("vec_id") === 0)
      .select(col("embedding").as("a"), col("bucket").as("pbucket"))
    bucketed.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").as("b"), col("bucket"))
      .join(broadcast(probe), col("bucket") === col("pbucket"))
      .withColumn("sim", Num.roundd(Llm.cosineNative(s, "a", "b"), 6))
      .select("vec_id", "sim")
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(5)
  }

  /** Batch multi-probe ANN — the production shape: N probe vectors
    * answered in ONE plan instead of N sequential probes. Probes and
    * corpus share the SRP bucketing expression; the (tiny) bucketed probe
    * set broadcasts, the corpus joins on bucket with no shuffle, exact
    * codegen'd cosine ranks within each probe's bucket. Oracle-backed:
    * the ±1 plane matrix is deterministic, so DuckDB re-derives every
    * bucket from inline literals, and ranking happens on the ROUNDED
    * cosine with vec_id tiebreak — a total order both engines share. */
  val qSimAnnBatch: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val bucketed = Tables.embeddings(s, d)
      .withColumn("bucket", Similarity.srpBucket("embedding", 6))
    val probes = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("bucket").as("pb"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id").asc)
    bucketed
      .join(broadcast(probes), col("bucket") === col("pb") && col("vec_id") =!= col("probe_id"))
      .withColumn("sim", Num.roundd(Llm.cosineNative(s, "embedding", "pv"), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("probe_id", "rnk", "vec_id", "sim")
      .orderBy("probe_id", "rnk")
  }

  /** Matryoshka two-stage retrieval: shortlist top-50 per probe by
    * cosine over the FIRST 32 dims, rerank the shortlist by full 64-dim
    * cosine, keep top-3 — the MRL serving pattern, where the hot index
    * stores truncated prefixes (2× less memory bandwidth per candidate)
    * and full vectors are touched only for the shortlist. Here both
    * stages read the one scan (the demo corpus carries its full vector
    * along); the ranking keys are ROUNDED sims so both engines rank
    * identical doubles, and both window passes ride the probe_id
    * partitioning — one shuffle total after the broadcast probe join. */
  val qSimMatryoshka: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d).withColumn("te", expr("slice(embedding, 1, 32)"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("te").as("tp"))
    val w1 = Window.partitionBy("probe_id").orderBy(col("tsim").desc, col("vec_id").asc)
    val w2 = Window.partitionBy("probe_id").orderBy(col("fsim").desc, col("vec_id").asc)
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("tsim", Num.roundd(Llm.cosineNative(s, "te", "tp"), 6))
      .withColumn("trnk", row_number().over(w1))
      .filter(col("trnk") <= 50)
      .withColumn("fsim", Num.roundd(Llm.cosineNative(s, "embedding", "pv"), 6))
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("rnk"), col("vec_id"), col("fsim").as("sim"))
      .orderBy("probe_id", "rnk")
  }

  /** DuckDB twin of the srpBucket expression over column `c` (inline ±1
    * plane literals, same left-to-right double accumulation). */
  private def duckBucket(nPlanes: Int, dim: Int, c: String): String =
    Similarity.srpPlanes(nPlanes, dim).zipWithIndex.map { case (plane, h) =>
      val lits = plane.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range($dim), i -> CAST($c[i+1] AS DOUBLE) * ($lits::DOUBLE[])[i+1])) > 0 THEN ${1 << h} ELSE 0 END)"
    }.mkString(" + ")

  /** IVF-style ANN: seeded k-means clusters, search the nProbe nearest.
    * Oracle-less like the LSH variant (approximate by construction);
    * self-consistency + recall asserted in tests. */
  val qSimAnnIvf: Q = (s, d) =>
    Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probeId = 0L, topK = 5, k = 8, nProbe = 3, iters = 1)
      .withColumn("sim", Num.roundd(col("sim"), 6))

  /** PQ compression + ADC scan + exact re-rank (Similarity.PqModel): the
    * returned sims are EXACT cosines of the re-ranked shortlist, but the
    * shortlist itself is approximate — recall asserted in tests, same
    * contract as the LSH/IVF tier. */
  val qSimAnnPq: Q = (s, d) =>
    Similarity.pqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probeId = 0L, k = 5, numSub = 8, codebook = 16, iters = 2, rerank = 50)
      .withColumn("sim", Num.roundd(col("sim"), 6))

  // ---- text analysis (delegating to the TextAnalysis library operators) ---

  val qTextLangid: Q = (s, d) =>
    TextAnalysis.langId(Tables.documents(s, d), "text")
      .select("doc_id", "pred_lang", "s_de", "s_en", "s_es", "s_fr")
      .orderBy("doc_id")
      .limit(1000)

  val qTextQuality: Q = (s, d) =>
    TextAnalysis.quality(Tables.documents(s, d), "text")
      .select(
        col("doc_id"), col("n_tok"),
        Num.roundd(col("avg_wlen"), 4).as("avg_wlen"),
        Num.roundd(col("stop_ratio"), 4).as("stop_ratio"),
        Num.roundd(col("score"), 4).as("score"))
      .orderBy("doc_id")
      .limit(1000)

  /** Within-doc repetition filter (TextAnalysis.repetition): the boolean
    * compares the UNROUNDED ratios on both engines — identical IEEE
    * division of the same integers, so the flag is deterministic even at
    * the thresholds. */
  val qTextRepetition: Q = (s, d) =>
    TextAnalysis.repetition(Tables.documents(s, d), "text")
      .withColumn("repetitive", col("top_ratio") > 0.12 || col("ttr") < 0.35)
      .select(col("doc_id"), col("n_tok"), col("distinct_tok"), col("top_cnt"),
        Num.roundd(col("ttr"), 4).as("ttr"),
        Num.roundd(col("top_ratio"), 4).as("top_ratio"),
        col("repetitive"))
      .orderBy("doc_id")
      .limit(1000)

  val qTextTokencount: Q = (s, d) =>
    TextAnalysis.tokenCounts(Tables.documents(s, d), "text")
      .select("doc_id", "ws_tokens", "bpe_tokens", "n_chars")
      .orderBy("doc_id")
      .limit(1000)

  // ---- text analysis: document fingerprint (bottom-2 sketch of shingles) --

  val qTextFingerprint: Q = (s, d) =>
    withNgrams(s, d)
      .withColumn("fps", expr(s"array_sort(transform(g, x -> ${Dedup.h60("'f'", "x")}))"))
      .select(
        col("doc_id"),
        element_at(col("fps"), 1).as("fp1"),
        element_at(col("fps"), 2).as("fp2"),
        size(col("fps")).cast("long").as("n_grams"))
      .orderBy("doc_id")
      .limit(1000)

  // ---- text analysis: PII masking (training-data scrub) -------------------

  /** Regex scrub: emails → <EMAIL>, digit runs → <NUM>. Pure per-row
    * projection (codegen'd regexp_replace), no shuffle — linear at any
    * corpus size. Patterns kept to the RE subset whose semantics are
    * identical between Java regex and DuckDB's RE2. */
  val qTextPiiMask: Q = (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        substring(
          regexp_replace(
            regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
            "[0-9]+", "<NUM>"),
          1, 80).as("masked"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").as("n_num"))
      .orderBy("doc_id")
      .limit(1000)

  /** TF-IDF top-3 terms per document. Tokenize → tf per (doc, term) → df
    * per term → score = tf · ln(N/df) → top-3 by (score desc, term).
    * Scale shape: df is a count over a term-partitioned WINDOW on the tf
    * rows, not a second aggregation joined back — a tf-self-join's two
    * branches prune differently, defeat ReuseExchange, and tokenize the
    * 100 TB corpus twice (PlanSpec pins the single-tokenize shape). Total:
    * one corpus scan + three keyed shuffles (doc+term agg, term window,
    * doc top-k window) + a broadcast 1-row corpus count. Ranking keys are
    * ROUNDED scores (idf to 6 dp before the multiply, score to 4 dp) so
    * both engines rank identical doubles — ranking raw products would let
    * a last-ulp ln() difference reorder near-ties (ln parity precedent:
    * q_scalar_math). */
  val qTextTfidf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) > 0)
    // r17 (guide §2.3/§2.4): document frequency as a map-side-combining
    // aggregate + broadcast join instead of count().over(partitionBy(term))
    // — the window form shuffled EVERY (doc, term) row by term and sorted
    // it; the aggregate ships only vocab-sized partials and the posting
    // stream is never term-shuffled. tf is checkpointed because it feeds
    // both the df rollup and the scoring join (the bm25 postings device).
    val tf = Ckpt.rotate("tfidf_tf")(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        Num.roundd(col("tf") * Num.roundd(log(col("n").cast("double") / col("dfreq")), 6), 4))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("doc_id", "rn", "term", "tf", "score")
      .orderBy("doc_id", "rn")
  }

  /** Perplexity-proxy quality score: average add-one-smoothed bigram
    * log-likelihood of each document under the CORPUS's own bigram
    * statistics — the KenLM-style filter rank (low likelihood = atypical
    * text: boilerplate, mangled encodings, wrong language) computed
    * without an external model. p(b|a) = (c2(a,b)+1) / (c1(a)+V).
    *
    * Scale shape: the LM statistics are corpus-sized, so the score joins
    * are honest shuffle joins on the bigram/unigram keys (no broadcast
    * pretense); V rides a 1-row broadcast. ln terms pre-round to 6 dp
    * (engine ulp parity, the tfidf precedent) and the per-doc sum
    * re-rounds before the divide (§2.0.2: partial-agg order must not
    * flip the output digit). */
  val qTextLmScore: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), split(col("text"), " ").as("w"))
    val bg = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> " +
          "struct(element_at(w, i + 1) AS a, element_at(w, i + 2) AS b))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val uni = docs.select(explode(col("w")).as("t"))
    val c2 = bg.groupBy("a", "b").agg(count(lit(1)).as("c2"))
    // r17 (guide §3): join the two VOCAB-sized stat tables first — lp
    // depends only on (a, b), so the per-bigram log-prob table is built
    // from c2 ⋈ c1 (bigram-vocab rows) and the corpus-sized bg stream
    // joins ONCE on (a, b) instead of paying two corpus-sized shuffle
    // joins. c1 is checkpointed (vocab-sized) because V is its row count
    // — the former countDistinct pass re-tokenized the corpus just to
    // count what c1 already holds (plans/r17/text_lm_score_before).
    val c1 = Ckpt.rotate("lm_score_c1")(
      uni.groupBy(col("t").as("a")).agg(count(lit(1)).as("c1")))
    val v = c1.agg(count(lit(1)).as("v"))
    val lpTab = c2.join(c1, Seq("a")).crossJoin(broadcast(v))
      .withColumn("lp", Num.roundd(
        log((col("c2") + lit(1)).cast("double") / (col("c1") + col("v")).cast("double")), 6))
      .select("a", "b", "lp")
    bg.join(lpTab, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        Num.roundd(Num.roundd(sum("lp"), 6) / count(lit(1)), 4).as("avg_logp"))
      .orderBy("doc_id")
  }

  // ---- sampling: deterministic hash sample (train/eval splits) ------------

  /** 10% deterministic sample by seeded md5 of the id — the reproducible
    * alternative to rand(): membership is a pure function of the row, so
    * the split is stable across runs, engines, partitionings, and
    * re-ingestion (and the complement is exactly the other 90%). */
  val qDocsSample: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("hmod",
        expr(s"pmod(${Dedup.h60("'smp'", "cast(doc_id as string)")}, 100)"))
      .filter(col("hmod") < 10)
      .select("doc_id", "lang", "source", "hmod")
      .orderBy("doc_id")

  /** Temperature-based training-mix sampling (α = 0.5): re-weight sources
    * toward tokens^α shares WITHOUT upsampling — the standard multilingual
    * / multi-source mix step. With p_s ∝ tok_s^0.5 the no-upsampling rate
    * collapses to r_s = sqrt(min_tok / tok_s) (the smallest source keeps
    * everything, larger sources downsample toward equal-ish token shares);
    * both engines compute it from exact BIGINT token sums through
    * correctly-rounded sqrt/divide, so the doubles agree bit-for-bit.
    * Membership is the deterministic md5-hash rule hmod < round(r_s·10^6)
    * — integer compare, no float threshold ambiguity, reshuffle-stable.
    *
    * Shape: one stats aggregate (per-source token sums, 6 rows), rates
    * broadcast back, one sampling aggregate — two scans of the corpus and
    * zero wide shuffles; at 100 TB the stats pass is the cheap one-pass
    * aggregate an ingest pipeline would maintain incrementally anyway. */
  val qDocsTempSample: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("hmod",
        expr(s"pmod(${Dedup.h60("'tmp'", "cast(doc_id as string)")}, 1000000)"))
    val stats = docs.groupBy("source")
      .agg(count(lit(1)).as("n_total"), sum("tok").as("tokens_total"))
    val rates = stats
      .crossJoin(broadcast(stats.agg(min("tokens_total").as("__min_toks"))))
      .withColumn("rate",
        Num.roundd(sqrt(col("__min_toks").cast("double") / col("tokens_total")), 6))
      .withColumn("__thresh", round(col("rate") * lit(1000000.0)).cast("long"))
    val kept = docs
      .join(broadcast(rates.select("source", "__thresh")), "source")
      .filter(col("hmod") < col("__thresh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("tok").as("tokens_kept"))
    rates.join(broadcast(kept), Seq("source"), "left")
      .select(col("source"), col("n_total"), col("tokens_total"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .withColumn("kept_share",
        Num.roundd(col("tokens_kept").cast("double") /
          sum("tokens_kept").over(org.apache.spark.sql.expressions.Window.partitionBy()), 6))
      .orderBy("source")
  }

  // ---- embeddings: cluster-cohesion report ---------------------------------

  /** Cluster-quality report per label — the cohesion metrics an
    * embedding-curation pass (cluster pruning, SemDeDup-style dedup)
    * gates on: for every vector, cosine to its OWN label centroid vs the
    * best OTHER centroid; per label, the share of vectors whose own
    * centroid wins (purity) and the mean own-minus-other margin.
    *
    * Shape: one posexplode shuffle builds per-(label, dim) pre-rounded
    * centroid means (§2.0.2 — partial-agg order can't flip the 6th
    * decimal); the k×dim rounded centroids come back to the driver
    * (bounded by design, the IVF-centroid contract) and re-enter the plan
    * as k literal codegen'd graft_cosine columns — no join at all, a
    * single projection + one hash aggregate over the corpus. Both engines
    * round-trip the centroids through FLOAT, so the cosine kernels see
    * bit-identical inputs. */
  val qEmbClusterQuality: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    val cents = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(Num.roundd(Num.roundd(sum(col("v").cast("double")), 10) / count(lit(1)), 6).as("cv"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, cv))), x -> cast(x.cv as float))").as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
      .sortBy(_._1)
    require(cents.map(_._1).toSeq == cents.indices.toSeq,
      s"graft cluster quality: labels must be contiguous 0..k-1, got ${cents.map(_._1).mkString(",")}")
    val k = cents.length
    val simCols = cents.map { case (_, c) =>
      Num.roundd(call_function("graft_cosine", col("embedding"), typedlit(c)), 6)
    }
    emb
      .withColumn("sims", array(simCols: _*))
      .withColumn("own", element_at(col("sims"), col("label") + 1))
      .withColumn("other", expr(
        s"array_max(transform(sequence(0, ${k - 1}), " +
          "i -> CASE WHEN i = label THEN CAST(-2.0 AS DOUBLE) ELSE element_at(sims, i + 1) END))"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("own") > col("other"), 1L).otherwise(0L)).as("n_pure"),
        Num.roundd(Num.roundd(sum(col("own") - col("other")), 8) / count(lit(1)), 6).as("avg_margin"))
      .select(col("label"), col("n_vecs"), col("n_pure"),
        Num.roundd(col("n_pure").cast("double") / col("n_vecs"), 4).as("purity"),
        col("avg_margin"))
      .orderBy("label")
  }

  // ---- docs: quality-filter funnel -----------------------------------------

  /** The per-stage survivor report of a document quality pipeline — the
    * funnel every curation run publishes before training: language keep,
    * then length band, then minimum token count, then exact-dedup
    * canonicality (doc is its text's min-id representative), each stage
    * nested in the previous. One scan; the dedup flag is a single
    * md5-keyed window (same key as q_dedup_exact); all counts are exact
    * integers — a single-row report, trivially mergeable at any scale. */
  val qDocsFilterFunnel: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    Tables.documents(s, d)
      .withColumn("keep_id", min("doc_id").over(w))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("lang") === "en" &&
          col("n_chars").between(150, 500), 1L).otherwise(0L)).as("n_len"),
        sum(when(col("lang") === "en" &&
          col("n_chars").between(150, 500) &&
          size(split(col("text"), " ")) >= 40, 1L).otherwise(0L)).as("n_tok"),
        sum(when(col("lang") === "en" &&
          col("n_chars").between(150, 500) &&
          size(split(col("text"), " ")) >= 40 &&
          col("keep_id") === col("doc_id"), 1L).otherwise(0L)).as("n_canonical"))
      .select(col("n_total"), col("n_lang"), col("n_len"), col("n_tok"), col("n_canonical"),
        Num.roundd(col("n_canonical").cast("double") / col("n_total"), 4).as("yield_rate"))
  }

  // ---- docs: data-mix report ------------------------------------------------

  /** The data-mixing report every corpus builder publishes before
    * training: per source, document count, total whitespace tokens, and
    * each source's share of the corpus token budget — the numbers
    * sampling weights are tuned against. One scan, one hash aggregate;
    * the grand total rides along as a window sum over the (tiny)
    * per-source result, not a second scan. */
  val qDocsMixReport: Q = (s, d) => {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .withColumn("token_share",
        Num.roundd(col("tokens").cast("double") / sum("tokens").over(w), 6))
      .orderBy("source")
  }

  // ---- contamination: eval-set n-gram overlap ------------------------------

  /** Benchmark-contamination check — the decontamination pass every LLM
    * training pipeline runs before training: treating source='src0' as
    * the held-out eval set, the share of each eval doc's distinct
    * word-8-grams that appears anywhere in the train split (every other
    * source). Tokenize once, per-doc distinct 8-grams pre-shuffle, then
    * ONE equi-join of eval n-grams against the train-distinct n-gram set
    * — shuffle is n-grams × corpus (the LSH-banding shape), never
    * corpus²; the train set is distinct'd before the join so a repeated
    * train n-gram can't multiply eval rows. */
  val qTextContamination: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), col("source"), explode(
        expr("array_distinct(transform(sequence(0, size(w) - 8), i -> array_join(slice(w, i + 1, 8), ' ')))")).as("ng"))
    val evalNg = grams.filter(col("source") === "src0").select("doc_id", "ng")
    val trainNg = grams.filter(col("source") =!= "src0").select("ng").distinct()
    evalNg.join(trainNg.withColumn("hit", lit(1L)), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hit"),
        Num.roundd(col("n_hit").cast("double") / col("n_ngrams"), 6).as("ratio"))
      .orderBy("doc_id")
  }

  // ---- embeddings: int8 scalar quantization -------------------------------

  /** Per-vector symmetric int8 quantization (q = round(v·127/max|v|)) plus
    * mean absolute reconstruction error — the storage-side half of ANN at
    * 100 TB (4× smaller vectors, error column for quality gates). Pure
    * per-row projection over the array column; both engines evaluate the
    * same left-to-right float→double pipeline, rounded via the DuckDB
    * round mimic. */
  val qEmbQuantize: Q = (s, d) =>
    Tables.embeddings(s, d)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("mx", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("mx") > 0)
      .withColumn("q", expr(
        "transform(v, x -> cast(if(x < 0, -floor(abs(x * 127.0 / mx) + 0.5d), floor(abs(x * 127.0 / mx) + 0.5d)) as int))"))
      .select(
        col("vec_id"),
        Num.roundd(col("mx"), 6).as("mxr"),
        element_at(col("q"), 1).as("q1"),
        element_at(col("q"), 2).as("q2"),
        size(expr("filter(q, y -> y != 0)")).cast("long").as("n_nonzero"),
        Num.roundd(expr(
          "aggregate(sequence(0, size(v) - 1), 0.0d, (acc, i) -> acc + abs(element_at(v, i + 1) - element_at(q, i + 1) * mx / 127.0)) / size(v)"), 6).as("mae"))
      .orderBy("vec_id")

  /** 1-bit (sign) quantization retrieval: embeddings collapse to 64 sign
    * bits, the probe shortlists the 50 nearest candidates by exact Hamming
    * distance over those bits (tie-broken by vec_id), and only the
    * shortlist pays the full-precision cosine rerank — the binary-quant
    * stage of the standard quantize→shortlist→rerank cascade, sitting
    * between int8 [[qEmbQuantize]] and the PQ/matryoshka tiers.
    *
    * Unlike the ANN tier this is EXACT and hash-gated end to end: sign
    * bits are deterministic, Hamming is integer arithmetic, and the rerank
    * reuses the q_sim_topk double-accumulation cosine. Scale: the bit
    * vectors are 64× smaller than the float rows — the shortlist scan
    * streams a packed-bit column (here an int array; a production layout
    * packs to one int64 word and XOR/popcounts it), and only 50 rows ever
    * touch the float column. */
  val qEmbBinaryQuant: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .withColumn("b", expr("transform(embedding, x -> if(x >= cast(0 as float), 1, 0))"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("b").as("pb"), col("embedding").as("pa"))
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("b"), col("embedding"))
      .crossJoin(broadcast(probe))
      .withColumn("hamming", expr(
        "aggregate(zip_with(b, pb, (x, y) -> if(x = y, 0L, 1L)), 0L, (acc, z) -> acc + z)"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(50)
      .withColumn("sim", Num.roundd(Llm.cosineNative(s, "pa", "embedding"), 6))
      .select("vec_id", "hamming", "sim")
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
  }

  // ---- multimodal: binary column plumbing (decode stubbed) ----------------

  /** Media pipeline plumbing over an opaque binary column: the "decode"
    * stage is a deterministic stub (this container has no image/audio
    * codecs), but the schema, the binary column flow, and the derived
    * metadata are real. See graft.operators.Multimodal for the batch-shaped
    * decode API. */
  val qMultimodalFeatures: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("byte_len"),
        sha2(col("blob"), 256).as("sha"),
        (octet_length(col("blob")) % 640).cast("long").as("width"),
        (octet_length(col("blob")) % 480).cast("long").as("height"),
        (octet_length(col("blob")) % 16 + 1).cast("long").as("frames"))
      .orderBy("doc_id")
      .limit(1000)

  /** REAL image decode round-trip (clears the r6 `weak` mark): generate a
    * deterministic PNG/BMP corpus in the executors, decode the actual
    * bytes with the JDK's javax.imageio codecs, and report the MEASURED
    * dimensions. The oracle recomputes the generator's dimension
    * arithmetic — a pass proves a real codec parsed real image bytes and
    * measured what the generator drew, for two container formats. */
  val qMultimodalDecode: Q = (s, d) =>
    Multimodal.decodeFeatures(
        Multimodal.syntheticImages(s, d), Multimodal.ImageIoDecoder,
        decodeParallelism = 32)
      .toDF()
      .select(col("id"), col("kind"), col("width"), col("height"), col("frames"))
      .orderBy("id")

  /** REAL audio decode round-trip: executor-generated 16-bit mono PCM WAV
    * clips, parsed back by the JDK's RIFF reader; the oracle recomputes
    * the generator's envelope arithmetic. Together with
    * q_multimodal_decode this puts both JVM-native media families (image
    * + audio) through real codecs under the hash gate. */
  val qMultimodalAudio: Q = (s, d) =>
    Multimodal.decodeAudioFeatures(
        Multimodal.syntheticWavs(s, d), decodeParallelism = 32)
      .toDF()
      .orderBy("id")

  /** Perceptual near-dup hash over the REAL image decode path: each
    * executor-generated PNG/BMP decodes through ImageIO and hashes via
    * the exact-integer aHash kernel ([[Multimodal.aHash64]]). The oracle
    * never decodes — it predicts every pixel from the generator contract
    * and replays the same integer block arithmetic, so a hash match
    * proves the real decode round-trip is bit-faithful, pixel by pixel
    * (q_multimodal_decode only pins dimensions + payload sha). */
  val qMultimodalPhash: Q = (s, d) => {
    import s.implicits._
    Multimodal.syntheticImages(s, d)
      .repartition(32)
      .mapPartitions(_.map { r =>
        val img = Multimodal.ImageIoDecoder.readImage(r.payload)
        val (ph, nb) = Multimodal.aHash64(img)
        (r.id, img.getWidth.toLong, img.getHeight.toLong, ph, nb)
      })
      .toDF("doc_id", "w", "h", "phash", "nbits")
      .orderBy("doc_id")
  }

  /** Language-ID confusion matrix: the n-gram classifier's predictions
    * against the labeled lang column, with per-true-lang recall shares —
    * the quality report that tells a corpus pipeline which languages the
    * cheap classifier can be trusted on (zh has no marker list, so its
    * row shows exactly where those docs leak). */
  val qTextLangConfusion: Q = (s, d) =>
    TextAnalysis.langId(Tables.documents(s, d), "text")
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("recall", Num.roundd(
        col("n").cast("double") /
          sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("lang")), 6))
      .orderBy("lang", "pred_lang")

  /** Frame-sample plumbing as a catalog query: every 2nd frame index of
    * each (stub-decoded) media row with a per-frame fingerprint. Same
    * explode-then-process shape a real video pipeline needs so one long
    * video becomes many parallel frame rows. */
  val qMultimodalFramesample: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("frames", (octet_length(col("blob")) % 16 + 1).cast("int"))
      .withColumn("sha", sha2(col("blob"), 256))
      .select(col("doc_id"), col("sha"),
        explode(expr("sequence(0, frames - 1, 2)")).as("fi"))
      .select(
        col("doc_id"),
        col("fi").cast("long").as("frame_idx"),
        sha2(concat_ws(":", col("sha"), col("fi")), 256).as("frame_sha"))
      .orderBy("doc_id", "frame_idx")

  /** Resize planning over the (stub-decoded) dimensions: fit the long side
    * to 224 px preserving aspect ratio. A real resize kernel consumes this
    * plan inside the partition-batched decoder (Multimodal.decodeFeatures);
    * the plan math itself is a pure projection, and computing it OUTSIDE
    * the decode stage lets the planner drop rows that need no work
    * (scale = 1) before the expensive kernel runs. */
  val qMultimodalResize: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("w", (octet_length(col("blob")) % 640).cast("long"))
      .withColumn("h", (octet_length(col("blob")) % 480).cast("long"))
      .filter(col("w") > 0 && col("h") > 0)
      .withColumn("scale", Num.roundd(
        lit(224.0) / greatest(col("w"), col("h")), 6))
      .select(
        col("doc_id"), col("w"), col("h"),
        col("scale"),
        Num.roundd(col("w") * col("scale"), 0).cast("long").as("rw"),
        Num.roundd(col("h") * col("scale"), 0).cast("long").as("rh"),
        (col("scale") < 1.0).as("shrinks"))
      .orderBy("doc_id")
      .limit(1000)

  // ---- oracle SQL ----------------------------------------------------------

  private val duckH60 = "CAST('0x' || substr(md5(%s || ':' || %s), 1, 15) AS BIGINT)"
  private def dh(seed: String, x: String) = duckH60.format(seed, x)

  private val ngramCte =
    "WITH ng AS (SELECT doc_id, list_distinct(list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) g " +
      "FROM (SELECT doc_id, string_split(text,' ') w FROM documents) WHERE len(w) >= 3)"

  /** 8-hash MinHash signature CTE mirroring Dedup.minHash's universal
    * hashing: one md5 base hash mod 2^31-1, affine permutations
    * (2i+1)·h + 12582917·i mod 2^31-1 — identical BIGINT arithmetic. */
  private val sigCte =
    s"h31 AS (SELECT doc_id, list_transform(g, x -> ${dh("'m'", "x")} % 2147483647) hs FROM ng), " +
      "sg AS (SELECT doc_id, list_transform(range(8), i -> list_aggregate(list_transform(hs, h -> ((2*i + 1) * h + 12582917 * i) % 2147483647), 'min')) sig FROM h31)"

  /** 64-hash EXTENDED signature CTE for the prefiltered cascade queries —
    * same affine family as sigCte, so positions 1..8 are byte-identical
    * to `sg` and the banding below reproduces the same candidate set —
    * plus the signature-agreement prefilter the Spark cascade applies
    * before exact-Jaccard verify (Dedup.nearDupPairs estHashes = 64,
    * minAgree = Dedup.prefilterMinAgree(0.2, 64) = est-J ≥ threshold−2σ). */
  private val sigCteE =
    s"h31 AS (SELECT doc_id, list_transform(g, x -> ${dh("'m'", "x")} % 2147483647) hs FROM ng), " +
      "sge AS (SELECT doc_id, list_transform(range(64), i -> list_aggregate(list_transform(hs, h -> ((2*i + 1) * h + 12582917 * i) % 2147483647), 'min')) sig FROM h31)"

  private val bandedPreCte =
    "banded AS (SELECT doc_id, b, sig[b*2+1:b*2+2] sl FROM sge CROSS JOIN (SELECT unnest(range(4)) b)), " +
      "cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b FROM banded a JOIN banded b ON a.b = b.b AND a.sl = b.sl AND a.doc_id < b.doc_id), " +
      "pre AS (SELECT id_a, id_b FROM cand JOIN sge x ON x.doc_id = cand.id_a JOIN sge y ON y.doc_id = cand.id_b " +
      s"WHERE len(list_filter(range(64), i -> x.sig[i+1] = y.sig[i+1])) >= ${Dedup.prefilterMinAgree(0.2, 64)})"

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_docs_mix_report", qDocsMixReport, Some(
      "WITH m AS (SELECT source, CAST(count(*) AS BIGINT) docs, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) tokens FROM documents GROUP BY 1) " +
        "SELECT source, docs, tokens, round(CAST(tokens AS DOUBLE) / sum(tokens) OVER (), 6) token_share " +
        "FROM m ORDER BY source")),
    ("q_emb_cluster_quality", qEmbClusterQuality, Some(
      "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) ev FROM embeddings), " +
        "dm AS (SELECT label, pos, round(round(sum(ev[pos + 1]), 10) / count(*), 6) cv " +
        "FROM e, (SELECT unnest(range(64)) pos) p GROUP BY 1, 2), " +
        "cent AS (SELECT label c_label, CAST(CAST(list(cv ORDER BY pos) AS FLOAT[]) AS DOUBLE[]) c FROM dm GROUP BY 1), " +
        "sims AS (SELECT e.vec_id, e.label, cent.c_label, round(list_cosine_similarity(ev, c), 6) sim_r FROM e, cent), " +
        "agg AS (SELECT vec_id, label, max(CASE WHEN c_label = label THEN sim_r END) own, " +
        "max(CASE WHEN c_label != label THEN sim_r END) other FROM sims GROUP BY 1, 2) " +
        "SELECT label, CAST(count(*) AS BIGINT) n_vecs, " +
        "CAST(sum(CASE WHEN own > other THEN 1 ELSE 0 END) AS BIGINT) n_pure, " +
        "round(CAST(sum(CASE WHEN own > other THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) purity, " +
        "round(round(sum(own - other), 8) / count(*), 6) avg_margin " +
        "FROM agg GROUP BY label ORDER BY label")),
    ("q_docs_filter_funnel", qDocsFilterFunnel, Some(
      "WITH k AS (SELECT doc_id, lang, n_chars, text, min(doc_id) OVER (PARTITION BY md5(text)) keep_id FROM documents) " +
        "SELECT CAST(count(*) AS BIGINT) n_total, " +
        "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) n_lang, " +
        "CAST(sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 150 AND 500 THEN 1 ELSE 0 END) AS BIGINT) n_len, " +
        "CAST(sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 150 AND 500 AND len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END) AS BIGINT) n_tok, " +
        "CAST(sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 150 AND 500 AND len(string_split(text, ' ')) >= 40 AND keep_id = doc_id THEN 1 ELSE 0 END) AS BIGINT) n_canonical, " +
        "round(CAST(sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 150 AND 500 AND len(string_split(text, ' ')) >= 40 AND keep_id = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) yield_rate " +
        "FROM k")),
    ("q_text_contamination", qTextContamination, Some(
      "WITH g AS (SELECT doc_id, source, list_distinct(list_transform(range(len(w) - 7), i -> array_to_string(w[i+1:i+8], ' '))) gs " +
        "FROM (SELECT doc_id, source, string_split(text, ' ') w FROM documents) WHERE len(w) >= 8), " +
        "e AS (SELECT doc_id, unnest(gs) ng FROM g WHERE source = 'src0'), " +
        "t AS (SELECT DISTINCT unnest(gs) ng FROM g WHERE source != 'src0') " +
        "SELECT e.doc_id, CAST(count(*) AS BIGINT) n_ngrams, CAST(count(t.ng) AS BIGINT) n_hit, " +
        "round(CAST(count(t.ng) AS DOUBLE) / count(*), 6) ratio " +
        "FROM e LEFT JOIN t ON t.ng = e.ng GROUP BY e.doc_id ORDER BY e.doc_id")),
    ("q_text_ngram_jaccard", qTextNgramJaccard, Some(
      s"$ngramCte SELECT a.doc_id id_a, b.doc_id id_b, round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) jac FROM ng a JOIN ng b ON b.doc_id = a.doc_id + 1 ORDER BY id_a")),
    ("q_dedup_minhash", qDedupMinhash, Some(
      s"$ngramCte, $sigCte " +
        "SELECT a.doc_id id_a, b.doc_id id_b, CAST(len(list_filter(range(8), i -> a.sig[i+1] = b.sig[i+1])) AS BIGINT) agree, CAST(len(list_filter(range(8), i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE)/8.0 est_jac FROM sg a JOIN sg b ON b.doc_id = a.doc_id + 1 ORDER BY id_a")),
    ("q_dedup_simhash", qDedupSimhash, Some(
      s"WITH th AS (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')), x -> ${dh("'s'", "x")}) h FROM documents), " +
        "bits AS (SELECT doc_id, list_transform(range(60), b -> CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) bt FROM th) " +
        "SELECT a.doc_id id_a, b.doc_id id_b, CAST(len(list_filter(range(60), i -> a.bt[i+1] != b.bt[i+1])) AS BIGINT) hamming FROM bits a JOIN bits b ON b.doc_id = a.doc_id + 1 ORDER BY id_a")),
    ("q_dedup_lsh_bands", qDedupLshBands, Some(
      s"$ngramCte, $sigCte, " +
        "banded AS (SELECT doc_id, b, sig[b*2+1:b*2+2] sl FROM sg CROSS JOIN (SELECT unnest(range(4)) b)) " +
        "SELECT DISTINCT a.doc_id id_a, b.doc_id id_b FROM banded a JOIN banded b ON a.b = b.b AND a.sl = b.sl AND a.doc_id < b.doc_id ORDER BY id_a, id_b")),
    ("q_dedup_source_overlap", qDedupSourceOverlap, Some(
      s"$ngramCte, $sigCte, " +
        "banded AS (SELECT doc_id, b, sig[b*2+1:b*2+2] sl FROM sg CROSS JOIN (SELECT unnest(range(4)) b)), " +
        "cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b FROM banded a JOIN banded b ON a.b = b.b AND a.sl = b.sl AND a.doc_id < b.doc_id), " +
        "j AS (SELECT least(x.source, y.source) src_a, greatest(x.source, y.source) src_b " +
        "FROM cand JOIN documents x ON x.doc_id = cand.id_a JOIN documents y ON y.doc_id = cand.id_b " +
        "WHERE x.source <> y.source) " +
        "SELECT src_a, src_b, CAST(count(*) AS BIGINT) n_pairs FROM j GROUP BY 1, 2 ORDER BY 1, 2")),
    ("q_dedup_lsh_verified", qDedupLshVerified, Some(
      s"$ngramCte, $sigCteE, $bandedPreCte " +
        "SELECT id_a, id_b, round(CAST(len(list_intersect(x.g, y.g)) AS DOUBLE) / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))), 6) jac " +
        "FROM pre JOIN ng x ON x.doc_id = pre.id_a JOIN ng y ON y.doc_id = pre.id_b WHERE " +
        "CAST(len(list_intersect(x.g, y.g)) AS DOUBLE) / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) >= 0.2 ORDER BY id_a, id_b")),
    ("q_dedup_cluster", qDedupCluster, Some(
      // WITH RECURSIVE accepts non-recursive CTEs in the same list, so the
      // shared ngram/signature/banding CTEs are reused verbatim
      s"${ngramCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, $sigCteE, $bandedPreCte, " +
        "ve AS (SELECT id_a, id_b FROM pre JOIN ng x ON x.doc_id = pre.id_a JOIN ng y ON y.doc_id = pre.id_b " +
        "WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE) / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) >= 0.2), " +
        "sym AS (SELECT id_a s, id_b t FROM ve UNION ALL SELECT id_b, id_a FROM ve), " +
        "r(s, t) AS (SELECT s, t FROM sym UNION SELECT r.s, e.t FROM r JOIN sym e ON e.s = r.t), " +
        "lbl AS (SELECT s AS id, least(s, min(t)) cl FROM r GROUP BY s), " +
        "sz AS (SELECT cl, count(*) n FROM lbl GROUP BY cl) " +
        "SELECT id AS doc_id, cl AS cluster_id, n AS cluster_size FROM lbl JOIN sz USING (cl) ORDER BY doc_id")),
    ("q_dedup_survivors", qDedupSurvivors, Some(
      // same shared CTEs + recursive closure as q_dedup_cluster; survivors =
      // docs minus every clustered id that is not its cluster's minimum
      s"${ngramCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, $sigCteE, $bandedPreCte, " +
        "ve AS (SELECT id_a, id_b FROM pre JOIN ng x ON x.doc_id = pre.id_a JOIN ng y ON y.doc_id = pre.id_b " +
        "WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE) / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) >= 0.2), " +
        "sym AS (SELECT id_a s, id_b t FROM ve UNION ALL SELECT id_b, id_a FROM ve), " +
        "r(s, t) AS (SELECT s, t FROM sym UNION SELECT r.s, e.t FROM r JOIN sym e ON e.s = r.t), " +
        "lbl AS (SELECT s AS id, least(s, min(t)) cl FROM r GROUP BY s), " +
        "drops AS (SELECT id FROM lbl WHERE id <> cl) " +
        "SELECT lang, count(*) n, CAST(sum(doc_id) AS BIGINT) id_sum, CAST(sum(n_chars) AS BIGINT) chars " +
        "FROM documents WHERE doc_id NOT IN (SELECT id FROM drops) GROUP BY lang ORDER BY lang")),
    ("q_dedup_incremental", qDedupIncremental, Some(
      // batch = src0, corpus = everything else; candidates are band-bucket
      // collisions batch×corpus plus batch×earlier-batch, verified by
      // 8-hash signature agreement >= 0.5 (estimated Jaccard)
      s"$ngramCte, $sigCte, " +
        "banded AS (SELECT doc_id, b, sig[b*2+1:b*2+2] sl FROM sg CROSS JOIN (SELECT unnest(range(4)) b)), " +
        "bsrc AS (SELECT banded.*, source FROM banded JOIN documents USING (doc_id)), " +
        "cand AS (SELECT DISTINCT a.doc_id bid, c.doc_id cid, c.source != 'src0' isc " +
        "FROM bsrc a JOIN bsrc c ON a.b = c.b AND a.sl = c.sl " +
        "WHERE a.source = 'src0' AND (c.source != 'src0' OR c.doc_id < a.doc_id)), " +
        "est AS (SELECT bid, cid, isc FROM cand JOIN sg x ON x.doc_id = cand.bid JOIN sg y ON y.doc_id = cand.cid " +
        "WHERE CAST(len(list_filter(range(8), i -> x.sig[i+1] = y.sig[i+1])) AS DOUBLE) / 8.0 >= 0.5), " +
        "hits AS (SELECT bid, CAST(sum(CASE WHEN isc THEN 1 ELSE 0 END) AS BIGINT) nc, " +
        "CAST(sum(CASE WHEN isc THEN 0 ELSE 1 END) AS BIGINT) nb FROM est GROUP BY bid) " +
        "SELECT d.doc_id, CAST(coalesce(nc, 0) AS BIGINT) n_corpus_dup, CAST(coalesce(nb, 0) AS BIGINT) n_batch_dup, " +
        "CAST(CASE WHEN coalesce(nc, 0) = 0 AND coalesce(nb, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) keep " +
        "FROM documents d LEFT JOIN hits ON hits.bid = d.doc_id WHERE d.source = 'src0' ORDER BY d.doc_id")),
    ("q_emb_neardup", qEmbNeardup, Some(
      "SELECT a.vec_id id_a, b.vec_id id_b, round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4 ORDER BY id_a, id_b")),
    ("q_sim_ann_batch", qSimAnnBatch, Some(
      s"WITH b AS (SELECT vec_id, embedding, ${duckBucket(6, 64, "embedding")} bucket FROM embeddings), " +
        "p AS (SELECT vec_id probe_id, embedding pv, bucket pb FROM b WHERE vec_id < 10), " +
        "j AS (SELECT p.probe_id, b.vec_id, round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), CAST(p.pv AS DOUBLE[])), 6) sim " +
        "FROM b JOIN p ON b.bucket = p.pb AND b.vec_id != p.probe_id), " +
        "r AS (SELECT probe_id, vec_id, sim, row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) rnk FROM j) " +
        "SELECT probe_id, CAST(rnk AS BIGINT) rnk, vec_id, sim FROM r WHERE rnk <= 3 ORDER BY probe_id, rnk")),
    ("q_sim_matryoshka", qSimMatryoshka, Some(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "p AS (SELECT vec_id probe_id, v pv FROM e WHERE vec_id < 10), " +
        "s1 AS (SELECT p.probe_id, e.vec_id, round(list_cosine_similarity(e.v[1:32], p.pv[1:32]), 6) tsim, e.v, p.pv " +
        "FROM e JOIN p ON e.vec_id != p.probe_id), " +
        "r1 AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY tsim DESC, vec_id) trnk FROM s1), " +
        "r2 AS (SELECT probe_id, vec_id, round(list_cosine_similarity(v, pv), 6) fsim FROM r1 WHERE trnk <= 50), " +
        "r3 AS (SELECT probe_id, vec_id, fsim, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY fsim DESC, vec_id) AS BIGINT) rnk FROM r2) " +
        "SELECT probe_id, rnk, vec_id, fsim sim FROM r3 WHERE rnk <= 3 ORDER BY probe_id, rnk")),
    ("q_sim_ann_lsh", qSimAnnLsh, None), // approximate by construction; recall asserted in tests
    ("q_sim_ann_ivf", qSimAnnIvf, None), // approximate by construction; recall asserted in tests
    ("q_sim_ann_pq", qSimAnnPq, None), // approximate by construction; recall asserted in tests
    ("q_text_tfidf", qTextTfidf, Some(
      "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) tf FROM toks WHERE len(term) > 0 GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*) dfreq FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) n FROM documents), " +
        "sc AS (SELECT doc_id, term, tf, round(tf * round(ln(CAST(n.n AS DOUBLE)/dfreq), 6), 4) score " +
        "FROM tf JOIN dfq USING (term) CROSS JOIN n), " +
        "rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) rn FROM sc) " +
        "SELECT doc_id, rn, term, tf, score FROM rk WHERE rn <= 3 ORDER BY doc_id, rn")),
    ("q_text_langid", qTextLangid, Some(
      "WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) tok FROM documents), " +
        "sc AS (SELECT doc_id, CAST(len(list_intersect(tok, ['der','die','das','und','ist','ein','nicht'])) AS BIGINT) s_de, " +
        "CAST(len(list_intersect(tok, ['the','a','of','and','to','in','is'])) AS BIGINT) s_en, " +
        "CAST(len(list_intersect(tok, ['el','la','de','y','que','un','es'])) AS BIGINT) s_es, " +
        "CAST(len(list_intersect(tok, ['le','la','de','et','un','est','que'])) AS BIGINT) s_fr FROM t) " +
        "SELECT doc_id, CASE WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es' ELSE 'fr' END pred_lang, s_de, s_en, s_es, s_fr " +
        "FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr) m FROM sc) ORDER BY doc_id LIMIT 1000")),
    ("q_text_quality", qTextQuality, Some(
      "WITH q AS (SELECT doc_id, n_chars, string_split(text,' ') w FROM documents), " +
        "r AS (SELECT doc_id, n_chars, CAST(len(w) AS BIGINT) n_tok, " +
        "CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)/len(w) avg_wlen, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS DOUBLE)/len(w) stop_ratio FROM q) " +
        "SELECT doc_id, n_tok, round(avg_wlen, 4) avg_wlen, round(stop_ratio, 4) stop_ratio, " +
        "round(stop_ratio*0.3 + avg_wlen*0.05 + n_chars*0.0005, 4) score FROM r ORDER BY doc_id LIMIT 1000")),
    ("q_text_repetition", qTextRepetition, Some(
      "WITH q AS (SELECT doc_id, string_split(text,' ') w FROM documents), " +
        "r AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_tok, CAST(len(list_distinct(w)) AS BIGINT) distinct_tok, " +
        "CAST(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x)))) AS BIGINT) top_cnt FROM q) " +
        "SELECT doc_id, n_tok, distinct_tok, top_cnt, " +
        "round(CAST(distinct_tok AS DOUBLE)/n_tok, 4) ttr, " +
        "round(CAST(top_cnt AS DOUBLE)/n_tok, 4) top_ratio, " +
        "(CAST(top_cnt AS DOUBLE)/n_tok > 0.12 OR CAST(distinct_tok AS DOUBLE)/n_tok < 0.35) repetitive " +
        "FROM r ORDER BY doc_id LIMIT 1000")),
    ("q_text_tokencount", qTextTokencount, Some(
      "SELECT doc_id, CAST(len(w) AS BIGINT) ws_tokens, CAST(list_sum(list_transform(w, x -> greatest(1, CAST(ceil(length(x)/4.0) AS BIGINT)))) AS BIGINT) bpe_tokens, n_chars " +
        "FROM (SELECT doc_id, n_chars, string_split(text,' ') w FROM documents) ORDER BY doc_id LIMIT 1000")),
    ("q_text_fingerprint", qTextFingerprint, Some(
      s"$ngramCte, f AS (SELECT doc_id, list_sort(list_transform(g, x -> ${dh("'f'", "x")})) fps FROM ng) " +
        "SELECT doc_id, fps[1] fp1, fps[2] fp2, CAST(len(fps) AS BIGINT) n_grams FROM f ORDER BY doc_id LIMIT 1000")),
    ("q_text_pii_mask", qTextPiiMask, Some(
      "SELECT doc_id, substr(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), '[0-9]+', '<NUM>', 'g'), 1, 80) masked, " +
        "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) n_num FROM documents ORDER BY doc_id LIMIT 1000")),
    ("q_docs_sample", qDocsSample, Some(
      s"SELECT doc_id, lang, source, ${dh("'smp'", "CAST(doc_id AS VARCHAR)")} % 100 hmod " +
        s"FROM documents WHERE ${dh("'smp'", "CAST(doc_id AS VARCHAR)")} % 100 < 10 ORDER BY doc_id")),
    ("q_text_lm_score", qTextLmScore, Some(
      "WITH w AS (SELECT doc_id, string_split(text, ' ') w FROM documents), " +
        "bg AS (SELECT doc_id, unnest(w[:len(w)-1]) a, unnest(w[2:]) b FROM w WHERE len(w) >= 2), " +
        "c2 AS (SELECT a, b, count(*) c2 FROM bg GROUP BY 1, 2), " +
        "uni AS (SELECT unnest(w) t FROM w), " +
        "c1 AS (SELECT t a, count(*) c1 FROM uni GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT t) v FROM uni), " +
        "term AS (SELECT bg.doc_id, round(ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE)), 6) lp " +
        "FROM bg JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) n_bigrams, " +
        "round(round(sum(lp), 6) / count(*), 4) avg_logp " +
        "FROM term GROUP BY 1 ORDER BY 1")),
    ("q_docs_temp_sample", qDocsTempSample, Some(
      s"WITH t AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) tok, " +
        s"${dh("'tmp'", "CAST(doc_id AS VARCHAR)")} % 1000000 hmod FROM documents), " +
        "st AS (SELECT source, CAST(count(*) AS BIGINT) n_total, CAST(sum(tok) AS BIGINT) tokens_total FROM t GROUP BY 1), " +
        "r AS (SELECT source, n_total, tokens_total, round(sqrt(CAST(mt AS DOUBLE) / tokens_total), 6) rate, " +
        "CAST(round(round(sqrt(CAST(mt AS DOUBLE) / tokens_total), 6) * 1000000) AS BIGINT) thresh " +
        "FROM st CROSS JOIN (SELECT min(tokens_total) mt FROM st)), " +
        "k AS (SELECT t.source, CAST(count(*) AS BIGINT) n_kept, CAST(sum(tok) AS BIGINT) tokens_kept " +
        "FROM t JOIN r USING (source) WHERE hmod < thresh GROUP BY 1) " +
        "SELECT r.source, n_total, tokens_total, rate, " +
        "CAST(coalesce(n_kept, 0) AS BIGINT) n_kept, CAST(coalesce(tokens_kept, 0) AS BIGINT) tokens_kept, " +
        "round(CAST(coalesce(tokens_kept, 0) AS DOUBLE) / sum(coalesce(tokens_kept, 0)) OVER (), 6) kept_share " +
        "FROM r LEFT JOIN k ON k.source = r.source ORDER BY r.source")),
    ("q_emb_quantize", qEmbQuantize, Some(
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings), " +
        "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM e), " +
        "qq AS (SELECT vec_id, v, mx, list_transform(v, x -> CAST(round(x * 127.0 / mx) AS INTEGER)) q FROM m WHERE mx > 0) " +
        "SELECT vec_id, round(mx, 6) mxr, q[1] q1, q[2] q2, CAST(len(list_filter(q, y -> y != 0)) AS BIGINT) n_nonzero, " +
        "round(list_sum(list_transform(range(len(v)), i -> abs(v[i+1] - q[i+1] * mx / 127.0))) / len(v), 6) mae " +
        "FROM qq ORDER BY vec_id")),
    ("q_emb_binary_quant", qEmbBinaryQuant, Some(
      "WITH e AS (SELECT vec_id, embedding, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) b FROM embeddings), " +
        "p AS (SELECT embedding pa, b pb FROM e WHERE vec_id = 0), " +
        "h AS (SELECT e.vec_id, CAST(list_sum(list_transform(range(len(e.b)), i -> CASE WHEN e.b[i+1] = p.pb[i+1] THEN 0 ELSE 1 END)) AS BIGINT) hamming, " +
        "round(list_cosine_similarity(CAST(p.pa AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) sim " +
        "FROM e, p WHERE e.vec_id <> 0), " +
        "s AS (SELECT * FROM h ORDER BY hamming ASC, vec_id ASC LIMIT 50) " +
        "SELECT vec_id, hamming, sim FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    ("q_multimodal_resize", qMultimodalResize, Some(
      "WITH m AS (SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) w, " +
        "CAST(octet_length(CAST(text AS BLOB)) % 480 AS BIGINT) h FROM documents), " +
        "p AS (SELECT doc_id, w, h, round(224.0 / greatest(w, h), 6) scale FROM m WHERE w > 0 AND h > 0) " +
        "SELECT doc_id, w, h, scale, CAST(round(w * scale, 0) AS BIGINT) rw, CAST(round(h * scale, 0) AS BIGINT) rh, " +
        "scale < 1.0 shrinks FROM p ORDER BY doc_id LIMIT 1000")),
    ("q_multimodal_decode", qMultimodalDecode, Some(
      "SELECT doc_id id, CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END kind, " +
        "CAST(16 + doc_id % 32 AS INTEGER) width, CAST(16 + doc_id % 24 AS INTEGER) height, " +
        "1 frames FROM documents ORDER BY doc_id")),
    ("q_multimodal_audio", qMultimodalAudio, Some(
      "SELECT doc_id id, 8000 sample_rate, 1 channels, 16 bits, " +
        "CAST(800 + doc_id % 800 AS BIGINT) frames FROM documents ORDER BY doc_id")),
    ("q_multimodal_phash", qMultimodalPhash, Some(
      // predicts every pixel from the generator contract (id-seeded RGB,
      // low 24 bits of id*2654435761 + x*31 + y*17) and replays the same
      // integer aHash block arithmetic the kernel runs on DECODED pixels
      "WITH d AS (SELECT doc_id id, 16 + doc_id % 32 w, 16 + doc_id % 24 h FROM documents), " +
        "xs AS (SELECT unnest(range(0, 47)) x), ys AS (SELECT unnest(range(0, 39)) y), " +
        "pv AS (SELECT id, w, h, x, y, (id * 2654435761 + x * 31 + y * 17) % 16777216 p " +
        "FROM d CROSS JOIN xs CROSS JOIN ys WHERE x < w AND y < h), " +
        "g AS (SELECT id, w, h, x * 8 // w bx, y * 8 // h bq, " +
        "((p // 65536) % 256 + (p // 256) % 256 + p % 256) // 3 gray FROM pv), " +
        "bs AS (SELECT id, w, h, bq, bx, sum(gray) sb, count(*) cb FROM g GROUP BY 1, 2, 3, 4, 5), " +
        "t AS (SELECT id, sum(sb) s, sum(cb) n FROM bs GROUP BY 1), " +
        "bits AS (SELECT bs.id, bs.w, bs.h, bq * 8 + bx pos, " +
        "CASE WHEN sb * n > s * cb THEN 1 ELSE 0 END bv FROM bs JOIN t USING (id)) " +
        "SELECT id doc_id, CAST(w AS BIGINT) w, CAST(h AS BIGINT) h, " +
        "string_agg(CAST(bv AS VARCHAR), '' ORDER BY pos) phash, " +
        "CAST(sum(bv) AS BIGINT) nbits FROM bits GROUP BY 1, 2, 3 ORDER BY doc_id")),
    ("q_text_lang_confusion", qTextLangConfusion, Some(
      "WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) tok FROM documents), " +
        "sc AS (SELECT doc_id, CAST(len(list_intersect(tok, ['der','die','das','und','ist','ein','nicht'])) AS BIGINT) s_de, " +
        "CAST(len(list_intersect(tok, ['the','a','of','and','to','in','is'])) AS BIGINT) s_en, " +
        "CAST(len(list_intersect(tok, ['el','la','de','y','que','un','es'])) AS BIGINT) s_es, " +
        "CAST(len(list_intersect(tok, ['le','la','de','et','un','est','que'])) AS BIGINT) s_fr FROM t), " +
        "pr AS (SELECT doc_id, CASE WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es' ELSE 'fr' END pred_lang " +
        "FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr) m FROM sc)), " +
        "mx AS (SELECT d.lang, pr.pred_lang, CAST(count(*) AS BIGINT) n " +
        "FROM pr JOIN documents d USING (doc_id) GROUP BY 1, 2) " +
        "SELECT lang, pred_lang, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 6) recall " +
        "FROM mx ORDER BY lang, pred_lang")),
    ("q_multimodal_framesample", qMultimodalFramesample, Some(
      "WITH m AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) % 16 + 1 frames, sha256(text) sha FROM documents), " +
        "u AS (SELECT doc_id, sha, unnest(range(0, frames, 2)) f FROM m) " +
        "SELECT doc_id, CAST(f AS BIGINT) frame_idx, sha256(sha || ':' || CAST(f AS VARCHAR)) frame_sha " +
        "FROM u ORDER BY doc_id, frame_idx")),
    ("q_multimodal_features", qMultimodalFeatures, Some(
      "SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) byte_len, sha256(text) sha, " +
        "CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) width, CAST(octet_length(CAST(text AS BLOB)) % 480 AS BIGINT) height, " +
        "CAST(octet_length(CAST(text AS BLOB)) % 16 + 1 AS BIGINT) frames FROM documents ORDER BY doc_id LIMIT 1000")),
  )
}
