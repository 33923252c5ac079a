package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for text corpora, scale-first.
  *
  * Tiers (cheapest → most thorough):
  *  1. `exactDedup` — md5-keyed group-by. One shuffle on a 128-bit key;
  *     linear at any corpus size.
  *  2. `minHash` + `lshCandidates` — near-dup candidate generation.
  *     Signatures are a per-row projection; banding explodes each doc into
  *     `bands` rows and self-joins on (band, bandHash) — the classic
  *     shingle→minhash→band→bucket-join pipeline. Shuffle volume is
  *     bands × corpus, NOT corpus²; the only pairs materialized are bucket
  *     collisions.
  *  3. `nearDupPairs` — candidates verified with exact n-gram Jaccard.
  *
  * All hashing is md5-derived (deterministic, engine-reproducible — see
  * LlmScale header). SimHash (`simhashBits`) gives a 60-bit
  * locality-sensitive fingerprint whose hamming distance bounds token-set
  * divergence; `simhashBlocks` gives pigeonhole blocking keys (any pair at
  * hamming ≤ 3 shares at least one of 4 blocks) for a bounded
  * candidate join.
  */
object Dedup {

  /** 60-bit md5-derived hash (SQL fragment), seeded; reproducible in
    * DuckDB as CAST('0x'||substr(md5(seed||':'||x),1,15) AS BIGINT). Shared
    * by the sketch operators and the oracle-backed catalog queries. */
  private[operators] def h60(seedExpr: String, x: String) =
    s"cast(conv(substr(md5(concat($seedExpr, ':', $x)), 1, 15), 16, 10) as bigint)"

  /** Distinct word-`n`-gram shingles of `textCol` as column `shingles`. */
  def withShingles(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    df.withColumn("__w", split(col(textCol), " "))
      .filter(size(col("__w")) >= n)
      .withColumn("shingles", expr(
        s"array_distinct(transform(sequence(0, size(__w)-$n), i -> concat_ws(' ', ${
          (0 until n).map(i => s"__w[i+$i]").mkString(", ")})))"))
      .drop("__w")
  }

  /** One keeper row per distinct text: (text md5, keep_id = min id, n). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** MinHash signature column `sig` (array of `numHashes` minima) over
    * `shingles` (call withShingles first). */
  def minHash(df: DataFrame, numHashes: Int = 32): DataFrame =
    df.withColumn("sig", expr(
      s"transform(sequence(0, ${numHashes - 1}), h -> array_min(transform(shingles, x -> ${h60("cast(h as string)", "x")})))"))

  /** LSH banding: explode signatures into (band, bandHash) keys and
    * self-join → candidate id pairs (id_a < id_b), deduplicated. */
  def lshCandidates(sigDf: DataFrame, idCol: String, bands: Int): DataFrame = {
    val banded = sigDf
      .select(col(idCol).as("__id"), col("sig"))
      .withColumn("band", explode(expr(s"sequence(0, $bands - 1)")))
      .withColumn("band_hash",
        md5(concat_ws(",", col("band"),
          expr(s"concat_ws(',', slice(sig, band * (size(sig) div $bands) + 1, size(sig) div $bands))"))))
    val a = banded.select(col("__id").as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col("__id").as("id_b"), col("band").as("band2"), col("band_hash").as("band_hash2"))
    a.join(b, col("band") === col("band2") && col("band_hash") === col("band_hash2") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Candidates verified with exact Jaccard ≥ threshold. `docs` must carry
    * (idCol, shingles). */
  def nearDupPairs(docs: DataFrame, idCol: String, threshold: Double,
                   numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val sigs = minHash(docs, numHashes)
    val cands = lshCandidates(sigs, idCol, bands)
    val a = docs.select(col(idCol).as("id_a"), col("shingles").as("__ga"))
    val b = docs.select(col(idCol).as("id_b"), col("shingles").as("__gb"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("__inter", size(array_intersect(col("__ga"), col("__gb"))))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (size(col("__ga")) + size(col("__gb")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit SimHash of the distinct-token set, as a bit array column
    * `simhash_bits` (index 0 = lowest bit). */
  def simhashBits(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__th", expr(
        s"transform(array_distinct(split($textCol, ' ')), x -> ${h60("'s'", "x")})"))
      .withColumn("simhash_bits", expr(
        "transform(sequence(0, 59), b -> if(aggregate(__th, 0, (acc, h) -> acc + if((shiftright(h, b) & 1) = 1, 1, -1)) > 0, 1, 0))"))
      .drop("__th")

  /** Pigeonhole blocking: 4 × 15-bit blocks of the simhash. Pairs within
    * hamming ≤ 3 agree on ≥ 1 block, so an equi-join per block finds them
    * without a quadratic comparison. */
  def simhashBlocks(df: DataFrame): DataFrame =
    df.withColumn("block", explode(expr(
      "transform(sequence(0, 3), blk -> struct(blk as block_id, " +
        "aggregate(slice(simhash_bits, blk * 15 + 1, 15), 0L, (acc, bit) -> acc * 2 + bit) as block_val))")))
      .select(col("*"), col("block.block_id"), col("block.block_val"))
      .drop("block")
}
