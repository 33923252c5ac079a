package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers:
  *  - `bruteTopK` — exact cosine top-k. O(n) per probe; the correctness
  *    oracle and the right answer for small candidate sets.
  *  - `annTopK` / `srpBucket` — sign-random-projection LSH. Each vector gets
  *    a small integer bucket from the signs of `nPlanes` fixed ±1
  *    hyperplanes; similar vectors collide with high probability. Probing
  *    cost drops from O(n) to O(n / 2^planes) expected. This is the scale
  *    path: bucketing is a per-row projection (no shuffle), probing is an
  *    equi-join on `bucket` — broadcastable for small probe sets, shuffle
  *    hash join on bucket otherwise. For 100 TB corpora, persist `bucket`
  *    as a partition/bucketing column so probes prune at the source.
  *
  * The hyperplanes are md5-derived (seed, dim) → ±1, generated driver-side
  * as literals — deterministic across sessions and engines, no RNG state.
  */
object Similarity {

  /** Deterministic ±1 hyperplane matrix: sign h,d = low bit of
    * md5("h:d"). */
  def srpPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { h =>
      (0 until dim).map { dd =>
        val digest = md.digest(s"$h:$dd".getBytes(StandardCharsets.UTF_8))
        if ((digest.last & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Bucket id in [0, 2^nPlanes) from hyperplane signs of column `vecCol`.
    * Pure codegen'd expression — no UDF, no shuffle. Fails loudly on a
    * vector whose length ≠ `dim`: zip_with null-pads a mismatched vector,
    * which would NULL every dot product and silently collapse all vectors
    * into bucket 0 (ANN degrades to a single-bucket scan). */
  def srpBucket(vecCol: String, nPlanes: Int, dim: Int = 64): Column = {
    val planes = srpPlanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.foldLeft(lit(0)) { case (acc, (plane, h)) =>
      val planeArr = s"array(${plane.mkString(", ")})"
      val dot = expr(
        s"aggregate(zip_with($vecCol, $planeArr, (x, y) -> cast(x as double) * y), cast(0 as double), (acc, t) -> acc + t)")
      acc + when(dot > 0, lit(1 << h)).otherwise(lit(0))
    }
    when(size(col(vecCol)) === dim, bucket).otherwise(expr(
      s"raise_error(concat('graft srpBucket: vector length ', cast(size($vecCol) as string), ' != dim $dim'))"))
  }

  /** Exact all-pairs cosine ≥ threshold, (id_a < id_b).
    *
    * Shape: the vector table is collected and broadcast ONCE (what a
    * broadcast hash join does internally); the outer loop stays distributed
    * — each partition streams its rows against the broadcast block in a
    * primitive double loop with precomputed norms. No 4M-row join
    * materialization, no per-pair boxing. Per-pair arithmetic is the same
    * left-to-right double accumulation as DuckDB's list_cosine_similarity
    * (dot / (sqrt(na)·sqrt(nb))) — results are bit-identical.
    *
    * Scale: valid while one side fits in a broadcast (~millions of small
    * vectors). Beyond that, block the inner side into B chunks and union
    * the B passes, or switch to the LSH candidate path (`srpBucket`) —
    * exact all-pairs is O(n²) by definition and should only ever run
    * inside a bucket/block at 100 TB scale. */
  def allPairsAboveThreshold(emb: DataFrame, idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val rows: Array[(Long, Array[Double])] = emb
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])].collect()
      .map { case (i, v) => (i, v.toArray.map(_.toDouble)) }
      .sortBy(_._1)
    val norms: Array[Double] = rows.map { case (_, v) =>
      var i = 0; var na = 0.0
      while (i < v.length) { na += v(i) * v(i); i += 1 }
      math.sqrt(na)
    }
    val bc = s.sparkContext.broadcast((rows, norms))
    emb.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
      .flatMap { case (ida, vaSeq) =>
        val (all, nrm) = bc.value
        val va = new Array[Double](vaSeq.length)
        var i = 0
        while (i < va.length) { va(i) = vaSeq(i).toDouble; i += 1 }
        var naAcc = 0.0; i = 0
        while (i < va.length) { naAcc += va(i) * va(i); i += 1 }
        val na = math.sqrt(naAcc)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < all.length) {
          val (idb, vb) = all(j)
          if (idb > ida) {
            var dot = 0.0; var k = 0
            while (k < va.length) { dot += va(k) * vb(k); k += 1 }
            val sim = dot / (na * nrm(j))
            if (sim >= threshold) out += ((ida, idb, sim))
          }
          j += 1
        }
        out.result()
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** Exact cosine top-k neighbors of `probeId` (excluded from results). */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String,
                probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col(idCol) === probeId).select(col(vecCol).as("__a"))
    emb.filter(col(idCol) =!= probeId)
      .select(col(idCol), col(vecCol).as("__b"))
      .crossJoin(broadcast(probe))
      .withColumn("sim", Llm.cosineNative(emb.sparkSession, "__a", "__b"))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) index: k centroids from deterministic seeded
    * k-means (initial centroids = k lowest-id vectors, `iters` Lloyd
    * rounds), returning (assignments with a `cluster` column, centroid
    * array). Centroid recomputation is distributed (posexplode →
    * per-(cluster, dim) mean); only the k×dim centroid matrix ever reaches
    * the driver. At corpus scale the cluster id becomes a partition column
    * so probes read only nProbe partitions. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int = 2): (DataFrame, Array[Array[Double]]) = {
    val s = emb.sparkSession
    import s.implicits._
    var centroids: Array[Array[Double]] = emb
      .orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol)).as[Seq[Float]].collect()
      .map(_.toArray.map(_.toDouble))

    def assignUdf(cents: Array[Array[Double]]) = udf { (v: Seq[Float]) =>
      var best = 0; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val ct = cents(c)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          val x = v(i).toDouble; dot += x * ct(i); na += x * x; nb += ct(i) * ct(i); i += 1
        }
        val sim = dot / (math.sqrt(na) * math.sqrt(nb))
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      best
    }

    var assigned = emb.withColumn("cluster", assignUdf(centroids)(col(vecCol)))
    for (_ <- 1 to iters) {
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCluster.get(c)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
          .getOrElse(centroids(c)) // empty cluster keeps its old centroid
      }.toArray
      assigned = emb.withColumn("cluster", assignUdf(centroids)(col(vecCol)))
    }
    (assigned, centroids)
  }

  /** IVF search: exact cosine inside the `nProbe` clusters whose centroids
    * are nearest the probe vector. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, probeId: Long,
              topK: Int, k: Int = 8, nProbe: Int = 2, iters: Int = 2): DataFrame = {
    val (assigned, centroids) = ivfIndex(emb, idCol, vecCol, k, iters)
    val probeVec = emb.filter(col(idCol) === probeId)
      .select(col(vecCol)).head().getSeq[Float](0).toArray.map(_.toDouble)
    val probed = centroids.zipWithIndex.map { case (ct, c) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < probeVec.length) {
        dot += probeVec(i) * ct(i); na += probeVec(i) * probeVec(i); nb += ct(i) * ct(i); i += 1
      }
      (c, dot / (math.sqrt(na) * math.sqrt(nb)))
    }.sortBy(-_._2).take(nProbe).map(_._1).toSet
    val probe = emb.filter(col(idCol) === probeId).select(col(vecCol).as("__a"))
    assigned
      .filter(col("cluster").isin(probed.toSeq: _*) && col(idCol) =!= probeId)
      .select(col(idCol), col(vecCol).as("__b"))
      .crossJoin(broadcast(probe))
      .withColumn("sim", Llm.cosineNative(emb.sparkSession, "__a", "__b"))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Approximate top-k: search only the probe's LSH bucket. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, nPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val bucketed = emb.withColumn("__bucket", srpBucket(vecCol, nPlanes, dim))
    val probe = bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__a"), col("__bucket").as("__pb"))
    bucketed.filter(col(idCol) =!= probeId)
      .select(col(idCol), col(vecCol).as("__b"), col("__bucket"))
      .join(broadcast(probe), col("__bucket") === col("__pb"))
      .withColumn("sim", Llm.cosineNative(emb.sparkSession, "__a", "__b"))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
