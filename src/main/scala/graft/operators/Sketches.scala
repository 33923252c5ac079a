package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY §2.1-J, parked in round 1): the approximate,
  * mergeable summaries a 100 TB TSDB actually serves dashboards from.
  * Declared WITHOUT oracles (sketch internals differ across engines by
  * design); correctness is bounded by property tests (SketchSpec) against
  * the exact answers, the same pattern as the ANN recall assertions.
  *
  * Scale notes: all three are single-shuffle hash aggregates with partial
  * (map-side) combine — sketch states merge associatively, so they behave
  * exactly like sum/count at any scale. The HLL query additionally shows
  * the REAL production shape: sketch once per day at ingest, store the
  * binary sketch, answer any date-range distinct query later by unioning
  * day sketches — no re-scan of raw data (Apache DataSketches HLL via
  * Spark's hll_sketch_agg / hll_union_agg).
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** Approximate distinct users per event type (HyperLogLog++, rsd 1%). */
  val qSketchDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  /** Approximate p50/p95/p99 per event type (Greenwald-Khanna style,
    * accuracy 10000 → rank error ≤ n/10000). */
  val qSketchQuantile: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("q"))
      .select(col("event_type"),
        element_at(col("q"), 1).as("p50_approx"),
        element_at(col("q"), 2).as("p95_approx"),
        element_at(col("q"), 3).as("p99_approx"))
      .orderBy("event_type")

  /** Mergeable distinct-count: per-day DataSketches-HLL sketches of
    * user_id, unioned up to one estimate — the sketch-at-ingest /
    * merge-at-query TSDB pattern. SketchSpec asserts the merged estimate
    * EQUALS the direct whole-table sketch estimate (union is lossless at
    * equal lgK) and is within 5% of the exact distinct count. */
  val qSketchHllMerge: Q = (s, d) => {
    val perDay = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    perDay.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_users"),
      count(lit(1)).as("n_day_sketches"))
  }

  /** Fixed-bin value histogram per event type via the custom
    * `graft_hist` TypedImperativeAggregate (graft.functions.HistogramAgg)
    * — the one sketch whose semantics are EXACT, so unlike the three
    * above it carries a full cross-engine oracle: DuckDB rebuilds the
    * same 12-counter layout (underflow + 10 bins + overflow) from the
    * identical floor((v-lo)·bins/(hi-lo)) IEEE expression. */
  val qSketchHistAgg: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(expr("graft_hist(value, 0.0d, 100.0d, 10)").as("hist"))
      // posexplode to scalar (event_type, bin_idx, n) rows: the driver's
      // comparator can't hash array-typed cells
      .select(col("event_type"), posexplode(col("hist")).as(Seq("b", "n")))
      .select(col("event_type"), col("b").cast("long").as("bin_idx"), col("n"))
      .orderBy("event_type", "bin_idx")
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_sketch_distinct", qSketchDistinct, None), // approximate by design; error bounded in SketchSpec
    ("q_sketch_quantile", qSketchQuantile, None), // approximate by design; rank error bounded in SketchSpec
    ("q_sketch_hll_merge", qSketchHllMerge, None), // approximate by design; merge-losslessness asserted in SketchSpec
    ("q_sketch_hist_agg", qSketchHistAgg, Some(
      "WITH b AS (SELECT event_type, CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 11 " +
        "ELSE 1 + CAST(floor((value - 0.0) * 10 / (100.0 - 0.0)) AS INT) END idx FROM events), " +
        "c AS (SELECT event_type, idx, CAST(count(*) AS BIGINT) n FROM b GROUP BY 1, 2), " +
        "g AS (SELECT event_type, i FROM (SELECT DISTINCT event_type FROM events), (SELECT unnest(range(12)) i)), " +
        "j AS (SELECT g.event_type, g.i, coalesce(c.n, 0) n FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.idx = g.i) " +
        "SELECT event_type, CAST(i AS BIGINT) bin_idx, n FROM j ORDER BY event_type, bin_idx"))
  )
}
