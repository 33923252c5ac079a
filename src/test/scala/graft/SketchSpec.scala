package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Error-bound property tests for the sketch tier (oracle-less queries):
  * the same pattern as the ANN recall assertions — approximate answers
  * must sit provably close to the exact ones on the fixture data. */
class SketchSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact per event_type") {
    val approx = Sketches.qSketchDistinct(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx within tight rank tolerance of exact percentiles") {
    val approx = Sketches.qSketchQuantile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"),
        min("value").as("lo"), max("value").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    exact.foreach { case (k, (p50, p95, p99, lo, hi)) =>
      val (a50, a95, a99) = approx(k)
      val tol = (hi - lo) * 0.02 // accuracy 10000 on ~2k rows/group: near-exact
      assert(math.abs(a50 - p50) <= tol, s"$k p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) <= tol, s"$k p95: $a95 vs $p95")
      assert(math.abs(a99 - p99) <= tol, s"$k p99: $a99 vs $p99")
    }
  }

  test("HLL: merged per-day sketches ≡ direct whole-table sketch; within 5% of exact") {
    val merged = Sketches.qSketchHllMerge(spark, sf001).head()
    val mergedEst = merged.getLong(0)
    assert(merged.getLong(1) > 1, "fixture must span multiple days")
    val direct = Tables.events(spark, sf001)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .head().getLong(0)
    assert(mergedEst == direct,
      s"sketch union must be lossless at equal lgK: merged=$mergedEst direct=$direct")
    val exact = Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(math.abs(mergedEst - exact).toDouble / exact <= 0.05,
      s"merged=$mergedEst exact=$exact")
  }
}
