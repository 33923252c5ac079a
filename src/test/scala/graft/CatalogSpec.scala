package graft

import org.apache.spark.sql.Row

/** Catalog-level integration tests on sf0.001 (SURVEY.md §5 items 1 & 5).
  *
  * Golden values were produced by DuckDB 1.0.0 on the same parquet files —
  * drift in any of them is a determinism-contract regression that would
  * fail the driver's hash-compare gate before the round even runs.
  */
class CatalogSpec extends SparkSuite {

  test("every catalog query runs and none throws (Bench hides failures as -1)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry() returns rows (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, with matching names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o diff q}")
  }

  test("no duplicate catalog names: the queries Map must not shadow a registration") {
    // queries is a Map built from the per-module Seqs; a repeated name keeps
    // only the LAST registration and the first silently vanishes from the
    // gate (this bit round 11: q_ts_seasonal_decomp registered twice).
    val perModule =
      Seq(graft.operators.Relational.all.size, graft.operators.TimeSeries.all.size,
        graft.operators.Llm.all.size, graft.operators.Analytics.all.size,
        graft.streaming.StreamingQueries.all.size, graft.operators.LlmScale.all.size,
        graft.operators.Sketches.all.size, graft.sources.IngestQueries.all.size,
        graft.operators.Corpus.all.size, graft.operators.Ops.all.size,
        graft.operators.Signal.all.size, graft.operators.Graphs.all.size,
        graft.operators.Retrieval.all.size, graft.operators.Features.all.size,
        graft.operators.Promql.all.size, graft.operators.PromqlFront.all.size,
        graft.operators.Sre.all.size, graft.operators.Quality.all.size,
        graft.operators.Fit.all.size, graft.operators.Mining.all.size,
        graft.operators.Change.all.size, graft.operators.Stats.all.size,
        graft.operators.Survival.all.size, graft.operators.Geo.all.size,
        graft.operators.Token.all.size, graft.operators.Mix.all.size).sum
    assert(SparkEntry.queries.size == perModule,
      s"catalog Map has ${SparkEntry.queries.size} entries but modules register $perModule — a name is duplicated")
  }

  test("golden: q_agg_hash matches DuckDB on sf0.001") {
    val rows = SparkEntry.queries("q_agg_hash")(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "cnt").collect()
    val expect = Seq(
      ("A", "F", 24153.0, 951L), ("A", "O", 23871.0, 960L),
      ("N", "F", 27034.0, 1043L), ("N", "O", 24968.0, 981L),
      ("R", "F", 23567.0, 946L), ("R", "O", 24892.0, 973L))
    assert(rows.toSeq.map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))) == expect)
  }

  test("golden: q_sort_topk head matches DuckDB on sf0.001") {
    val top = SparkEntry.queries("q_sort_topk")(spark, sf0001).limit(3).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((988L, 499705.05), (605L, 499695.63), (485L, 499116.01)))
  }

  test("golden: session count matches DuckDB gaps-and-islands on sf0.001") {
    assert(SparkEntry.queries("q_ts_session")(spark, sf0001).count() == 946L)
  }

  test("golden: q_sim_topk top-3 matches DuckDB on sf0.001") {
    val top = SparkEntry.queries("q_sim_topk")(spark, sf0001).limit(3).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((17L, 0.334456), (225L, 0.315127), (12L, 0.311027)))
  }

  test("golden: q_ts_twa head matches DuckDB on sf0.001") {
    val rows = SparkEntry.queries("q_ts_twa")(spark, sf0001).limit(3).collect()
    assert(rows.map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((0L, "2024-01-01", 1L, 29.61), (0L, "2024-01-03", 3L, 99.545865),
        (0L, "2024-01-04", 1L, 0.88)))
  }

  test("golden: q_ts_asof_nearest (native custom exec) matches DuckDB on sf0.001") {
    val df = SparkEntry.queries("q_ts_asof_nearest")(spark, sf0001)
    assert(df.count() == 397L)
    val head = df.limit(3).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2))).toSeq
    assert(head == Seq(
      (0L, "2024-01-01 00:00:00.0", 29.61),
      (0L, "2024-01-02 00:00:00.0", 143.51),
      (0L, "2024-01-03 00:00:00.0", 113.39)))
  }

  test("table loaders see expected row counts on sf0.001") {
    assert(Tables.lineitem(spark, sf0001).count() == 6000)
    assert(Tables.orders(spark, sf0001).count() == 1500)
    assert(Tables.events(spark, sf0001).count() == 1000)
    assert(Tables.documents(spark, sf0001).count() == 500)
    assert(Tables.embeddings(spark, sf0001).count() == 500)
  }

  test("events.ts nanos recipe: µs-truncated NTZ, no double-division drift") {
    val r: Row = Tables.events(spark, sf0001)
      .selectExpr("min(ts) mn", "max(ts) mx").head()
    // DuckDB on the same file: min 2024-01-01 00:09:58.778549, max 2024-01-30 23:26:16.220708
    assert(r.get(0).toString == "2024-01-01T00:09:58.778549")
    assert(r.get(1).toString == "2024-01-30T23:26:16.220708")
  }
}
