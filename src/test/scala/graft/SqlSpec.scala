package graft

import org.apache.spark.sql.functions._

/** The SQL front door (graft.Graft.registerAll): a SQL-only user must be
  * able to run the engine's surface — tables as views, graft_* functions
  * resolving in SQL — and get the same answers the DataFrame API gives. */
class SqlSpec extends SparkSuite {

  private lazy val ready: Unit = Graft.registerAll(spark, sf0001)

  test("registerAll publishes all ten corpus tables as queryable views") {
    ready
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing")
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1, s"view $n empty")
    }
  }

  test("SQL hourly rollup equals the DataFrame twin") {
    ready
    val viaSql = spark.sql(
      """SELECT date_trunc('hour', ts) h, event_type, count(*) cnt
        |FROM events GROUP BY 1, 2""".stripMargin)
    val viaDf = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(viaSql.except(viaDf).count() == 0 && viaDf.except(viaSql).count() == 0)
  }

  test("graft_tdigest p95 per event_type resolves in SQL and lands within rank tolerance") {
    ready
    val got = spark.sql(
      """SELECT event_type,
        |       graft_tdigest_quantile(graft_tdigest(value, 100), CAST(0.95 AS DOUBLE)) p95
        |FROM events GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rank check against the exact distribution: the sketch's p95 must sit
    // between the exact p90 and max per group
    val exact = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.90)").as("p90"), max("value").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p90, mx)) =>
      assert(got(k) >= p90 && got(k) <= mx, s"$k: p95=${got(k)} outside [$p90, $mx]")
    }
  }

  test("graft_kmv distinct-users estimate per day is exact below saturation") {
    ready
    val rows = spark.sql(
      """SELECT CAST(date_trunc('day', ts) AS DATE) d,
        |       graft_kmv_est(graft_kmv(user_id, 4096)) est,
        |       count(DISTINCT user_id) exact
        |FROM events GROUP BY 1""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getLong(2).toDouble,
        s"${r.getDate(0)}: kmv est ${r.getDouble(1)} != exact ${r.getLong(2)} (undersaturated must be exact)")
    }
  }

  test("graft_cosine top-10 in pure SQL equals the catalog q_sim_topk") {
    ready
    val viaSql = spark.sql(
      """SELECT b.vec_id, round(graft_cosine(a.embedding, b.embedding), 6) sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY sim DESC, b.vec_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaCatalog = SparkEntry.queries("q_sim_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaCatalog)
  }

  test("dedup candidates in SQL: graft_shingles + graft_minhash resolve and shape correctly") {
    ready
    val sig = spark.sql(
      """SELECT doc_id, graft_minhash(text, 3, 8) sig, graft_shingles(text, 3) sh
        |FROM documents""".stripMargin)
    val n = sig.count()
    assert(n == 500)
    assert(sig.filter(size(col("sig")) === 8).count() == n, "every signature has 8 hashes")
    assert(sig.filter(size(col("sh")) > 0).count() == n, "every doc has shingles")
  }
}
