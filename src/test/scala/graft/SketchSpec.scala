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

  /** Rank of `v` in the exact per-group value set: the fraction of values
    * ≤ v — the error metric t-digest actually bounds (value-space error
    * depends on local density; rank-space error does not). */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i + 1 else -(i + 1)
    pos.toDouble / sorted.length
  }

  private def exactValues(groupCol: String = "event_type"): Map[String, Array[Double]] =
    Tables.events(spark, sf001).select(groupCol, "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }

  test("t-digest quantiles within rank tolerance of exact distribution") {
    val approx = Sketches.qSketchQuantile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = exactValues()
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, sorted) =>
      val (a50, a95, a99) = approx(k)
      // δ=200 bounds rank error ≲ q(1−q)/δ; 0.01 absolute is ~4× headroom
      // on ~2k rows/group while staying immune to aggregation-order noise
      assert(math.abs(rankOf(sorted, a50) - 0.50) <= 0.01, s"$k p50: $a50 rank=${rankOf(sorted, a50)}")
      assert(math.abs(rankOf(sorted, a95) - 0.95) <= 0.01, s"$k p95: $a95 rank=${rankOf(sorted, a95)}")
      assert(math.abs(rankOf(sorted, a99) - 0.99) <= 0.01, s"$k p99: $a99 rank=${rankOf(sorted, a99)}")
    }
  }

  test("t-digest cross-check: within value tolerance of oracle-backed q_ts_percentile") {
    // q_ts_percentile (TimeSeries, oracle-backed) computes EXACT
    // percentile_cont p50/p95 per event_type — the sketch must land close
    val approx = Sketches.qSketchQuantile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = operators.TimeSeries.qTsPercentile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ranges = exactValues().map { case (k, vs) => k -> (vs.last - vs.head) }
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      val tol = ranges(k) * 0.02
      assert(math.abs(a50 - p50) <= tol, s"$k p50: $a50 vs exact $p50")
      assert(math.abs(a95 - p95) <= tol, s"$k p95: $a95 vs exact $p95")
    }
  }

  test("t-digest: merged per-day sketches within rank tolerance of whole-range exact") {
    val r = Sketches.qSketchTdigestMerge(spark, sf001).head()
    assert(r.getLong(3) > 1, "fixture must span multiple days")
    val sorted = Tables.events(spark, sf001).select("value").collect().map(_.getDouble(0)).sorted
    // merged digests re-compress, so allow 2× the single-digest tolerance
    Seq(0.50 -> r.getDouble(0), 0.95 -> r.getDouble(1), 0.99 -> r.getDouble(2)).foreach {
      case (q, a) =>
        assert(math.abs(rankOf(sorted, a) - q) <= 0.02, s"merged p$q: $a rank=${rankOf(sorted, a)}")
    }
  }

  test("t-digest core: serialization round-trip and exactness on small inputs") {
    val d = new graft.functions.TDigest(100)
    (1 to 1000).foreach(i => d.add(i.toDouble, 1.0))
    val rt = graft.functions.TDigest.deserialize(d.serialize())
    assert(rt.totalWeight == 1000.0 && rt.vMin == 1.0 && rt.vMax == 1000.0)
    // round-trip must preserve quantiles bit-for-bit (same centroid set)
    Seq(0.01, 0.25, 0.5, 0.75, 0.99).foreach { q =>
      assert(d.quantile(q) == rt.quantile(q), s"round-trip q=$q")
      assert(math.abs(d.quantile(q) - (1 + q * 999)) <= 10.0, s"uniform q=$q: ${d.quantile(q)}")
    }
    // tails anchored at observed extremes
    assert(d.quantile(0.0) == 1.0 && d.quantile(1.0) == 1000.0)
  }

  test("misra-gries core: exact at capacity; under/over bounds and heavy-hitter presence under eviction and merge") {
    import graft.functions.FreqSketch
    // capacity ≥ distinct → no decrement ever fires: the summary IS exact
    val a = new FreqSketch(8)
    val feed = Seq.tabulate(500)(i => s"k${i % 5}")
    feed.foreach(a.add(_, 1))
    assert(a.errBound == 0)
    assert(a.top(8).toMap == feed.groupBy(identity).map { case (k, v) => k -> v.size.toLong })
    // round-trip preserves entries and bookkeeping bit-for-bit
    val rt = FreqSketch.deserialize(a.serialize())
    assert(rt.top(8) == a.top(8) && rt.errBound == a.errBound && rt.totalWeight == a.totalWeight)

    // skewed stream (3 hot keys ≈ 80%, long singleton tail), capacity 8,
    // split across 3 sketches merged into one — the invariants
    //   est ≤ true,  true − est ≤ errBound ≤ N/(cap+1)
    // and "every item with true > errBound is present" must survive both
    // per-add eviction and the PODS'12 merge-trim
    val rnd = new scala.util.Random(42)
    val stream = Seq.fill(3000)(
      if (rnd.nextInt(10) < 8) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(500)}")
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sks = stream.grouped(1000).toSeq.map { p =>
      val s = new FreqSketch(8); p.foreach(s.add(_, 1)); s
    }
    val m = new FreqSketch(0) // adopts capacity from the first merged sketch
    sks.foreach(m.mergeFrom)
    assert(m.totalWeight == 3000)
    assert(m.errBound > 0, "tail must have forced decrements")
    assert(m.errBound <= 3000 / 9, s"errBound ${m.errBound} exceeds N/(cap+1)")
    val entries = m.top(8)
    entries.foreach { case (k, c) =>
      val t = exact(k)
      assert(c <= t && t - c <= m.errBound, s"$k: est $c true $t err ${m.errBound}")
    }
    val present = entries.map(_._1).toSet
    exact.filter(_._2 > m.errBound).keys.foreach(k =>
      assert(present(k), s"missing heavy hitter $k (true=${exact(k)} > err=${m.errBound})"))
    assert(exact.count(_._2 > m.errBound) == 3, "all three hot keys should clear the bound")
  }

  test("misra-gries heavy hitters: reported counts within error bound of exact user counts") {
    val rows = Sketches.qSketchFreqHh(spark, sf001).collect()
    assert(rows.nonEmpty, "merged summary emitted no entries")
    assert(rows.head.getLong(0) > 1, "fixture must span multiple days")
    val err = rows.head.getLong(1)
    val exact = Tables.events(spark, sf001)
      .groupBy(col("user_id").cast("string").as("u")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(err <= n / 33, s"err $err > N/(capacity+1) = ${n / 33}")
    rows.foreach { r =>
      val (u, c) = (r.getString(3), r.getLong(4))
      val t = exact(u)
      assert(c <= t && t - c <= err, s"user $u: cnt_min $c true $t err $err")
    }
  }

  test("histogram quantile: within one bin width of the exact percentile") {
    // uniform-within-bin interpolation can err by at most the bin width
    // (10.0 here) against the true percentile — and usually far less
    val got = Sketches.qSketchHistQuantile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = exactValues()
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, vs) =>
      // a percentile landing in the under/overflow bin clamps to lo/hi
      // (the Prometheus +Inf-bucket rule), so compare against the exact
      // percentile clamped into the histogram's range
      def pct(q: Double) =
        math.min(100.0, math.max(0.0, vs(math.ceil(q * vs.length).toInt - 1)))
      val (p50, p90) = got(k)
      assert(math.abs(p50 - pct(0.5)) <= 10.0, s"$k p50: hist $p50 vs exact ${pct(0.5)}")
      assert(math.abs(p90 - pct(0.9)) <= 10.0, s"$k p90: hist $p90 vs exact ${pct(0.9)}")
    }
  }

  test("bloom: zero false negatives, FPR within 2x theoretical, merge is bit-lossless") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val m = 65536; val k = 6; val n = 2000
    // member keys ≡ 13, probes ≡ 14 (mod 7919) — provably disjoint sets
    val keys = (0L until n.toLong).map(_ * 7919L + 13L)
    val bloom = keys.toDF("key")
      .agg(call_function("graft_bloom", col("key"), lit(m), lit(k)))
      .head().getAs[Array[Byte]](0)
    val falseNeg = keys.toDF("key")
      .filter(not(call_function("graft_might_contain", lit(bloom), col("key"))))
      .count()
    assert(falseNeg == 0L, s"bloom must never reject a member ($falseNeg rejected)")
    val nProbes = 20000
    val fp = (0L until nProbes.toLong).map(_ * 7919L + 14L).toDF("key")
      .filter(call_function("graft_might_contain", lit(bloom), col("key")))
      .count()
    val theo = math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    assert(fp.toDouble / nProbes <= 2.0 * theo + 0.001,
      s"measured FPR ${fp.toDouble / nProbes} vs theoretical $theo")
    // deterministic hashes ⇒ OR of partial blooms is BIT-identical to the
    // direct build over the union (what makes map-side combine sound)
    val merged = keys.toDF("key").withColumn("g", pmod(col("key"), lit(8)))
      .groupBy("g").agg(call_function("graft_bloom", col("key"), lit(m), lit(k)).as("sk"))
      .agg(call_function("graft_bloom_merge", col("sk")))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, bloom), "merge(partials) != direct build")
  }

  test("bloom: string keys round-trip with zero false negatives") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val words = (0 until 500).map(i => s"doc-$i-${i * 31}")
    val bloom = words.toDF("w")
      .agg(call_function("graft_bloom", col("w"), lit(8192), lit(5)))
      .head().getAs[Array[Byte]](0)
    val falseNeg = words.toDF("w")
      .filter(not(call_function("graft_might_contain", lit(bloom), col("w"))))
      .count()
    assert(falseNeg == 0L)
  }

  test("q_join_bloom_pruned ≡ the unpruned plain join (false positives removed by the join)") {
    val pruned = operators.Relational.qJoinBloomPruned(spark, sf001).collect()
    val plain = Tables.lineitem(spark, sf001)
      .join(
        Tables.orders(spark, sf001).filter(col("o_totalprice") > 400000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_totalprice")
      .agg(count(lit(1)).as("n_items"),
        operators.Num.roundd(operators.Num.roundd(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 8), 2).as("revenue"))
      .orderBy("l_orderkey")
      .collect()
    assert(pruned.nonEmpty, "fixture must produce joined groups")
    assert(pruned.toSeq == plain.toSeq)
  }

  test("KMV: undersaturated sketches are exact, incl. a partial-overlap intersection") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // A = 1..40, B = 21..60 hashed through the engine's h60; k=64 > 60
    // distinct values, so sketches keep everything and every estimate is
    // EXACT: |A|=40, |B|=60-21+1=40, |A∩B|=20
    val df = ((1 to 40).map(i => ("a", i.toLong)) ++ (21 to 60).map(i => ("b", i.toLong)))
      .toDF("side", "id")
    val h = graft.operators.Dedup.h60("'t'", "cast(id as string)")
    val row = df.agg(
      expr(s"graft_kmv(CASE WHEN side = 'a' THEN $h END, 64)").as("ska"),
      expr(s"graft_kmv(CASE WHEN side = 'b' THEN $h END, 64)").as("skb"))
      .select(expr("graft_kmv_est(ska)"), expr("graft_kmv_est(skb)"),
        expr("graft_kmv_inter(ska, skb)"))
      .head()
    assert(row.getDouble(0) == 40.0 && row.getDouble(1) == 40.0,
      s"undersaturated estimates must be exact: $row")
    assert(row.getDouble(2) == 20.0, s"undersaturated intersection must be exact: $row")
  }

  test("KMV: merged per-day sketches ≡ direct whole-table sketch; saturated est within 20%") {
    graft.functions.GraftFunctions.register(spark)
    val h = graft.operators.Dedup.h60("'kmv'", "cast(user_id as string)")
    val ev = Tables.events(spark, sf001)
    // merge-at-query: per-day sketches unioned up
    val merged = ev
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(expr(s"graft_kmv($h, 64)").as("sk"))
      .agg(expr("graft_kmv_merge(sk)").as("msk"))
      .select(expr("graft_kmv_est(msk)")).head().getDouble(0)
    // sketch-the-world directly
    val direct = ev.agg(expr(s"graft_kmv($h, 64)").as("sk"))
      .select(expr("graft_kmv_est(sk)")).head().getDouble(0)
    assert(merged == direct,
      s"KMV union is lossless (k smallest of union ⊆ union of per-part k smallest): merged=$merged direct=$direct")
    val exact = ev.select("user_id").distinct().count().toDouble
    assert(math.abs(merged - exact) / exact <= 0.20,
      s"saturated KMV estimate merged=$merged exact=$exact (k=64 → ~12.5% expected error)")
  }

  test("KMV: saturated partial-overlap intersection lands near truth") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // A = 1..2000, B = 1001..3000: |A|=|B|=2000, |A∩B|=1000, k=64 — both
    // sketches saturated, ρ genuinely estimated. KMV intersection error
    // at k=64 is large-ish (ρ adds binomial noise on ~k draws), so the
    // bound is deliberately generous — this guards against broken
    // estimator algebra (off by 2×), not sampling noise.
    val df = ((1 to 2000).map(i => ("a", i.toLong)) ++ (1001 to 3000).map(i => ("b", i.toLong)))
      .toDF("side", "id")
    val h = graft.operators.Dedup.h60("'t'", "cast(id as string)")
    val row = df.agg(
      expr(s"graft_kmv(CASE WHEN side = 'a' THEN $h END, 64)").as("ska"),
      expr(s"graft_kmv(CASE WHEN side = 'b' THEN $h END, 64)").as("skb"))
      .select(expr("graft_kmv_est(ska)"), expr("graft_kmv_est(skb)"),
        expr("graft_kmv_inter(ska, skb)"))
      .head()
    assert(math.abs(row.getDouble(0) - 2000) / 2000.0 <= 0.30, s"est(A)=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 2000) / 2000.0 <= 0.30, s"est(B)=${row.getDouble(1)}")
    assert(row.getDouble(2) > 300 && row.getDouble(2) < 1700,
      s"intersection est ${row.getDouble(2)} not near true 1000")
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

  test("count-min point queries never underestimate, and collisions do overestimate") {
    // 600 users across a 4×256 sketch: by pigeonhole every row has
    // colliding buckets, so at least one probe must carry overest > 0 —
    // while the CM guarantee (est ≥ exact, always) holds for every probe
    import spark.implicits._
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-cm"
    val rows = (0 until 600).flatMap { u =>
      (0 to u % 3).map(i => (u * 10L + i, 1704067200000000000L + u * 1000000000L, u.toLong, "click", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sketches.qSketchCmPoint(spark, dir)
      .select("exact", "est", "overest").as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 20)
    assert(out.forall { case (ex, est, ov) => est >= ex && ov == est - ex && ov >= 0 },
      s"CM must never underestimate: $out")
    // determinism: the sketch is md5-derived — a second build is identical
    val again = Sketches.qSketchCmPoint(spark, dir)
      .select("exact", "est", "overest").as[(Long, Long, Long)].collect().toSeq
    assert(again == out, "CM state must be bit-reproducible")
  }
}
