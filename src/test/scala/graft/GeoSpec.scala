package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

/** Geo tier semantics, each checked against an INDEPENDENT formulation:
  * the grid-bucketed bbox join against the naive quadratic predicate,
  * grid-density clustering against a driver-side union-find, kNN against
  * a collected brute force, and the trajectory fold against hand
  * arithmetic on a crafted polyline. */
class GeoSpec extends SparkSuite {
  import spark.implicits._

  test("bbox join: grid-bucketed candidates ≡ naive BETWEEN predicate (no dup, no drop)") {
    val got = Geo.qGeoBboxJoin(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // naive reference: cross join + exact predicate, no cell bucketing
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
      .select(col("c_custkey").as("id"),
        (((col("c_custkey") * lit(7919L)) % 1700L).cast("double") / 10.0 - 85.0).as("lat"),
        (((col("c_custkey") * lit(104729L)) % 3600L).cast("double") / 10.0 - 180.0).as("lon"))
    val supp = spark.read.parquet(s"$sf001/supplier.parquet")
      .select(col("s_suppkey").as("bid"),
        (((col("s_suppkey") * lit(4817L)) % 1500L).cast("double") / 10.0 - 75.0).as("blat"),
        (((col("s_suppkey") * lit(12391L)) % 3300L).cast("double") / 10.0 - 165.0).as("blon"),
        ((col("s_suppkey") % 7L) + 1L).cast("double").as("hh"),
        ((col("s_suppkey") % 11L) + 2L).cast("double").as("hw"))
    val want = supp.crossJoin(cust)
      .filter(col("lat") >= col("blat") - col("hh") && col("lat") <= col("blat") + col("hh") &&
        col("lon") >= col("blon") - col("hw") && col("lon") <= col("blon") + col("hw"))
      .groupBy("bid").agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("bid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("grid cluster: driver union-find equals the distributed star CC on the same core cells") {
    val got = Geo.qGeoGridCluster(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent reference: the DISTRIBUTED component algorithm
    // (Dedup.connectedComponentsStar) over the same 8-adjacency edges —
    // the device a fine-grid variant would swap in
    val cells = graft.operators.Geo.coreCells(spark, sf001)
      .withColumn("cell", col("cy") * 36L + col("cx")).cache()
    val a = cells.select(col("cell").as("id_a"), col("cy").as("ya"), col("cx").as("xa"))
    val b = cells.select(col("cell").as("id_b"), col("cy").as("yb"), col("cx").as("xb"))
    val edges = a.join(b,
      col("id_a") < col("id_b") &&
        abs(col("ya") - col("yb")) <= 1L && abs(col("xa") - col("xb")) <= 1L)
      .select("id_a", "id_b")
    val lbl = graft.operators.Dedup.connectedComponentsStar(edges)
    val want = cells.join(lbl, cells("cell") === lbl("id"), "left")
      .select(coalesce(col("lbl"), col("cell")).as("cluster_id"), col("n"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_cells"), sum("n").as("n_points"))
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    cells.unpersist(blocking = false)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("knn probe: 12 rows, ascending distance, head matches collected brute force") {
    val rows = Geo.qGeoKnnProbe(spark, sf001).collect()
    assert(rows.length == 12)
    val d2s = rows.map(_.getDouble(2))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a <= b })
    val best = spark.read.parquet(s"$sf001/customer.parquet")
      .select(col("c_custkey").as("id"),
        (((col("c_custkey") * lit(7919L)) % 1700L).cast("double") / 10.0 - 85.0).as("lat"),
        (((col("c_custkey") * lit(104729L)) % 3600L).cast("double") / 10.0 - 180.0).as("lon"))
      .collect().map(r => (r.getLong(0), {
        val dy = r.getDouble(1) - 17.3; val dx = r.getDouble(2) - 42.7; dy * dy + dx * dx
      })).minBy { case (id, d2) => (d2, id) }
    assert(rows.head.getLong(0) == best._1)
  }

  test("trajectory: crafted 3-point polyline sums exact segment lengths in ts order") {
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-geo"
    val t0 = 1704067200L
    def ns(sec: Long): Long = sec * 1000000000L
    // event ids 10, 20, 30 but out of time order: ts orders them 20,10,30
    Seq((20L, ns(t0 + 100), 1L, "view", 1.0, "{}"),
      (10L, ns(t0 + 200), 1L, "view", 1.0, "{}"),
      (30L, ns(t0 + 300), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    def pt(e: Long): (Double, Double) =
      (((e * 4621L) % 1600L).toDouble / 10.0 - 80.0, ((e * 9043L) % 3500L).toDouble / 10.0 - 175.0)
    def leg(a: (Double, Double), b: (Double, Double)): Double = {
      val dy = b._1 - a._1; val dx = b._2 - a._2; math.sqrt(dy * dy + dx * dx)
    }
    val legs = Seq(leg(pt(20), pt(10)), leg(pt(10), pt(30)))
    val mu = legs.map(l => math.floor(l * 1e6 + 0.5).toLong).sum
    val row = Geo.qGeoTrajectory(spark, dir).collect().head
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6 // roundd on positives
    assert(row.getDouble(2) == r6(mu.toDouble / 1e6))
    assert(row.getDouble(3) == r6(legs.max))
  }

  test("od matrix: endpoints follow event TIME (id breaks ties), not id order") {
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-test-geo-od"
    val t0 = 1704067200L
    def ns(sec: Long): Long = sec * 1000000000L
    def cell(e: Long): Long = {
      val lat = ((e * 4621L) % 1600L).toDouble / 10.0 - 80.0
      val lon = ((e * 9043L) % 3500L).toDouble / 10.0 - 175.0
      (math.floor((lat + 90.0) / 10.0) * 36 + math.floor((lon + 180.0) / 10.0)).toLong
    }
    // user 1: ids out of time order — origin is the EARLIEST ts (id 50),
    // destination the latest (id 10); user 2: tied ts at the end — the
    // LARGER id (31) wins the max(struct) destination
    Seq((50L, ns(t0 + 10), 1L, "view", 1.0, "{}"),
      (40L, ns(t0 + 20), 1L, "view", 1.0, "{}"),
      (10L, ns(t0 + 30), 1L, "view", 1.0, "{}"),
      (20L, ns(t0 + 5), 2L, "view", 1.0, "{}"),
      (30L, ns(t0 + 40), 2L, "view", 1.0, "{}"),
      (31L, ns(t0 + 40), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Geo.qGeoOdMatrix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((cell(50L), cell(10L), 1L), (cell(20L), cell(31L), 1L))
    assert(got == want, s"got $got want $want")
  }

  test("st heatmap: at most 10 cells per day, counts non-increasing within a day") {
    val rows = Geo.qGeoStHeatmap(spark, sf001).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (day, rs) =>
      assert(rs.length <= 10, s"$day has ${rs.length} ranked cells")
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to rs.length).toSeq, s"$day ranks not dense")
      val counts = byRank.map(_._3)
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, s"$day counts not sorted")
    }
  }

  test("hub distance: every nation present, min ≤ avg ≤ max, all distances on-sphere") {
    val rows = Geo.qGeoHubDistance(spark, sf001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (mn, mx, av) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn >= 0.0 && mn <= av + 0.06 && av <= mx + 0.06, s"$r") // avg is hectometer-floored
      assert(mx <= math.Pi * 6371.0 + 1e-6) // half circumference bound
    }
  }
}
