package graft

import graft.operators.{Analytics, Ops, Rank, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.AllTuples
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the distributed global-order machinery (Rank.scala) to the
  * exact single-partition windows it replaces: rank ≡ row_number,
  * running sum ≡ sum-over-window, ntile ≡ ntile — bit-for-bit on the
  * fixture tables under the strict total orders every caller uses —
  * and asserts the entity-rank family's DEFAULT plans carry no
  * single-partition window (the scale claim the operator docs make). */
class RankSpec extends SparkSuite {

  private def events = Tables.events(spark, sf0001)

  private def demands: DataFrame =
    events.groupBy("user_id").agg(count(lit(1)).as("dem"))

  test("withGlobalOrder rank+cum ≡ exact global window (asc order)") {
    val sort = Seq(col("dem").asc, col("user_id").asc)
    val got = Rank.withGlobalOrder(demands, sort, "rk", Seq(("dem", "cum")), 7)
      .select("user_id", "rk", "cum").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = Window.orderBy(sort: _*)
    val want = demands
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("dem").over(w))
      .select("user_id", "rk", "cum").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("withGlobalOrder rank+cum ≡ exact global window (desc order)") {
    val sort = Seq(col("dem").desc, col("user_id").asc)
    val got = Rank.withGlobalOrder(demands, sort, "rk", Seq(("dem", "cum")), 5)
      .select("user_id", "rk", "cum").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = Window.orderBy(sort: _*)
    val want = demands
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("dem").over(w))
      .select("user_id", "rk", "cum").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("withNtile ≡ exact window ntile for k in {2, 4, 5, 7}") {
    for (k <- Seq(2, 4, 5, 7)) {
      val sort = Seq(col("dem").asc, col("user_id").asc)
      val got = Rank.withNtile(demands, sort, k, "b", 6)
        .select("user_id", "b").collect().map(r =>
          (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val want = demands
        .withColumn("b", ntile(k).over(Window.orderBy(sort: _*)).cast("long"))
        .select("user_id", "b").collect().map(r =>
          (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"ntile($k) mismatch")
    }
  }

  test("withNtile: k larger than the row count degenerates to bucket = rank") {
    val tiny = demands.limit(3)
    val got = Rank.withNtile(tiny, Seq(col("user_id").asc), 10, "b", 4)
      .select("b").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("withGlobalOrderStats returns the profile's n and grand totals") {
    val sort = Seq(col("dem").asc, col("user_id").asc)
    val (ranked, n, tots) = Rank.withGlobalOrderStats(
      demands, sort, "rk", Seq(("dem", "cum")), 7)
    val want = demands.agg(count(lit(1)), sum("dem")).collect()(0)
    assert(n == want.getLong(0), "n must equal the rollup row count")
    assert(tots == Seq(want.getLong(1)), "totals must equal the column sums")
    // the ranked frame itself is unchanged vs withGlobalOrder
    val got = ranked.select("user_id", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val plain = Rank.withGlobalOrder(demands, sort, "rk", Seq(("dem", "cum")), 7)
      .select("user_id", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == plain.toSeq)
    assert(ranked.storageLevel.useMemory, "stats variant must persist the ranked frame")
  }

  test("withNtiles (concurrent dims) ≡ chained withNtile, bit-for-bit") {
    val base = events.groupBy("user_id").agg(
      count(lit(1)).as("freq"), sum("value").as("mon"))
    val dims = Seq(
      (Seq(col("freq").asc, col("user_id").asc), 5, "a"),
      (Seq(col("mon").desc, col("user_id").asc), 4, "b"),
      (Seq(col("user_id").desc), 3, "c"))
    val got = Rank.withNtiles(base, dims, 7)
      .select("user_id", "a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val want = dims.foldLeft(base) { case (acc, (sort, k, name)) =>
      Rank.withNtile(acc, sort, k, name, 7)
    }.select("user_id", "a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("withNtiles FUSED path (rfm shape: numeric ± keys, shared long tie) ≡ chained withNtile") {
    val base = events.groupBy("user_id").agg(
      count(lit(1)).as("freq"), sum("value").as("mon"))
    // all dims 2-component with the same ascending user_id tie-break —
    // exactly the shape fusedCuts accepts (one machinery for all dims)
    val dims = Seq(
      (Seq(col("freq").asc, col("user_id").asc), 5, "a"),
      (Seq(col("mon").desc, col("user_id").asc), 4, "b"),
      (Seq(col("freq").desc, col("user_id").asc), 3, "c"))
    val got = Rank.withNtiles(base, dims, 7)
      .select("user_id", "a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val want = dims.foldLeft(base) { case (acc, (sort, k, name)) =>
      Rank.withNtile(acc, sort, k, name, 7)
    }.select("user_id", "a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("withNtiles rejects duplicate or colliding bucket names; degenerates like ntile") {
    val base = events.groupBy("user_id").agg(count(lit(1)).as("freq"))
    intercept[IllegalArgumentException] {
      Rank.withNtiles(base, Seq(
        (Seq(col("freq").asc, col("user_id").asc), 5, "x"),
        (Seq(col("user_id").desc), 3, "x")))
    }
    intercept[IllegalArgumentException] {
      Rank.withNtiles(base, Seq(
        (Seq(col("user_id").asc), 5, "freq"))) // collides with an input column
    }
    // k > n: bucket = rank, matching the window ntile contract
    val tiny = base.orderBy("user_id").limit(3)
    val got = Rank.withNtiles(tiny,
        Seq((Seq(col("user_id").asc), 10, "b")), 4)
      .select("b").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("withGlobalOrder on an empty input yields an empty frame (no NPE)") {
    val empty = demands.filter(col("dem") < 0)
    assert(Rank.withGlobalOrder(empty, Seq(col("user_id").asc), "rk",
      Seq(("dem", "cum"))).count() == 0L)
  }

  /** A global-order window requires AllTuples of its child — i.e. an
    * Exchange SinglePartition feeding a WindowExec. None of the four
    * rewritten entity-rank defaults may contain one. (Pre-AQE sparkPlan
    * so the tree is inspectable without executing.) */
  private def assertNoGlobalWindow(name: String, df: DataFrame): Unit = {
    val bad = df.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.requiredChildDistribution.contains(AllTuples) => w
    }
    assert(bad.isEmpty, s"$name still has a single-partition window:\n${bad.mkString}")
  }

  test("entity-rank family default plans are free of single-partition windows") {
    assertNoGlobalWindow("q_docs_curriculum", Retrieval.qDocsCurriculum(spark, sf0001))
    assertNoGlobalWindow("q_abc_pareto", Analytics.qAbcPareto(spark, sf0001))
    assertNoGlobalWindow("q_rfm_segments", Analytics.qRfmSegments(spark, sf0001))
    assertNoGlobalWindow("q_ops_fair_share", Ops.qOpsFairShare(spark, sf0001))
  }

  test("rewritten family still matches its previous exact-window form") {
    // qDocsCurriculum vs the literal window ntile it replaced
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("cast(size(split(coalesce(text, ''), ' ')) as bigint)").as("tok"))
      .withColumn("awl",
        graft.operators.Num.roundd(col("n_chars").cast("double") / col("tok"), 6))
    val want = base
      .withColumn("phase", ntile(4).over(Window.orderBy("awl", "doc_id")).cast("long"))
      .groupBy("phase").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val got = Retrieval.qDocsCurriculum(spark, sf0001)
      .select("phase", "n_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}
