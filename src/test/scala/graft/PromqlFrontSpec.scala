package graft

import graft.promql._
import org.apache.spark.sql.functions._

/** The PromQL front door: parser shape/error tests plus an INDEPENDENT
  * driver-side brute-force evaluator over the collected sf0.001 sample
  * set — every compiled range function, aggregation, vector match,
  * topk and histogram_quantile is checked against a from-scratch Scala
  * reimplementation of the documented evaluation contract (hourly grid,
  * own-sample eval points, trailing RANGE windows). */
class PromqlFrontSpec extends SparkSuite {

  // ---- parser --------------------------------------------------------------

  test("parser: selector, matchers, range, agg, binop, subquery") {
    assert(Parser.parse("events") == Selector("events", Nil))
    assert(Parser.parse("""events{type="error", user!~"1.*"}""") ==
      Selector("events", Seq(Matcher("type", "=", "error"), Matcher("user", "!~", "1.*"))))
    assert(Parser.parse("""rate(events{type="error"}[1h])""") ==
      FnCall("rate", Seq(RangeSel(Selector("events", Seq(Matcher("type", "=", "error"))), 1))))
    assert(Parser.parse("""sum by (type) (rate(events[6h]))""") ==
      AggOp("sum", Seq("type"), FnCall("rate", Seq(RangeSel(Selector("events", Nil), 6)))))
    assert(Parser.parse("""a / on(user) b""") ==
      BinOp("/", Selector("a", Nil), Selector("b", Nil), Some(VectorMatch(true, Seq("user")))))
    assert(Parser.parse("""max_over_time(rate(events[1h])[6h:1h])""") ==
      FnCall("max_over_time", Seq(Subquery(
        FnCall("rate", Seq(RangeSel(Selector("events", Nil), 1))), 6))))
    assert(Parser.parse("""rate(events[2d])""") ==
      FnCall("rate", Seq(RangeSel(Selector("events", Nil), 48))))
  }

  test("parser: loud failures") {
    for (bad <- Seq(
      "rate(events)",                       // missing range
      "events{type=error}",                 // unquoted value
      "rate(events[90m])",                  // sub-hour duration unit
      "max_over_time(rate(events[1h])[6h:2h])", // off-grid step
      "events[",
      "sum by type (events)"))              // by needs parens
      assertThrows[Exception](Parser.parse(bad))
  }

  // ---- brute-force reference evaluator ------------------------------------

  private case class S(ts: Long, sid: Long, v: Double) // ts in micros
  private val OriginUs = 1704067200L * 1000000L        // 2024-01-01T00:00Z
  private val HourUs = 3600L * 1000000L

  private def hourOf(tsUs: Long): Long = math.floorDiv(tsUs - OriginUs, HourUs)

  private lazy val samples: Map[(String, String), Vector[S]] = {
    val rows = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id").cast("string"),
        expr("unix_micros(cast(ts as timestamp))"), col("event_id"), col("value"))
      .collect()
    rows.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => S(r.getLong(2), r.getLong(3), r.getDouble(4)))
          .sortBy(s => (s.ts, s.sid)).toVector
      }
  }

  private def rnd(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    val m = math.floor(math.abs(x) * p + 0.5) / p
    if (x < 0) -m else m
  }

  private def win(ss: Vector[S], h: Long, n: Int): Vector[S] =
    ss.filter(s => { val sh = hourOf(s.ts); sh > h - n && sh <= h })

  private def ownHours(ss: Vector[S]): Vector[Long] =
    ss.map(s => hourOf(s.ts)).distinct.sorted

  private def pct(vs: Seq[Double], phi: Double): Double = {
    val s = vs.sorted
    val idx = phi * (s.size - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) s(lo) else s(lo) + (idx - lo) * (s(hi) - s(lo))
  }

  /** collected actual result keyed by (labels…, hi) */
  private def run(q: String): Map[Seq[String], Double] = {
    val df = PromQL.query(spark, sf0001, q)
    val labelCols = df.columns.dropRight(2).toSeq // labels…, h, value
    df.withColumn("__hi",
        expr("timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', h)"))
      .collect()
      .map { r =>
        val key = labelCols.map(c => String.valueOf(r.getAs[Any](c))) :+
          r.getAs[Long]("__hi").toString
        key -> r.getAs[Double]("value")
      }.toMap
  }

  private def assertClose(got: Map[Seq[String], Double],
      want: Map[Seq[String], Double], tol: Double, what: String): Unit = {
    assert(got.keySet == want.keySet,
      s"$what keys differ: missing=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) <= tol, s"$what at $k: got ${got(k)} want $w")
  }

  // ---- range functions vs brute force --------------------------------------

  test("rate/increase/count_over_time match brute force") {
    for ((q, n, f) <- Seq(
      ("""rate(events{type="error"}[1h])""", 1,
        (w: Vector[S]) => rnd(w.size / 3600.0, 6)),
      ("""rate(events{type="error"}[6h])""", 6,
        (w: Vector[S]) => rnd(w.size / 21600.0, 6)),
      ("""increase(events{type="error"}[24h])""", 24,
        (w: Vector[S]) => w.size.toDouble),
      ("""count_over_time(events{type="error"}[6h])""", 6,
        (w: Vector[S]) => w.size.toDouble))) {
      val want = (for {
        ((t, u), ss) <- samples if t == "error"
        h <- ownHours(ss)
      } yield Seq(t, u, h.toString) -> f(win(ss, h, n))).toMap
      assertClose(run(q), want, 1e-9, q)
    }
  }

  test("min/max/avg/sum/last_over_time match brute force") {
    def f(q: String, n: Int)(g: Vector[S] => Double) = {
      val want = (for {
        ((t, u), ss) <- samples if t == "click"
        h <- ownHours(ss)
      } yield Seq(t, u, h.toString) -> g(win(ss, h, n))).toMap
      assertClose(run(q), want, 1e-6, q)
    }
    f("""min_over_time(events{type="click"}[6h])""", 6)(w => w.map(_.v).min)
    f("""max_over_time(events{type="click"}[6h])""", 6)(w => w.map(_.v).max)
    f("""last_over_time(events{type="click"}[6h])""", 6)(w => {
      val h = hourOf(w.last.ts); w.filter(s => hourOf(s.ts) == h).last.v
    })
    // sum/avg ride per-hour 2dp-pre-rounded sums (the order-free contract)
    def hourSums(w: Vector[S]) =
      w.groupBy(s => hourOf(s.ts)).toSeq.sortBy(_._1)
        .map { case (_, hs) => rnd(hs.map(_.v).sum, 2) }
    f("""sum_over_time(events{type="click"}[6h])""", 6)(w =>
      rnd(hourSums(w).sum, 6))
    f("""avg_over_time(events{type="click"}[6h])""", 6)(w =>
      rnd(hourSums(w).sum / w.size, 6))
  }

  test("delta/resets/changes/idelta/irate match brute force") {
    def consecPairs(ss: Vector[S], h: Long, n: Int): Vector[(S, S)] = {
      val w = win(ss, h, n)
      w.zip(w.drop(1))
    }
    def want(t0: String, n: Int, minSamples: Int)(g: (Vector[S], Long) => Option[Double]) =
      (for {
        ((t, u), ss) <- samples if t == t0
        h <- ownHours(ss)
        if win(ss, h, n).size >= minSamples
        v <- g(ss, h)
      } yield Seq(t, u, h.toString) -> v).toMap
    assertClose(run("""delta(events{type="view"}[6h])"""),
      want("view", 6, 2)((ss, h) => Some(rnd(win(ss, h, 6).last.v - win(ss, h, 6).head.v, 6))),
      1e-6, "delta")
    assertClose(run("""resets(events{type="view"}[6h])"""),
      want("view", 6, 1)((ss, h) =>
        Some(consecPairs(ss, h, 6).count { case (a, b) => b.v < a.v }.toDouble)),
      1e-9, "resets")
    assertClose(run("""changes(events{type="view"}[6h])"""),
      want("view", 6, 1)((ss, h) =>
        Some(consecPairs(ss, h, 6).count { case (a, b) => b.v != a.v }.toDouble)),
      1e-9, "changes")
    assertClose(run("""idelta(events{type="view"}[6h])"""),
      want("view", 6, 2)((ss, h) => {
        val w = win(ss, h, 6)
        Some(rnd(w.last.v - w(w.size - 2).v, 6))
      }), 1e-6, "idelta")
    assertClose(run("""irate(events{type="view"}[6h])"""),
      want("view", 6, 2)((ss, h) => {
        val w = win(ss, h, 6)
        val (a, b) = (w(w.size - 2), w.last)
        val adj = if (b.v >= a.v) b.v - a.v else b.v
        Some(rnd(adj / ((b.ts - a.ts) / 1000000.0), 6))
      }), 1e-6, "irate")
  }

  test("quantile_over_time matches brute force") {
    val want = (for {
      ((t, u), ss) <- samples if t == "click"
      h <- ownHours(ss)
    } yield Seq(t, u, h.toString) ->
      rnd(rnd(pct(win(ss, h, 4).map(_.v), 0.9), 4), 6)).toMap
    assertClose(run("""quantile_over_time(0.9, events{type="click"}[4h])"""),
      want, 1e-6, "quantile_over_time")
  }

  // ---- aggregation, matching, topk, histogram ------------------------------

  test("sum by (type) of rate matches brute force") {
    val want = (for {
      (t, tss) <- samples.groupBy(_._1._1).toSeq
      perHour = (for {
        ((_, u), ss) <- tss.toSeq
        h <- ownHours(ss)
      } yield (h, win(ss, h, 1).size)).groupBy(_._1)
      (h, cs) <- perHour
    } yield Seq(t, h.toString) -> rnd(cs.map(_._2).sum / 3600.0, 6)).toMap
    assertClose(run("""sum by (type) (rate(events[1h]))"""), want, 1e-9, "sum by")
  }

  test("vector division with default matching (click/view CTR per user)") {
    val got = run("""rate(events{type="click"}[1h]) / ignoring(type) rate(events{type="view"}[1h])""")
    val clicks = (for {
      ((t, u), ss) <- samples if t == "click"; h <- ownHours(ss)
    } yield (u, h) -> win(ss, h, 1).size).toMap
    val views = (for {
      ((t, u), ss) <- samples if t == "view"; h <- ownHours(ss)
    } yield (u, h) -> win(ss, h, 1).size).toMap
    val want = (for {
      (k, c) <- clicks; v <- views.get(k)
    } yield Seq(k._1, k._2.toString) -> rnd(c.toDouble / v, 6)).toMap
    assertClose(got, want, 1e-9, "vector /")
  }

  test("scalar arithmetic folds into the count path") {
    val got = run("""rate(events{type="error"}[1h]) * 3600""")
    val want = (for {
      ((t, u), ss) <- samples if t == "error"; h <- ownHours(ss)
    } yield Seq(t, u, h.toString) -> win(ss, h, 1).size.toDouble).toMap
    assertClose(got, want, 1e-9, "rate*3600")
  }

  test("topk(2, sum by (type)(increase(events[24h]))) keeps the 2 biggest per hour") {
    val got = run("""topk(2, sum by (type) (increase(events[24h])))""")
    val sums = (for {
      (t, tss) <- samples.groupBy(_._1._1).toSeq
      hcs = (for {
        ((_, u), ss) <- tss.toSeq; h <- ownHours(ss)
      } yield (h, win(ss, h, 24).size)).groupBy(_._1)
      (h, cs) <- hcs
    } yield (h, t, cs.map(_._2).sum.toDouble))
    val want = sums.groupBy(_._1).flatMap { case (h, ts) =>
      ts.sortBy(x => (-x._3, x._2)).take(2)
        .map(x => Seq(x._2, h.toString) -> x._3)
    }
    assertClose(got, want.toMap, 1e-9, "topk")
  }

  test("histogram_quantile over bucketed rate matches brute force") {
    val got = run("""histogram_quantile(0.9, sum by (le) (rate(events_bucket[1h])))""")
    val bounds = Seq(10.0, 25.0, 50.0, 100.0, 200.0, 400.0)
    def bucketOf(v: Double): Double =
      bounds.find(v <= _).getOrElse(Double.MaxValue)
    val byHour = (for {
      ((_, _), ss) <- samples.toSeq; s <- ss
    } yield (hourOf(s.ts), bucketOf(s.v))).groupBy(_._1)
    val want = byHour.map { case (h, vs) =>
      val counts = vs.groupBy(_._2).map { case (b, xs) => b -> xs.size.toDouble }
      val ordered = counts.toSeq.sortBy(_._1)
      val total = ordered.map(_._2).sum
      val target = 0.9 * total
      var cum = 0.0
      var res = 0.0
      var done = false
      var prev = 0.0
      val maxFinite = ordered.filter(_._1 != Double.MaxValue).map(_._1).max
      for ((b, c) <- ordered if !done) {
        cum += c
        if (cum >= target) {
          res = if (b == Double.MaxValue) maxFinite
            else prev + (b - prev) * (target - (cum - c)) / c
          done = true
        }
        prev = b
      }
      Seq(h.toString) -> rnd(res, 6)
    }
    assertClose(got, want, 1e-6, "histogram_quantile")
  }

  test("subquery: max_over_time(rate(events[1h])[6h:1h])") {
    val got = run("""max_over_time(rate(events{type="error"}[1h])[6h:1h])""")
    val rates = (for {
      ((t, u), ss) <- samples if t == "error"; h <- ownHours(ss)
    } yield (t, u, h) -> rnd(win(ss, h, 1).size / 3600.0, 6)).toMap
    val want = rates.map { case ((t, u, h), _) =>
      val inWin = rates.collect {
        case ((t2, u2, h2), r) if t2 == t && u2 == u && h2 > h - 6 && h2 <= h => r
      }
      Seq(t, u, h.toString) -> inWin.max
    }
    assertClose(got, want, 1e-9, "subquery")
  }

  test("offset: rate(...[1h] offset 24h) reports yesterday's rate at today's hour") {
    assert(Parser.parse("""rate(events{type="error"}[1h] offset 1d)""") ==
      FnCall("rate", Seq(RangeSel(
        Selector("events", Seq(Matcher("type", "=", "error")), 24), 1))))
    val got = run("""rate(events{type="error"}[1h] offset 24h)""")
    val want = (for {
      ((t, u), ss) <- samples if t == "error"
      h <- ownHours(ss)
    } yield Seq(t, u, (h + 24).toString) -> rnd(win(ss, h, 1).size / 3600.0, 6)).toMap
    assertClose(got, want, 1e-9, "offset")
  }

  test("comparison: filter form drops points, bool form maps to 1/0") {
    val base = (for {
      (t, tss) <- samples.groupBy(_._1._1).toSeq
      perHour = (for {
        ((_, u), ss) <- tss.toSeq; h <- ownHours(ss)
      } yield (h, win(ss, h, 1).size)).groupBy(_._1)
      (h, cs) <- perHour
    } yield Seq(t, h.toString) -> rnd(cs.map(_._2).sum / 3600.0, 6)).toMap
    val thr = 0.0015
    assertClose(run(s"""sum by (type) (rate(events[1h])) > $thr"""),
      base.filter(_._2 > thr), 1e-9, "cmp filter")
    assertClose(run(s"""sum by (type) (rate(events[1h])) > bool $thr"""),
      base.map { case (k, v) => k -> (if (v > thr) 1.0 else 0.0) }, 1e-9, "cmp bool")
  }

  test("and/unless/or vector set operations") {
    def rates(t0: String) = (for {
      ((t, u), ss) <- samples if t == t0; h <- ownHours(ss)
    } yield (u, h) -> rnd(win(ss, h, 1).size / 3600.0, 6)).toMap
    val clicks = rates("click")
    val views = rates("view")
    assertClose(
      run("""rate(events{type="click"}[1h]) and ignoring(type) rate(events{type="view"}[1h])"""),
      clicks.collect { case ((u, h), v) if views.contains((u, h)) =>
        Seq("click", u, h.toString) -> v },
      1e-9, "and")
    assertClose(
      run("""rate(events{type="click"}[1h]) unless ignoring(type) rate(events{type="view"}[1h])"""),
      clicks.collect { case ((u, h), v) if !views.contains((u, h)) =>
        Seq("click", u, h.toString) -> v },
      1e-9, "unless")
    // or with equal label SETS: click points plus view points (disjoint
    // on the type label, so both sides survive whole)
    val orWant =
      clicks.map { case ((u, h), v) => Seq("click", u, h.toString) -> v } ++
        views.map { case ((u, h), v) => Seq("view", u, h.toString) -> v }
    assertClose(
      run("""rate(events{type="click"}[1h]) or rate(events{type="view"}[1h])"""),
      orWant, 1e-9, "or")
  }

  test("without() aggregation ≡ the complementary by()") {
    val got = run("""sum without (user) (rate(events[1h]))""")
    val want = run("""sum by (type) (rate(events[1h]))""")
    assertClose(got, want, 0.0, "without")
  }

  test("clamp_min / clamp_max / round map values pointwise") {
    val base = run("""sum by (type) (increase(events[1h]))""")
    assertClose(run("""clamp_min(sum by (type) (increase(events[1h])), 3)"""),
      base.map { case (k, v) => k -> math.max(v, 3.0) }, 1e-9, "clamp_min")
    assertClose(run("""clamp_max(sum by (type) (increase(events[1h])), 2)"""),
      base.map { case (k, v) => k -> math.min(v, 2.0) }, 1e-9, "clamp_max")
    assertClose(run("""round(sum by (type) (rate(events[1h])) * 1000)"""),
      run("""sum by (type) (rate(events[1h])) * 1000""")
        .map { case (k, v) => k -> rnd(v, 0) }, 1e-9, "round")
  }

  test("compiled ratio agrees with the hand-built vector-ratio operator family") {
    // sum(rate(click)) / sum(rate(view)) over ALL series ≡ per-hour
    // click-count / view-count — the qTsVectorRatio shape on counts
    val got = run("""sum(rate(events{type="click"}[1h])) / sum(rate(events{type="view"}[1h]))""")
    val twin = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(when(col("event_type") === "click", 1)).as("c"),
        count(when(col("event_type") === "view", 1)).as("v"))
      .filter(col("c") > 0 && col("v") > 0)
      .select(expr("timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', h)").as("hi"),
        (col("c").cast("double") / col("v")).cast("double").as("r"))
      .collect().map(r => Seq(r.getLong(0).toString) -> rnd(r.getDouble(1), 6)).toMap
    assertClose(got, twin, 1e-9, "ratio twin")
  }

  // ---- round 3: regression, moments, absent, label machinery ---------------

  /** Exact BigInt moments of a window's samples in the compiler's units:
    * t = µs since origin, v = µ-value (round half away from zero). */
  private def moments(w: Vector[S]): (BigInt, BigInt, BigInt, BigInt, BigInt) = {
    def v6(v: Double): BigInt = BigInt(rnd(v * 1e6, 0).toLong)
    val ts = w.map(s => BigInt(s.ts - OriginUs))
    val vs = w.map(s => v6(s.v))
    (BigInt(w.size), ts.sum, vs.sum,
      ts.zip(vs).map { case (a, b) => a * b }.sum, ts.map(t => t * t).sum)
  }

  test("deriv / predict_linear match a BigInt-exact brute force") {
    val derivWant = (for {
      ((t, u), ss) <- samples if t == "click"
      h <- ownHours(ss)
      (n, st, sv, stv, stt) = moments(win(ss, h, 4))
      den = n * stt - st * st
      if n >= 2 && den != 0
    } yield Seq(t, u, h.toString) ->
      rnd((n * stv - st * sv).toDouble / den.toDouble, 6)).toMap
    assertClose(run("""deriv(events{type="click"}[4h])"""), derivWant, 1e-9, "deriv")

    val predWant = (for {
      ((t, u), ss) <- samples if t == "error"
      h <- ownHours(ss)
      (n, st, sv, stv, stt) = moments(win(ss, h, 24))
      den = n * stt - st * st
      if n >= 2 && den != 0
    } yield {
      val slope = (n * stv - st * sv).toDouble / den.toDouble
      val tstar = ((h + 1).toDouble * 3600.0 + 14400.0) * 1e6
      Seq(t, u, h.toString) -> rnd(
        (sv.toDouble / n.toDouble + slope * (tstar - st.toDouble / n.toDouble)) / 1e6, 6)
    }).toMap
    assertClose(run("""predict_linear(events{type="error"}[24h], 14400)"""),
      predWant, 1e-9, "predict_linear")
  }

  test("stddev/stdvar_over_time and the stddev/stdvar aggregators match brute force") {
    def popVar(vs: Vector[Double]): Double = {
      val v6 = vs.map(v => BigInt(rnd(v * 1e6, 0).toLong))
      val n = BigInt(v6.size); val s1 = v6.sum; val s2 = v6.map(x => x * x).sum
      (n * s2 - s1 * s1).toDouble / (n.toDouble * n.toDouble) / 1e12
    }
    val sdWant = (for {
      ((t, u), ss) <- samples if t == "view"
      h <- ownHours(ss)
    } yield Seq(t, u, h.toString) ->
      rnd(math.sqrt(popVar(win(ss, h, 6).map(_.v))), 6)).toMap
    assertClose(run("""stddev_over_time(events{type="view"}[6h])"""), sdWant, 1e-9, "sd_ot")

    // aggregator: stdvar across the per-(type,user) LAST samples per hour
    val lastPerHour: Map[(String, Long), Vector[Double]] =
      samples.toVector.flatMap { case ((t, u), ss) =>
        ss.groupBy(s => hourOf(s.ts)).map { case (h, w) =>
          (t, h) -> w.maxBy(s => (s.ts, s.sid)).v
        }
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val svWant = lastPerHour.map { case ((t, h), vs) =>
      Seq(t, h.toString) -> rnd(popVar(vs), 6)
    }
    assertClose(run("""stdvar by (type) (events)"""), svWant, 1e-9, "stdvar_by")
  }

  test("absent() fires exactly on the grid hours the selector misses") {
    val present = samples.collect { case ((t, u), ss) if t == "purchase" && u == "7" => ss }
      .flatten.map(s => hourOf(s.ts)).toSet
    val got = run("""absent(events{type="purchase", user="7"})""")
    assert(got.keySet == (0L until 720L).filterNot(present).map(h => Seq(h.toString)).toSet)
    assert(got.values.forall(_ == 1.0))
  }

  test("label_replace adds the captured label; count_values pivots values into a label; group emits 1") {
    val base = run("""sum by (type) (rate(events[2h]))""")
    val lr = run("""label_replace(sum by (type) (rate(events[2h])), "family", "$1", "type", "(c.*|v.*)")""")
    val want = base.map { case (k, v) =>
      val fam = if (k.head.startsWith("c") || k.head.startsWith("v")) k.head else ""
      Seq(k.head, fam, k(1)) -> v
    }
    assertClose(lr, want, 1e-9, "label_replace")

    val cv = run("""count_values("lvl", round(events{type="click"} / 50))""")
    val cvWant = (for {
      ((t, u), ss) <- samples.toVector if t == "click"
      (h, w) <- ss.groupBy(s => hourOf(s.ts))
    } yield (h, rnd(rnd(w.maxBy(s => (s.ts, s.sid)).v / 50.0, 0), 6)))
      .groupBy(identity).map { case ((h, lvl), g) =>
        Seq(f"$lvl%.6f", h.toString) -> g.size.toDouble
      }
    assertClose(cv, cvWant, 1e-9, "count_values")

    val gr = run("""group by (type) (events)""")
    assert(gr.values.forall(_ == 1.0))
    assert(gr.keySet == (for {
      ((t, _), ss) <- samples.toSet; h <- ownHours(ss)
    } yield Seq(t, h.toString)))
  }

  test("parser: string literals and the new function names; loud label_replace subset failures") {
    assert(Parser.parse("""label_replace(a, "d", "$1", "s", "re")""") ==
      FnCall("label_replace", Seq(Selector("a", Nil), StrLit("d"), StrLit("$1"),
        StrLit("s"), StrLit("re"))))
    assert(Parser.parse("""deriv(events[4h])""") ==
      FnCall("deriv", Seq(RangeSel(Selector("events", Nil), 4))))
    assertThrows[Exception](Parser.parse("deriv(events)")) // needs a range
    // replacement must be a single capture reference in this subset
    assertThrows[Exception](
      PromQL.query(spark, sf0001, """label_replace(events, "d", "x$1", "type", "re")"""))
    // source label must exist
    assertThrows[Exception](
      PromQL.query(spark, sf0001, """label_replace(events, "d", "$1", "nope", "re")"""))
  }

  // ---- round 12: one-to-many matching + the @ modifier ---------------------

  test("parser: group_left/group_right with and without include lists; @ suffix") {
    assert(Parser.parse("""a / on(x) group_left b""") ==
      BinOp("/", Selector("a", Nil), Selector("b", Nil),
        Some(VectorMatch(true, Seq("x"), Some("left"), Nil))))
    assert(Parser.parse("""a * ignoring(x) group_right(foo, bar) b""") ==
      BinOp("*", Selector("a", Nil), Selector("b", Nil),
        Some(VectorMatch(false, Seq("x"), Some("right"), Seq("foo", "bar")))))
    assert(Parser.parse("""events @ 1704153600""") ==
      Selector("events", Nil, 0, Some(1704153600L)))
    // @ and offset compose in either order, both landing on the selector
    assert(Parser.parse("""rate(events[2h] @ 1704153600 offset 1h)""") ==
      FnCall("rate", Seq(RangeSel(Selector("events", Nil, 1, Some(1704153600L)), 2))))
    assert(Parser.parse("""rate(events[2h] offset 1h @ 1704153600)""") ==
      FnCall("rate", Seq(RangeSel(Selector("events", Nil, 1, Some(1704153600L)), 2))))
    assert(Parser.parse("""events @ start()""") ==
      Selector("events", Nil, 0, Some(1704067200L)))
    assert(Parser.parse("""events @ end()""") ==
      Selector("events", Nil, 0, Some(1704067200L + 719L * 3600L)))
    // set operations reject grouping modifiers, as upstream
    assertThrows[Exception](Parser.parse("""a and on(x) group_left b"""))
    // @ needs a whole unix-seconds timestamp
    assertThrows[Exception](Parser.parse("""events @ 17041536.5"""))
    // off-grid @ fails at compile (not a whole grid hour / outside range)
    assertThrows[Exception](PromQL.query(spark, sf0001, """events @ 1704153601"""))
    assertThrows[Exception](PromQL.query(spark, sf0001, """events @ 4704153600"""))
  }

  test("group_left: per-user share of its type's rate matches brute force") {
    val perTU: Map[(String, String), Map[Long, Int]] =
      samples.map { case (k, ss) =>
        k -> ownHours(ss).map(h => h -> win(ss, h, 6).size).toMap
      }
    def typeTotal(t: String, h: Long): Int =
      perTU.collect { case ((tt, _), m) if tt == t && m.contains(h) => m(h) }.sum
    val want = (for {
      ((t, u), m) <- perTU
      (h, c) <- m
    } yield Seq(t, u, h.toString) ->
      rnd((c / 21600.0) / (typeTotal(t, h) / 21600.0), 6)).toMap
    val got = run(
      """sum by (type, user) (rate(events[6h])) / on(type) group_left sum by (type) (rate(events[6h]))""")
    assertClose(got, want, 1e-9, "group_left share")
    // the mirrored modifier inverts the ratio, same keys
    val gotR = run(
      """sum by (type) (rate(events[6h])) / on(type) group_right sum by (type, user) (rate(events[6h]))""")
    val wantR = want.map { case (k, v) => k -> rnd(1.0 / v, 6) }
    assert(gotR.keySet == wantR.keySet)
    for ((k, v) <- wantR) assert(math.abs(gotR(k) - v) <= 1e-4,
      s"group_right at $k: got ${gotR(k)} want ~$v") // 1/round(x) vs round(1/x)
  }

  test("@ modifier pins the evaluation hour and is constant across the grid") {
    val hi0 = 24L // unix 1704153600 = 2024-01-02 00:00
    val rc: Map[String, Int] = samples.toSeq
      .collect { case ((t, _), ss) if ownHours(ss).contains(hi0) =>
        t -> win(ss, hi0, 24).size }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val got = run("""sum by (type) (increase(events[24h] @ 1704153600))""")
    assert(got.keySet.map(_.head) == rc.keySet, "types with samples at the pinned hour")
    assert(got.size == rc.size * 720, "one point per type per grid hour")
    for ((k, v) <- got)
      assert(v == rc(k.head).toDouble, s"pinned value drifted at $k: $v != ${rc(k.head)}")
  }

  test("group_left include list carries the one side's label; group_right flips sides") {
    import spark.implicits._
    def mk(rows: Seq[(String, Double, Long, String, String)], lab: String) =
      rows.toDF("tss", "value", "sid", "type", lab)
        .withColumn("ts", expr("cast(tss as timestamp_ntz)")).drop("tss")
    val rps = mk(Seq(
      ("2024-01-01 00:10:00", 1.0, 1L, "click", "u1"),
      ("2024-01-01 00:20:00", 2.0, 2L, "click", "u2"),
      ("2024-01-01 00:15:00", 3.0, 3L, "view", "u1")), "user")
    val cap = mk(Seq(
      ("2024-01-01 00:05:00", 100.0, 10L, "click", "us-east"),
      ("2024-01-01 00:06:00", 50.0, 11L, "view", "eu-west")), "region")
    val store = MetricStore(Map(
      "rps" -> MetricDef((_, _) => rps, Seq("type", "user")),
      "cap" -> MetricDef((_, _) => cap, Seq("type", "region"))))
    val out = PromQL.query(spark, sf0001, """rps / on(type) group_left(region) cap""", store)
    assert(out.columns.toSeq == Seq("type", "user", "region", "h", "value"))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getDouble(4))).toSet
    assert(rows == Set(
      ("click", "u1", "us-east", 0.01), ("click", "u2", "us-east", 0.02),
      ("view", "u1", "eu-west", 0.06)), s"got $rows")
    val outR = PromQL.query(spark, sf0001, """cap * on(type) group_right(region) rps""", store)
    val rowsR = outR.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getDouble(4))).toSet
    assert(rowsR == Set(
      ("click", "u1", "us-east", 100.0), ("click", "u2", "us-east", 200.0),
      ("view", "u1", "eu-west", 150.0)), s"got $rowsR")
    // include label must exist on the one side
    assertThrows[Exception](
      PromQL.query(spark, sf0001, """rps / on(type) group_left(nope) cap""", store))
  }

  test("quantile aggregator and present_over_time match brute force") {
    // per (type, hour): 0.9-quantile across the series' instant values
    val lastPer: Map[(String, String), Map[Long, Double]] =
      samples.map { case (k, ss) =>
        k -> ss.groupBy(s => hourOf(s.ts))
          .map { case (h, xs) => h -> xs.maxBy(s => (s.ts, s.sid)).v }
      }
    val byTypeHour = lastPer.toSeq
      .flatMap { case ((t, _), m) => m.map { case (h, v) => (t, h) -> v } }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val want = byTypeHour.map { case ((t, h), vs) =>
      Seq(t, h.toString) -> rnd(pct(vs, 0.9), 4)
    }
    assertClose(run("""quantile by (type) (0.9, events)"""), want, 1e-9, "quantile agg")
    // present_over_time: 1.0 at every grid hour whose trailing 12h window
    // holds a sample of the series (ADVICE r12: [Nh] is real, the exact
    // dual of absent_over_time)
    val wantP = (for {
      ((t, u), ss) <- samples if t == "error"
      h <- ss.map(s => hourOf(s.ts)).distinct
        .flatMap(h0 => h0 to math.min(h0 + 11, 719L)).distinct
    } yield Seq(t, u, h.toString) -> 1.0).toMap
    assertClose(run("""present_over_time(events{type="error"}[12h])"""), wantP, 0.0,
      "present_over_time")
    // quantile without phi fails loudly
    assertThrows[Exception](Parser.parse("""quantile by (type) (events)"""))
    // ADVICE r12: the without-form forwards phi — equals the by-complement
    assertClose(run("""quantile without (user) (0.9, events)"""), want, 1e-9,
      "quantile without")
    // out-of-range phi rejected at parse
    assertThrows[Exception](Parser.parse("""quantile by (type) (1.5, events)"""))
  }

  // ---- round 13: fusion, calendar/time functions, holt_winters, sort -------

  test("one-to-many fusion matches the brute-forced join form") {
    // the fused share-of-total plan must equal the join semantics exactly
    val perTU: Map[(String, String), Map[Long, Int]] =
      samples.map { case (k, ss) =>
        k -> ownHours(ss).map(h => h -> win(ss, h, 6).size).toMap
      }
    def typeTotal(t: String, h: Long): Int =
      perTU.collect { case ((tt, _), m) if tt == t && m.contains(h) => m(h) }.sum
    val want = (for {
      ((t, u), m) <- perTU
      (h, c) <- m
    } yield Seq(t, u, h.toString) ->
      rnd((c / 21600.0) / (typeTotal(t, h) / 21600.0), 6)).toMap
    assertClose(
      run("""sum by (type, user) (rate(events[6h])) / on(type) group_left sum by (type) (rate(events[6h]))"""),
      want, 1e-9, "fused group_left share")
    // group_right mirrors (one side on the left) — recomputed from exact
    // counts, not by inverting the already-rounded share
    val wantR = (for {
      ((t, u), m) <- perTU
      (h, c) <- m
    } yield Seq(t, u, h.toString) ->
      rnd((typeTotal(t, h) / 21600.0) / (c / 21600.0), 6)).toMap
    assertClose(run(
      """sum by (type) (rate(events[6h])) / on(type) group_right sum by (type, user) (rate(events[6h]))"""),
      wantR, 1e-9, "fused group_right")
  }

  test("one-to-many fusion plan shape: one scan, no join; non-fusable shapes keep the join") {
    def plan(q: String): String =
      PromQL.query(spark, sf0001, q).queryExecution.optimizedPlan.toString
    // fused: the threshold-table shape — a single events scan, no Join,
    // and the share-of-total window (unbounded frame over (B2, hi))
    val fused = plan(
      """sum by (type, user) (rate(events[6h])) > on(type) group_left sum by (type) (rate(events[6h])) * 0.1""")
    assert(!fused.contains("Join"), s"fused plan must not join:\n$fused")
    assert("Relation \\[".r.findAllIn(fused).length == 1, "fused plan must scan events once")
    assert(fused.contains("unboundedpreceding") && fused.contains("unboundedfollowing"),
      "fused plan must carry the share-of-total window")
    // NOT fusable: different selectors (ratio of two metrics' slices)
    val ratio = plan(
      """sum(rate(events{type="click"}[1h])) / sum(rate(events{type="view"}[1h]))""")
    assert(ratio.contains("Join"), "different selectors must keep the join")
    // NOT fusable: ignoring-form matching (fusion is on()-only)
    val ig = plan(
      """sum by (type, user) (rate(events[6h])) / ignoring(user) group_left sum by (type) (rate(events[6h]))""")
    assert(ig.contains("Join"), "ignoring-form must keep the join")
    // NOT fusable: gauge path (avg aggregates don't reassociate exactly)
    val gauge = plan(
      """avg by (type, user) (events) / on(type) group_left avg by (type) (events)""")
    assert(gauge.contains("Join"), "non-cnt-path aggregates must keep the join")
  }

  test("same-panel pointwise fusion: one aggregate, no join; values match the panel") {
    def plan(q: String): String =
      PromQL.query(spark, sf0001, q).queryExecution.optimizedPlan.toString
    // fused: the q_pql_math shape — every vector leaf is the same panel,
    // so the whole arithmetic tree is ONE projection over one aggregate
    val fused = plan(
      """ln(sum by (type) (increase(events[24h]))) + sqrt(sum by (type) (increase(events[24h]))) + log2(sum by (type) (increase(events[24h])))""")
    assert(!fused.contains("Join"), s"same-panel arithmetic must not join:\n$fused")
    assert("Relation \\[".r.findAllIn(fused).length == 1,
      "same-panel arithmetic must scan events once")
    assert("(?i)aggregate".r.findAllIn(fused).length <= 2,
      s"one hourly rollup + one by-(type) aggregate, no re-aggregation:\n$fused")
    // value check: fused tree row-for-row equals f(panel value)
    val panel = run("""sum by (type) (increase(events[24h]))""")
    val got = run(
      """ln(sum by (type) (increase(events[24h]))) + sqrt(sum by (type) (increase(events[24h]))) + log2(sum by (type) (increase(events[24h])))""")
    assert(got.keySet == panel.keySet)
    for ((k, v) <- panel) {
      val want = math.log(v) + math.sqrt(v) + math.log(v) / math.log(2.0)
      val g = got(k)
      assert((g.isNaN && want.isNaN) || math.abs(g - want) <= 5e-7,
        s"$k: got $g want $want")
    }
    // unary minus and clamp ride the same fusion
    val neg = plan("""-sum by (type) (increase(events[24h])) * 2 + clamp(sum by (type) (increase(events[24h])), 0, 10)""")
    assert(!neg.contains("Join"), "unary-minus/clamp same-panel tree must not join")
    // comparisons fuse too: ln(P) > sqrt(P) is a filter, not a self-join
    val cmp = plan("""ln(sum by (type) (increase(events[24h]))) > sqrt(sum by (type) (increase(events[24h])))""")
    assert(!cmp.contains("Join"), "same-panel comparison must not join")
    // NOT fusable: different bases keep the join
    val diff = plan(
      """ln(sum by (type) (increase(events[24h]))) + sqrt(sum by (type) (increase(events[12h])))""")
    assert(diff.contains("Join"), "different ranges must keep the join")
    // NOT fusable: explicit matching keeps the join (fusion is default-match only)
    val matched = plan(
      """sum by (type) (increase(events[24h])) + on(type) sum by (type) (increase(events[24h]))""")
    assert(matched.contains("Join"), "explicit on() keeps the join")
  }

  test("time()/vector()/scalar() and calendar extractors") {
    // time() % 86400 / 3600 is the hour-of-day ramp over the 720-h grid
    val ta = run("""time() % 86400 / 3600""")
    assert(ta.size == 720)
    for (h <- 0L to 719L) assert(ta(Seq(h.toString)) == (h % 24).toDouble)
    // vector(k): the constant at every grid hour
    val vf = run("""vector(2.5)""")
    assert(vf.size == 720 && vf.values.forall(_ == 2.5))
    // scalar(single-series expr) == the expr itself
    assert(run("""scalar(sum(rate(events[1h])))""") == run("""sum(rate(events[1h]))"""))
    // day_of_week(): 2024-01-01 is a Monday (PromQL 0 = Sunday)
    val dw = run("""day_of_week()""")
    for (h <- 0L to 719L)
      assert(dw(Seq(h.toString)) == ((1 + h / 24) % 7).toDouble, s"dow at $h")
    // hour()/day_of_month()/month()/year() over the January grid
    val hr = run("""hour()""")
    for (h <- 0L to 719L) assert(hr(Seq(h.toString)) == (h % 24).toDouble)
    val dm = run("""day_of_month()""")
    for (h <- 0L to 719L) assert(dm(Seq(h.toString)) == (1 + h / 24).toDouble)
    assert(run("""month()""").values.forall(_ == 1.0))
    assert(run("""year()""").values.forall(_ == 2024.0))
    // timestamp(): unix seconds of each series' last sample in the hour
    val ts = run("""timestamp(events{type="error"})""")
    val wantTs = (for {
      ((t, u), ss) <- samples if t == "error"
      (h, xs) <- ss.groupBy(s => hourOf(s.ts))
    } yield Seq(t, u, h.toString) ->
      rnd(xs.maxBy(s => (s.ts, s.sid)).ts / 1e6, 6)).toMap
    assertClose(ts, wantTs, 1e-6, "timestamp")
  }

  test("holt_winters matches the upstream recurrence brute force") {
    def holt(xs: Vector[Double], sf: Double, tf: Double): Double = {
      var l = xs(0); var b = xs(1) - xs(0)
      for (i <- 1 until xs.size) {
        val l2 = sf * xs(i) + (1.0 - sf) * (l + b)
        b = tf * (l2 - l) + (1.0 - tf) * b
        l = l2
      }
      l
    }
    val want = (for {
      ((t, u), ss) <- samples if t == "click"
      h <- ownHours(ss)
      w = win(ss, h, 6)
      if w.size >= 2
    } yield Seq(t, u, h.toString) -> rnd(holt(w.map(_.v), 0.5, 0.3), 6)).toMap
    assertClose(run("""holt_winters(events{type="click"}[6h], 0.5, 0.3)"""),
      want, 1e-9, "holt_winters")
    // smoothing factors outside (0,1) fail loudly
    assertThrows[Exception](
      PromQL.query(spark, sf0001, """holt_winters(events[6h], 1.5, 0.3)"""))
  }

  test("sort/sort_desc order the output by value; loud failures") {
    val df = PromQL.query(spark, sf0001,
      """sort_desc(sum by (type) (increase(events[24h])))""").collect()
    val vs = df.map(_.getAs[Double]("value")).toSeq
    assert(vs == vs.sorted.reverse, "sort_desc not descending")
    val asc = PromQL.query(spark, sf0001,
      """sort(sum by (type) (increase(events[24h])))""").collect()
      .map(_.getAs[Double]("value")).toSeq
    assert(asc == asc.sorted, "sort not ascending")
    // sort below the top level is out of subset
    assertThrows[Exception](PromQL.query(spark, sf0001, """sum(sort(events))"""))
    // ADVICE r12: matching modifiers on scalar operands are rejected
    assertThrows[Exception](PromQL.query(spark, sf0001, """events > on(type) 5"""))
    assertThrows[Exception](PromQL.query(spark, sf0001, """events + on(type) 5"""))
  }

  test("vector-vector comparison with matching: filter keeps lhs values, bool maps") {
    // share > 30% of the type total — brute-forced from the same samples
    val perTU: Map[(String, String), Map[Long, Int]] =
      samples.map { case (k, ss) =>
        k -> ownHours(ss).map(h => h -> win(ss, h, 6).size).toMap
      }
    def typeTotal(t: String, h: Long): Int =
      perTU.collect { case ((tt, _), m) if tt == t && m.contains(h) => m(h) }.sum
    val want = (for {
      ((t, u), m) <- perTU
      (h, c) <- m
      if c / 21600.0 > (typeTotal(t, h) / 21600.0) * 0.3
    } yield Seq(t, u, h.toString) -> rnd(c / 21600.0, 6)).toMap
    val got = run(
      """sum by (type, user) (rate(events[6h])) > on(type) group_left sum by (type) (rate(events[6h])) * 0.3""")
    assertClose(got, want, 1e-9, "threshold filter")
    // bool form emits 1/0 over ALL joined pairs
    val gotB = run(
      """sum by (type, user) (rate(events[6h])) > bool on(type) group_left sum by (type) (rate(events[6h])) * 0.3""")
    assert(gotB.values.forall(v => v == 0.0 || v == 1.0))
    assert(gotB.count(_._2 == 1.0) == want.size, "bool 1-count equals filter survivors")
    // group_right on a comparison is rejected at parse
    assertThrows[Exception](Parser.parse("""a > on(x) group_right b"""))
  }

  test("sgn, clamp, absent_over_time, label_join") {
    // sgn: -1/0/+1, preserving the count-path rate arithmetic
    val g = run("""sgn(sum by (type) (rate(events[1h])) - 0.0003)""")
    assert(g.values.toSet.subsetOf(Set(-1.0, 0.0, 1.0)), s"got ${g.values.toSet}")
    val raw = run("""sum by (type) (rate(events[1h]))""")
    for ((k, v) <- g)
      assert(v == math.signum(raw(k) - 0.0003), s"sgn at $k")
    // clamp pins both ends; min > max empties
    val c = run("""clamp(sum by (type) (increase(events[1h])), 2, 5)""")
    assert(c.nonEmpty && c.values.forall(v => v >= 2.0 && v <= 5.0))
    assert(run("""clamp(events, 5, 2)""").isEmpty)
    // absent_over_time fires exactly where the trailing window is empty
    val a = run("""absent_over_time(events{type="purchase", user="7"}[6h])""")
    val ss = samples.getOrElse(("purchase", "7"), Vector.empty)
    val covered = ss.map(s => hourOf(s.ts)).distinct
      .flatMap(h0 => h0 to math.min(h0 + 5, 719L)).toSet
    val wantAbs = (0L to 719L).filterNot(covered).map(h => Seq(h.toString) -> 1.0).toMap
    assertClose(a, wantAbs, 0.0, "absent_over_time")
    // label_join concatenates source labels into dst
    val lj = run("""label_join(sum by (type, user) (increase(events[3h])), "series", "-", "type", "user")""")
    assert(lj.nonEmpty)
    for ((k, _) <- lj) assert(k(2) == s"${k(0)}-${k(1)}", s"series label at $k")
    assertThrows[Exception](
      PromQL.query(spark, sf0001, """label_join(events, "d", "-", "nope")"""))
  }
}
