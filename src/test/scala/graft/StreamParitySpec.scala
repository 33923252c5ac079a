package graft

import graft.streaming.{StreamReplay, StreamingQueries}
import org.apache.spark.sql.functions._

/** Batch↔stream parity (SURVEY.md §5.4): replay the events parquet as a
  * time-ordered file stream and assert that everything the streaming query
  * EMITS (closed windows, under watermark) equals the batch twin. The stream
  * may emit fewer rows (trailing windows still open at end-of-stream) but
  * never different ones. */
class StreamParitySpec extends SparkSuite {

  private lazy val replayDir = StreamReplay.rewriteOrdered(spark, sf0001, 6)

  test("tumbling windows: emitted rows ⊆ batch, and most windows close") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.tumblingStream(spark, replayDir), "t_tumb")
      .withColumn("w", col("w").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamTumblingWm(spark, sf0001)
    assert(got.except(batch).count() == 0, "stream emitted a row batch disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("geofence hits: emitted (hour, fence) counts ⊆ batch, and most windows close") {
    val got = StreamReplay
      .runToCompletion(spark,
        StreamingQueries.geofenceStream(spark, replayDir, sf0001), "t_geofence")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamGeofence(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "stream emitted a geofence count batch disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("streaming PromQL alert: closed-window firings equal the front-door batch query") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.promqlAlertStream(spark, replayDir), "t_pqlal")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamPromqlAlert(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "stream fired an alert the PromQL batch query disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("sliding windows: emitted rows ⊆ batch, and most windows close") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.slidingStream(spark, replayDir), "t_slide")
      .withColumn("w", col("w").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamSliding(spark, sf0001)
    assert(got.except(batch).count() == 0, "stream emitted a row batch disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("session windows: emitted sessions ⊆ batch sessions") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.sessionStream(spark, replayDir), "t_sess")
      .withColumn("s_start", col("s_start").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamSession(spark, sf0001)
    assert(got.except(batch).count() == 0)
    assert(got.count() > 0)
  }

  test("OHLC bars: closed bars equal the batch qTsOhlc bars") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.ohlcStream(spark, replayDir), "t_ohlc")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val batch = graft.operators.TimeSeries.qTsOhlc(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "stream emitted a bar the batch twin disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("OHLC bars under out-of-order replay: closed bars still equal batch") {
    // ±4 min file jitter within a 10-min watermark: events arrive out of
    // order across microbatches, but every bar that closes must have seen
    // all its events — min_by/max_by state absorbs late rows in any order
    val jdir = StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4)
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.ohlcStream(spark, jdir), "t_ohlc_ooo")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val batch = graft.operators.TimeSeries.qTsOhlc(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "out-of-order stream emitted a bar the batch twin disagrees with")
    assert(got.count() > 0)
  }

  test("burn-rate counters: closed hours equal the batch twin exactly") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.burnRateStream(spark, replayDir), "t_burn")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val batch = StreamingQueries.qStreamBurnCounters(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "stream sealed an (err, tot) hour the batch twin disagrees with")
    val (g, b) = (got.count(), batch.count())
    assert(g > b / 2 && g <= b, s"stream=$g batch=$b")
  }

  test("first-seen screen: sealed admissions equal batch firsts, ordered + jittered") {
    val dirs = Seq(
      replayDir -> "t_first",
      StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4) -> "t_first_ooo")
    for ((dir, name) <- dirs) {
      val got = StreamReplay
        .runToCompletion(spark, StreamingQueries.firstSeenStream(spark, dir), name)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val gotM = got.toMap
      assert(got.length == gotM.size, s"$name: duplicate admissions for a series")
      val batch = StreamingQueries.qStreamFirstSeen(spark, sf0001)
        .selectExpr("user_id", "unix_micros(cast(first_ts as timestamp)) us")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      gotM.foreach { case (u, us) =>
        assert(batch(u) == us, s"$name: user $u admitted at $us, batch first is ${batch(u)}")
      }
      // only the watermark tail may stay unsealed
      assert(gotM.size > batch.size / 2, s"$name: sealed ${gotM.size}/${batch.size}")
    }
  }

  test("streaming DAU: sealed days carry EXACT distinct counts, ordered + jittered") {
    val dayUs = 86400000000L
    val batch = graft.Tables.events(spark, sf0001)
      .selectExpr(s"unix_micros(cast(ts as timestamp)) div $dayUs * $dayUs as day_us", "user_id")
      .groupBy("day_us").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirs = Seq(
      replayDir -> "t_dau",
      StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4) -> "t_dau_ooo")
    for ((dir, name) <- dirs) {
      val got = StreamReplay
        .runToCompletion(spark, StreamingQueries.dauStream(spark, dir), name)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(got.length == got.toMap.size, s"$name: a day sealed twice")
      got.foreach { case (d, n) =>
        assert(batch(d) == n, s"$name: day $d sealed $n, batch distinct is ${batch(d)}")
      }
      // only the watermark-tail day may stay open at end-of-stream
      assert(got.length >= batch.size - 1, s"$name: sealed ${got.length}/${batch.size} days")
    }
  }

  test("stream-stream interval join: emitted pairs ⊆ batch pairs") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.intervalJoinStream(spark, replayDir), "t_ivj")
      .select(col("cu"), col("ct").cast("timestamp_ntz").as("ct"),
        col("pt").cast("timestamp_ntz").as("pt"))
    val e = graft.Tables.events(spark, sf0001)
    val batch = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pt")),
        col("pu") === col("cu") && col("pt") > col("ct") &&
          col("pt") <= col("ct") + expr("INTERVAL 30 MINUTES"))
      .select("cu", "ct", "pt")
    assert(got.except(batch).count() == 0,
      "stream emitted a joined pair the batch twin disagrees with")
    assert(got.count() > 0, "stream closed no join pairs at all")
  }

  test("stream-stream LEFT OUTER interval join: matches ⊆ batch, null rows only for truly unmatched clicks") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.outerJoinStream(spark, replayDir), "t_oj")
      .select(col("cid"), col("ct").cast("timestamp_ntz").as("ct"),
        col("pt").cast("timestamp_ntz").as("pt"))
    val e = graft.Tables.events(spark, sf0001)
    val batchPairs = e.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("ct"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pt")),
        col("pu") === col("cu") && col("pt") > col("ct") &&
          col("pt") <= col("ct") + expr("INTERVAL 30 MINUTES"))
      .select("cid", "ct", "pt")
    val matched = got.filter(col("pt").isNotNull)
    assert(matched.except(batchPairs).count() == 0,
      "stream emitted a joined pair the batch twin disagrees with")
    assert(matched.count() > 0, "stream closed no matched pairs at all")
    // a null-side emission is a PROOF of absence: its cid must have no
    // batch match at all
    val nullCids = got.filter(col("pt").isNull).select("cid")
    assert(nullCids.join(batchPairs, "cid").count() == 0,
      "stream emitted a null row for a click that HAS a purchase in-window")
    assert(nullCids.count() > 0, "watermark never proved any click unmatched")
  }

  test("seasonal spike detector: sealed cells equal the batch grid rows, ordered + jittered") {
    import graft.streaming.StatefulSpike
    val batch = graft.operators.Sre.qTsSpikeRatio(spark, sf0001)
      .select("event_type", "dday", "hod", "x", "base", "ratio", "spike")
    for (dir <- Seq(replayDir, StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4))) {
      val stream = StreamingQueries.eventsStream(spark, dir).withWatermark("ts", "10 minutes")
      val got = StreamReplay.runToCompletion(
        spark, StatefulSpike.spikeStream(stream).toDF(), s"t_spike_${dir.hashCode.abs}")
      assert(got.count() > 0, "spike stream sealed no cells")
      assert(got.except(batch).count() == 0,
        "stream emitted a spike cell the batch grid disagrees with")
      assert(got.count() == got.dropDuplicates("event_type", "dday", "hod").count(),
        "duplicate seals emitted")
    }
  }

  test("page-hinkley: hour-sealed PH rows equal the batch trace, ordered + jittered") {
    import graft.streaming.StatefulPh
    val batch = StreamingQueries.qStreamPageHinkley(spark, sf0001)
      .select("event_type", "h", "ph", "alarm")
    for (dir <- Seq(replayDir, StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4))) {
      val stream = StreamingQueries.eventsStream(spark, dir).withWatermark("ts", "10 minutes")
      val got = StreamReplay.runToCompletion(
        spark, StatefulPh.phStream(stream).toDF(), s"t_ph_${dir.hashCode.abs}")
      assert(got.count() > 0, "ph stream sealed no hours")
      assert(got.except(batch).count() == 0,
        "stream emitted a PH row the batch trace disagrees with")
      assert(got.count() == got.dropDuplicates("event_type", "h").count(),
        "duplicate seals emitted")
    }
  }

  test("burst detector: closed episodes equal the causal batch twin, ordered + jittered") {
    import graft.streaming.StatefulBurst
    val batch = StreamingQueries.qStreamBurst(spark, sf0001)
      .withColumn("start_h", col("start_h").cast("timestamp"))
      .withColumn("end_h", col("end_h").cast("timestamp"))
      .select("event_type", "start_h", "end_h", "n_hours", "peak", "total")
    for (dir <- Seq(replayDir, StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4))) {
      val stream = StreamingQueries.eventsStream(spark, dir).withWatermark("ts", "10 minutes")
      val got = StreamReplay.runToCompletion(
        spark, StatefulBurst.burstStream(stream).toDF(), s"t_burst_${dir.hashCode.abs}")
      assert(got.count() > 0, "burst stream closed no episodes")
      assert(got.except(batch).count() == 0,
        "stream emitted an episode the causal batch twin disagrees with")
      assert(got.count() == got.dropDuplicates("event_type", "start_h").count(),
        "duplicate episodes emitted")
    }
  }

  test("token-bucket limiter: sealed decisions equal the batch fold, ordered + jittered") {
    import graft.streaming.StatefulRateLimit
    import StatefulRateLimit.{CapacityUs, CostUs}
    // reference fold in plain Scala over the batch table
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(cast(ts as timestamp)) tus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (_, es) =>
      var credit = CapacityUs; var last = -1L
      es.map(e => (e._3, e._2)).sorted.toSeq.map { case (tus, id) =>
        if (last >= 0L) credit = math.min(CapacityUs, credit + (tus - last))
        last = tus
        val ok = credit >= CostUs
        if (ok) credit -= CostUs
        id -> ok
      }
    }.toMap
    for (dir <- Seq(replayDir, StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4))) {
      val stream = StreamingQueries.eventsStream(spark, dir).withWatermark("ts", "10 minutes")
      val got = StreamReplay.runToCompletion(
          spark, StatefulRateLimit.rateLimitStream(stream).toDF(), s"t_rl_${dir.hashCode.abs}")
        .select("event_id", "admitted")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1))
      assert(got.nonEmpty, "limiter sealed no decisions")
      val wrong = got.filter { case (id, adm) => expected.get(id).exists(_ != adm) }
      assert(wrong.isEmpty, s"stream decisions diverge from the batch fold: ${wrong.take(5).toSeq}")
      assert(got.map(_._1).distinct.length == got.length, "duplicate decisions emitted")
    }
  }

  test("flatMapGroupsWithState sessionizer agrees with gaps-and-islands on emitted sessions") {
    import graft.streaming.StatefulSessions
    import spark.implicits._
    val stream = StreamingQueries.eventsStream(spark, replayDir)
      .withWatermark("ts", "10 minutes")
    val got = StreamReplay.runToCompletion(
      spark, StatefulSessions.sessionsStream(stream).toDF(), "t_state_sess")
      .select(col("user_id"),
        expr("cast(timestamp_micros(s_start_us) as timestamp_ntz)").as("s_start"),
        col("n_events"), col("dur_s"))
    // batch twin: the gaps-and-islands session formulation
    val islands = StreamingQueries.qStreamSession(spark, sf0001)
      .select(col("user_id"), col("s_start"), col("n_events"))
    val gotK = got.select("user_id", "s_start", "n_events")
    assert(gotK.except(islands).count() == 0,
      "state machine emitted a session the islands formulation disagrees with")
    assert(gotK.count() > 0)
  }

  test("interval merge: out-of-order events extend backward, open separate islands, bridge") {
    import graft.streaming.StatefulSessions.{merge, OpenSession, gapUs}
    val min = 60L * 1000000
    val open = Seq(OpenSession(100 * min, 110 * min, 3))
    // inside the span: count grows, bounds unchanged
    assert(merge(open, Array(105 * min)) == Seq(OpenSession(100 * min, 110 * min, 4)))
    // within gap BEFORE the start: extends backward (the round-1 bug)
    assert(merge(open, Array(80 * min)) == Seq(OpenSession(80 * min, 110 * min, 4)))
    // more than gap before: separate earlier island, not absorbed
    assert(merge(open, Array(30 * min)) ==
      Seq(OpenSession(30 * min, 30 * min, 1), OpenSession(100 * min, 110 * min, 3)))
    // a later event bridges two islands into one
    val two = Seq(OpenSession(30 * min, 30 * min, 1), OpenSession(100 * min, 110 * min, 3))
    assert(merge(two, Array(55 * min, 75 * min)) == Seq(OpenSession(30 * min, 110 * min, 6)))
    assert(gapUs == 30 * min)
  }

  test("stateful sessionizer handles out-of-order replay within the watermark") {
    import graft.streaming.{StatefulSessions, StreamReplay}
    // ±4-min jittered file placement: events arrive out of order across
    // microbatches (legal under the 10-min watermark), hitting the
    // backward-extension / separate-earlier-interval merge paths that a
    // time-ordered replay never exercises.
    val jitteredDir = StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4)
    val stream = StreamingQueries.eventsStream(spark, jitteredDir)
      .withWatermark("ts", "10 minutes")
    val got = StreamReplay.runToCompletion(
      spark, StatefulSessions.sessionsStream(stream).toDF(), "t_state_sess_ooo")
      .select(col("user_id"),
        expr("cast(timestamp_micros(s_start_us) as timestamp_ntz)").as("s_start"),
        col("n_events"))
    val islands = StreamingQueries.qStreamSession(spark, sf0001)
      .select(col("user_id"), col("s_start"), col("n_events"))
    assert(got.except(islands).count() == 0,
      "out-of-order replay emitted a session the islands formulation disagrees with")
    assert(got.count() > 0)
  }

  /** Closed TWA days must match the batch lead()-formulation. Joined
    * comparison with relative tolerance instead of except(): the stream
    * integrates in sorted order while batch sums in partial-agg order, so
    * the big Σ value·dt terms can differ in the last ulps. */
  private def assertTwaParity(dir: String, tag: String): Unit = {
    import graft.streaming.StatefulTwa
    val stream = StreamingQueries.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
    val got = StreamReplay.runToCompletion(
      spark, StatefulTwa.twaStream(stream).toDF(), tag)
      .select(col("user_id"),
        expr("cast(timestamp_micros(day_us) as date)").as("dday"),
        col("n_seg"), col("twa"))
    val batch = graft.operators.TimeSeries.qTsTwa(spark, sf0001)
      .withColumnRenamed("twa", "twa_b").withColumnRenamed("n_seg", "n_seg_b")
    val j = got.join(batch, Seq("user_id", "dday"), "left").collect()
    assert(j.nonEmpty, "stream closed no TWA days at all")
    j.foreach { r =>
      assert(!r.isNullAt(4), s"stream emitted a day batch lacks: $r")
      assert(r.getLong(2) == r.getLong(4), s"n_seg mismatch: $r")
      val (s, b) = (r.getDouble(3), r.getDouble(5))
      assert(math.abs(s - b) <= 1e-6 * math.max(1.0, math.abs(b)), s"twa mismatch: $r")
    }
  }

  test("stateful TWA: closed days equal the batch qTsTwa formulation") {
    assertTwaParity(replayDir, "t_twa")
  }

  test("stateful TWA under out-of-order replay: closed days still equal batch") {
    // ±4-min jitter within the 10-min watermark: late events land BETWEEN
    // already-buffered points, exercising the segment-split path an
    // ordered replay never hits
    assertTwaParity(StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4), "t_twa_ooo")
  }

  /** Streaming sketch face: every closed window's t-digest must carry the
    * exact row count (deterministic parity) and answer quantiles within
    * rank tolerance of that window's true distribution; MERGING the
    * emitted sketches must answer whole-range quantiles — the full
    * sketch-at-ingest / merge-at-query serving pattern, exercised
    * end-to-end through the state store. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i + 1 else -(i + 1)
    pos.toDouble / sorted.length
  }

  private def assertTdigestParity(dir: String, tag: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.tdigestStream(spark, dir), tag)
    val rows = got
      .withColumn("p50", expr("graft_tdigest_quantile(sketch, 0.5d)"))
      .select(col("h").cast("timestamp_ntz").as("h"), col("event_type"),
        col("n"), col("p50"))
      .collect()
    assert(rows.nonEmpty, "stream closed no sketch windows")

    // exact per-(hour, type) values from the static table; string keys
    // sidestep LocalDateTime/Timestamp class mismatch across the two sides
    val exact = Tables.events(spark, sf0001)
      .select(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"),
        col("event_type"), col("value"))
      .collect()
      .groupBy(r => (r.get(0).toString, r.getString(1)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).sorted }

    rows.foreach { r =>
      val k = (r.get(0).toString, r.getString(1))
      val vs = exact.getOrElse(k, fail(
        s"stream closed a window batch lacks: $k; sample batch keys: ${exact.keys.take(3)}"))
      assert(r.getLong(2) == vs.length, s"$k: stream n=${r.getLong(2)} batch n=${vs.length}")
      // windows are tiny at sf0.001, so scale the rank tolerance by 1.5/n
      // (an interpolated quantile can land a full inter-point gap off)
      val tol = math.max(0.02, 1.5 / vs.length)
      assert(math.abs(rankOf(vs, r.getDouble(3)) - 0.5) <= tol,
        s"$k: p50=${r.getDouble(3)} rank=${rankOf(vs, r.getDouble(3))} n=${vs.length}")
    }

    // merge-at-query over the emitted sketches, vs exact over the SAME
    // closed windows (the stream may not have closed the trailing hours)
    val closed = rows.map(r => (r.get(0).toString, r.getString(1))).toSet
    val mergedExact = exact.filter { case (k, _) => closed(k) }
      .toSeq.groupBy(_._1._2)
      .map { case (et, kvs) => et -> kvs.flatMap(_._2).toArray.sorted }
    got.groupBy("event_type")
      .agg(expr("graft_tdigest_merge(sketch)").as("sk"))
      .select(col("event_type"),
        expr("graft_tdigest_quantile(sk, 0.5d)").as("p50"),
        expr("graft_tdigest_quantile(sk, 0.95d)").as("p95"))
      .collect()
      .foreach { r =>
        val vs = mergedExact(r.getString(0))
        assert(math.abs(rankOf(vs, r.getDouble(1)) - 0.50) <= 0.02,
          s"${r.getString(0)} merged p50 rank=${rankOf(vs, r.getDouble(1))}")
        assert(math.abs(rankOf(vs, r.getDouble(2)) - 0.95) <= 0.02,
          s"${r.getString(0)} merged p95 rank=${rankOf(vs, r.getDouble(2))}")
      }
  }

  test("streaming heavy hitters: closed windows are EXACT at capacity; merged summaries bound true counts") {
    graft.functions.GraftFunctions.register(spark)
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.freqStream(spark, replayDir), "t_freq")
    val rows = got
      .select(col("h").cast("timestamp_ntz").as("h"), col("n"),
        expr("graft_freq_topk(sketch, 64)").as("top"),
        expr("graft_freq_err(sketch)").as("err"))
      .collect()
    assert(rows.nonEmpty, "stream closed no sketch windows")

    val exact = Tables.events(spark, sf0001)
      .select(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"),
        col("user_id").cast("string").as("u"))
      .collect()
      .groupBy(_.get(0).toString)
      .map { case (k, rs) => k -> rs.groupBy(_.getString(1)).map { case (u, g) => u -> g.length.toLong } }

    rows.foreach { r =>
      val k = r.get(0).toString
      val want = exact.getOrElse(k, fail(s"stream closed a window batch lacks: $k"))
      // ≤64 distinct users per hour at sf0.001 ⇒ no eviction ever fires:
      // the summary IS the exact per-user count map, err stays 0
      assert(r.getLong(3) == 0L, s"$k: expected exact summary, err=${r.getLong(3)}")
      val gotCounts = r.getSeq[org.apache.spark.sql.Row](2)
        .map(e => e.getString(0) -> e.getLong(1)).toMap
      assert(gotCounts == want, s"$k: stream counts $gotCounts != batch $want")
      assert(r.getLong(1) == want.values.sum)
    }

    // merge-at-query across the closed windows: Misra-Gries bounds must
    // hold against the exact totals over the SAME windows
    val closed = rows.map(_.get(0).toString).toSet
    val totals = exact.filter { case (k, _) => closed(k) }
      .values.flatten.groupBy(_._1).map { case (u, kvs) => u -> kvs.map(_._2).sum }
    val merged = got.agg(expr("graft_freq_merge(sketch)").as("msk"))
      .select(expr("graft_freq_topk(msk, 64)").as("top"), expr("graft_freq_err(msk)").as("err"))
      .head()
    val err = merged.getLong(1)
    merged.getSeq[org.apache.spark.sql.Row](0).foreach { e =>
      val (u, cntMin) = (e.getString(0), e.getLong(1))
      val truth = totals.getOrElse(u, 0L)
      assert(cntMin <= truth && truth <= cntMin + err,
        s"user $u: cnt_min=$cntMin err=$err violates bounds around true=$truth")
    }
  }

  test("streaming KMV: closed windows are EXACT below saturation; merged sketches too") {
    graft.functions.GraftFunctions.register(spark)
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.kmvStream(spark, replayDir), "t_kmv")
    // string keys via Spark's own cast on BOTH sides (a driver-side
    // LocalDateTime.toString would use the ISO 'T' form and match nothing)
    val rows = got
      .select(col("h").cast("timestamp_ntz").cast("string").as("h"), col("n"),
        expr("graft_kmv_est(sketch)").as("est"))
      .collect()
    assert(rows.nonEmpty, "stream closed no sketch windows")
    // < 64 distinct users per hour at sf0.001 ⇒ every sketch is
    // undersaturated ⇒ the estimate IS the exact distinct count
    val exact = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").cast("string").as("h"))
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val want = exact.getOrElse(r.getString(0), fail(s"stream closed a window batch lacks: ${r.getString(0)}"))
      assert(r.getDouble(2) == want.toDouble,
        s"${r.getString(0)}: streaming KMV est ${r.getDouble(2)} != exact $want")
    }
    // merge-at-query across closed windows: distinct users over the SAME
    // window set (saturated now, so assert the lossless-merge identity
    // against sketching those windows' rows directly)
    val closed = rows.map(_.getString(0)).toSet
    val h = graft.operators.Dedup.h60("'kmv'", "cast(user_id as string)")
    val direct = Tables.events(spark, sf0001)
      .withColumn("hh", date_trunc("hour", col("ts")).cast("timestamp_ntz").cast("string"))
      .filter(col("hh").isin(closed.toSeq: _*))
      .agg(expr(s"graft_kmv($h, 64)").as("sk"))
      .select(expr("graft_kmv_est(sk)")).head().getDouble(0)
    val merged = got.agg(expr("graft_kmv_merge(sketch)").as("msk"))
      .select(expr("graft_kmv_est(msk)")).head().getDouble(0)
    assert(merged == direct, s"KMV merge not lossless through the state store: $merged vs $direct")
  }

  test("streaming t-digest: closed windows sketch exactly-counted, quantiles within rank tolerance") {
    assertTdigestParity(replayDir, "t_td")
  }

  test("streaming t-digest under out-of-order replay: same guarantees") {
    assertTdigestParity(StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4), "t_td_ooo")
  }

  test("seal: pairs finalize strictly below the watermark; carry keeps the left endpoint") {
    import graft.streaming.StatefulGaps.{seal, thresholdUs}
    val h = thresholdUs // 1h in µs
    // nothing sealed when the watermark hasn't passed the second point
    assert(seal(Seq(0L, 2 * h), wmUs = 2 * h) == (Nil, Seq(0L, 2 * h)))
    // sealed once strictly below wm; sub-threshold pairs seal silently
    assert(seal(Seq(0L, 2 * h, 2 * h + 10), wmUs = 3 * h) ==
      (Seq((0L, 2 * h)), Seq(2 * h + 10)))
    // an out-of-order arrival INSIDE a would-be gap splits it
    assert(seal(Seq(0L, 2 * h, h), wmUs = 3 * h) == (Nil, Seq(2 * h)))
    // duplicates collapse; empty input is a no-op
    assert(seal(Seq(5L, 5L), wmUs = 10L) == (Nil, Seq(5L)))
    assert(seal(Nil, wmUs = 10L) == (Nil, Nil))
  }

  /** Closed gaps must match the batch lag-formulation exactly (all-integer
    * output — no float tolerance needed). */
  private def assertGapsParity(dir: String, tag: String): Unit = {
    import graft.streaming.StatefulGaps
    val stream = StreamingQueries.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
    val got = StreamReplay.runToCompletion(
      spark, StatefulGaps.gapsStream(stream).toDF(), tag)
      .select(col("event_type"),
        expr("cast(timestamp_micros(gap_start_us) as timestamp_ntz)").as("gap_start"),
        expr("cast(timestamp_micros(gap_end_us) as timestamp_ntz)").as("gap_end"),
        col("gap_s"))
    val batch = graft.operators.TimeSeries.qTsGaps(spark, sf0001)
    assert(got.except(batch).count() == 0,
      "stream emitted a gap the batch twin disagrees with")
    assert(got.count() > 0, "stream sealed no gaps at all")
  }

  test("stateful gaps: sealed gaps equal the batch qTsGaps formulation") {
    assertGapsParity(replayDir, "t_gaps")
  }

  test("stateful gaps under out-of-order replay: sealed gaps still equal batch") {
    // ±4-min jitter within the 10-min watermark: late events land inside
    // would-be gaps, exercising the split path ordered replay never hits
    assertGapsParity(StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4), "t_gaps_ooo")
  }

  test("continuous aggregate fed by the STREAMING rollup equals direct batch aggregation") {
    import graft.operators.Num
    import graft.sources.Ingest
    // 1. the streaming job: hourly (cnt, sv8) partials emitted as windows
    //    close under the watermark — the rollup rows a production
    //    writeStream would append to the rollup table
    val closed = StreamReplay.runToCompletion(
      spark, StreamingQueries.hourlyRollupStream(spark, replayDir), "t_cagg")
      .withColumn("h", col("h").cast("timestamp_ntz"))
    val cutoff = "2024-01-26"
    val rollup = closed.filter(to_date(col("h")) < lit(cutoff).cast("date"))
    // every pre-cutoff hour must have closed (data runs days past cutoff)
    val batchHours = Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) < lit(cutoff).cast("date"))
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type")).distinct().count()
    assert(rollup.count() == batchHours,
      s"stream closed ${rollup.count()} pre-cutoff windows, batch has $batchHours")
    // 2. serve: streaming-written rollup + on-the-fly batch tail
    val tail = Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) >= lit(cutoff).cast("date"))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Num.roundd(sum("value"), 8).as("sv8"))
    val served = Ingest.caggDailyMerge(rollup, tail).collect()
    // 3. direct whole-range aggregation through the same two-level scheme
    val direct = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Num.roundd(sum("value"), 8).as("sv8"))
      .groupBy(date_trunc("day", col("h")).cast("date").as("dday"), col("event_type"))
      .agg(sum("cnt").as("cnt"), Num.roundd(Num.roundd(sum("sv8"), 8), 2).as("sv"))
      .orderBy("dday", "event_type").collect()
    assert(served.length == direct.length,
      s"served ${served.length} day rows, direct ${direct.length}")
    served.zip(direct).foreach { case (s, d) =>
      assert(s.get(0) == d.get(0) && s.getString(1) == d.getString(1) &&
        s.getLong(2) == d.getLong(2), s"cnt/key mismatch: $s vs $d")
      // the stream sums a window's values in state-update order, batch in
      // partial-agg order — sv8 can differ in the last ulps pre-round
      assert(math.abs(s.getDouble(3) - d.getDouble(3)) <= 1e-6, s"sv mismatch: $s vs $d")
    }
  }

  /** Fired crossings must match the batch lag-formulation at the same
    * threshold over sealed hours (the stream may lack trailing ones). */
  private def assertAlertsParity(dir: String, tag: String): Unit = {
    import graft.streaming.StatefulAlerts
    import graft.operators.Num
    val T = 60.0 // sf0.001 hourly sums are ~40-120: genuinely crossed
    val stream = StreamingQueries.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
    val got = StreamReplay.runToCompletion(
      spark, StatefulAlerts.alertsStream(stream, T).toDF(), tag)
      .select(col("event_type"),
        expr("cast(timestamp_micros(hour_us) as timestamp_ntz)").cast("string").as("h"),
        col("prev_sv"), col("sv"))
      .collect()
    assert(got.nonEmpty, "stream fired no crossings at all")
    // batch twin at the same threshold (the catalog query pins T=400 for
    // the sf0.01 oracle; the transform is identical)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy("h")
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
      .agg(Num.roundd(sum("value"), 2).as("sv"))
      .withColumn("prev_sv", lag("sv", 1).over(w))
      .filter(col("sv") > T && col("prev_sv") <= T)
      .select(col("event_type"), col("h").cast("string").as("h"), col("prev_sv"), col("sv"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (bp, bs) = batch.getOrElse(k, fail(s"stream fired a crossing batch lacks: $k"))
      assert(math.abs(r.getDouble(2) - bp) <= 0.01 && math.abs(r.getDouble(3) - bs) <= 0.01,
        s"$k: stream (${r.getDouble(2)}, ${r.getDouble(3)}) vs batch ($bp, $bs)")
    }
  }

  test("stateful alerts: fired crossings equal the batch lag-form on sealed hours") {
    assertAlertsParity(replayDir, "t_alerts")
  }

  test("stateful alerts under out-of-order replay: sealed sums are replay-order independent") {
    assertAlertsParity(StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4), "t_alerts_ooo")
  }

  test("dedup-within-watermark: unique event_ids all pass through") {
    val got = StreamReplay
      .runToCompletion(spark, StreamingQueries.dedupStream(spark, replayDir), "t_dedup")
    assert(got.count() == Tables.events(spark, sf0001).count())
  }

  test("stream-static join enriches events with the customer dimension") {
    val got = StreamReplay.runToCompletion(spark,
      StreamingQueries.staticJoinStream(spark, replayDir, sf0001), "t_join")
    val batchCnt = Tables.events(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("user_id") === col("c_custkey")).count()
    assert(got.count() == batchCnt)
  }

  test("streaming ingest under out-of-order replay: layout still ≡ batch") {
    import graft.streaming.StreamIngest
    // events arrive out of order ACROSS microbatches (±4 min jitter); the
    // append-only file sink is order-independent, so the materialized
    // layout must still equal the batch writer's — rows land in their
    // event-time day directory regardless of arrival order
    val feed = StreamReplay.rewriteJittered(spark, sf0001, 8)
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_jit_").toString
    val q = StreamIngest.ingestByDay(spark, feed, s"$base/out", s"$base/ckpt",
      filesPerTrigger = 2)
    q.awaitTermination()
    val sink = spark.read.parquet(s"$base/out")
    val batch = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"), col("day"))
    val streamed = sink.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("day"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0,
      "jitter-replayed ingest layout differs from the batch layout")
  }

  test("streaming ingest: kill mid-stream, resume from checkpoint, layout ≡ batch") {
    import graft.streaming.StreamIngest
    val feed = StreamReplay.rewriteOrdered(spark, sf0001, 12)
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_stream_").toString
    val out = s"$base/events_by_day"
    val ckpt = s"$base/checkpoint"

    // phase 1: start ingesting one feed file per microbatch, kill after a few
    val q1 = StreamIngest.ingestByDay(spark, feed, out, ckpt)
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (q1.isActive && q1.recentProgress.length < 3 && System.nanoTime() < deadline)
      Thread.sleep(50)
    q1.stop()
    q1.awaitTermination()
    val committedAfterKill = spark.read.parquet(out).count()
    val total = Tables.events(spark, sf0001).count()
    assert(committedAfterKill > 0, "nothing committed before the kill")
    assert(committedAfterKill < total,
      s"stream drained fully before the kill ($committedAfterKill/$total) — resume not exercised")

    // phase 2: restart from the SAME checkpoint; AvailableNow drains the rest
    val q2 = StreamIngest.ingestByDay(spark, feed, out, ckpt)
    q2.awaitTermination()

    // exactly-once: no duplicates, no gaps — the sink (read through its
    // _spark_metadata log) holds each event exactly once
    val sink = spark.read.parquet(out)
    assert(sink.count() == total, s"resumed sink has ${sink.count()} rows, want $total")
    assert(sink.select("event_id").distinct().count() == total, "duplicate events after resume")

    // layout ≡ batch: same day partitioning, same rows verbatim
    val batch = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"), col("day"))
    val streamed = sink.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("day"))
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0,
      "streamed by-day layout differs from the batch layout")
    val dayDirs = new java.io.File(out).listFiles.count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs == 30, s"expected 30 day= directories, got $dayDirs")
  }

  /** Stream-stream as-of parity: every probe the stream SEALS (watermark
    * passed its ts) must carry exactly the keyedAsof batch enrichment, and
    * the sealed set must be exactly the batch probes at or below the final
    * watermark (maxEventTimeMs - delayMs — the same ms-granular formula
    * Spark's EventTimeStats uses). */
  private def assertAsofParity(dir: String, name: String): Unit = {
    import graft.streaming.StreamAsof
    val delayMs = 10 * 60 * 1000L
    val src = StreamingQueries.eventsStream(spark, dir)
    val probes = src.filter(col("event_type") =!= "signup")
    val ref = src.filter(col("event_type") === "signup").select("user_id", "ts", "value")
    val got = StreamReplay
      .runToCompletion(spark, StreamAsof.asofEnrich(probes, ref, "10 minutes").toDF(), name)
      .select("probe_id", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val ev = Tables.events(spark, sf0001)
    // the global watermark is the MIN across the two watermarked branches
    // (probes and reference advance independently; the slower one gates)
    val maxMicros = math.min(
      ev.filter(col("event_type") =!= "signup")
        .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0),
      ev.filter(col("event_type") === "signup")
        .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0))
    val wmMicros = (maxMicros / 1000L - delayMs) * 1000L
    val bProbes = ev.filter(col("event_type") =!= "signup")
    val bRef = ev.filter(col("event_type") === "signup").select("user_id", "ts", "value")
    val want = graft.operators.AsofJoin.keyedAsof(bProbes, bRef, "user_id", "ts", "ts", "value")
      .filter(unix_micros(col("ts").cast("timestamp")) <= wmMicros)
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val missing = (want.keySet -- got.keySet).toSeq.sorted
    val extra = (got.keySet -- want.keySet).toSeq.sorted
    assert(missing.isEmpty && extra.isEmpty,
      s"sealed ${got.size} vs batch prefix ${want.size}; " +
        s"missing=${missing.take(10).mkString(",")} extra=${extra.take(10).mkString(",")}")
    val diverged = want.collect { case (id, v) if got.get(id) != Some(v) => id }
    assert(diverged.isEmpty,
      s"${diverged.size} probes diverged from keyedAsof, e.g. ${diverged.take(5).mkString(",")}")
  }

  test("stream-stream as-of: sealed probes equal keyedAsof on the closed prefix") {
    assertAsofParity(StreamReplay.rewriteOrdered(spark, sf0001, 6), "t_asof_s")
  }

  test("stream-stream as-of under out-of-order replay: sealed probes still equal batch") {
    assertAsofParity(StreamReplay.rewriteJittered(spark, sf0001, 6, jitterMinutes = 4), "t_asof_s_ooo")
  }

  test("streaming dedup screen: corpus/within/cross-batch dups rejected, index extends, one-shot parity") {
    import spark.implicits._
    import java.nio.file.Files
    val texA = (1 to 40).map(i => s"w$i").mkString(" ")
    val texB = (100 to 140).map(i => s"x$i").mkString(" ")
    val texC = (200 to 240).map(i => s"y$i").mkString(" ")
    val texD = (300 to 340).map(i => s"z$i").mkString(" ")
    val corpus = Seq((1L, texA), (2L, texB)).toDF("doc_id", "text")
    val root = Files.createTempDirectory("screen").toString
    val (feed, idxP, outP, ckp) =
      (s"$root/feed", s"$root/sigidx", s"$root/admitted", s"$root/ckp")
    graft.operators.Dedup.bandSigIndex(
        graft.operators.Dedup.minHashFromText(corpus, "text", numHashes = 8),
        "doc_id", bands = 4)
      .write.parquet(idxP)
    // two micro-batches, ordered by file mtime (maxFilesPerTrigger = 1)
    val b1 = Seq((10L, texA), (11L, texC), (12L, texC)).toDF("doc_id", "text")
    val b2 = Seq((20L, texC), (21L, "too short"), (22L, texD)).toDF("doc_id", "text")
    b1.repartition(1).write.mode("append").parquet(feed)
    Thread.sleep(1500)
    b2.repartition(1).write.mode("append").parquet(feed)
    graft.streaming.StreamScreen
      .screenDocs(spark, feed, idxP, outP, ckp)
      .awaitTermination(120000)
    val admitted = spark.read.parquet(outP).select("doc_id").as[Long].collect().sorted.toSeq
    // 10 = corpus dup, 12 = within-batch dup of 11, 20 = cross-batch dup
    // of SURVIVOR 11 (caught only because the index extended); 21 is
    // unshingleable, 22 is fresh
    assert(admitted == Seq(11L, 21L, 22L), s"got $admitted")
    // index grew by bands × admitted-docs-with-signatures (11, 22)
    assert(spark.read.parquet(idxP).count() == (2 + 2) * 4L)
    // on this fixture the sequential screen equals the one-shot batch
    // screen over the full arrival set (dup groups are consistent)
    val oneShot = graft.operators.Dedup.incrementalDedup(
        graft.operators.Dedup.bandSigIndex(
          graft.operators.Dedup.minHashFromText(corpus, "text", numHashes = 8),
          "doc_id", bands = 4),
        b1.unionByName(b2), "doc_id", "text")
      .filter(col("keep") === 1L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(oneShot == admitted, s"one-shot $oneShot vs streamed $admitted")
  }

  test("streaming ANN maintenance: stream-maintained layout ≡ the batch CDC path") {
    import graft.sources.Ingest
    // same net mutation set, two delivery mechanisms: annCdcMaintained
    // applies delete-then-upsert as direct batch calls; the stream feed
    // delivers upserts then tombstones through foreachBatch micro-batches
    val cdc = Ingest.annCdcMaintained(spark, sf0001)
    val str = Ingest.annStreamMaintained(spark, sf0001)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("bucket"),
        expr("cast(embedding as array<double>)").as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toVector))
      .sortBy(r => (r._1, r._2)).toSeq
    val (a, b) = (rows(cdc), rows(str))
    assert(a == b, s"layout rows diverge: cdc=${a.size} stream=${b.size}")
    // vec-index parity: same buckets, byte-identical blooms (bit-OR
    // aggregation is order-free, so the incremental index converges)
    def idx(p: String) = spark.read.parquet(Ingest.vecIdxPath(p))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bloom").toVector)
      .toMap
    val (ia, ib) = (idx(cdc), idx(str))
    assert(ia.keySet == ib.keySet, "index bucket sets diverge")
    for ((k, v) <- ia) assert(ib(k) == v, s"bloom bytes diverge at bucket $k")
  }

  test("streaming ANN maintenance: bulk-tombstone batch beyond the bound fails loudly, within it lands") {
    import graft.sources.Ingest
    import graft.streaming.StreamVectors
    // isolated layout under a temp root — the shared fixtures stay untouched
    val root = java.nio.file.Files.createTempDirectory("graft_bulk_tomb").toString
    val layout = Ingest.embeddingsByBucket(spark, sf0001, 6, 64, root)
    val before = spark.read.parquet(layout).count()
    val emb = graft.Tables.embeddings(spark, sf0001)
    val ids = emb.select("vec_id").orderBy("vec_id").limit(12).collect().map(_.getLong(0))
    val feed = s"$root/feed"
    emb.filter(col("vec_id").isin(ids: _*)).withColumn("op", lit("d"))
      .repartition(1).write.mode("append").parquet(feed)
    // 12 tombstones against a bound of 8: the batch must FAIL loudly
    // (VERDICT r12 #4 — no unbounded driver materialization), and fail
    // BEFORE mutating the layout
    val q1 = StreamVectors.maintainAnnIndex(spark, feed, layout, s"$root/ckpt1",
      maxTombstonesPerBatch = 8L)
    val ex = intercept[Exception] { q1.awaitTermination(300000) }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
    assert(chain(ex).exists(_.contains("maxTombstonesPerBatch")),
      s"expected the bound in the failure chain, got: ${chain(ex).take(2)}")
    assert(spark.read.parquet(layout).count() == before, "failed batch mutated the layout")
    // same feed under the default bound: applies cleanly, ids are gone
    val q2 = StreamVectors.maintainAnnIndex(spark, feed, layout, s"$root/ckpt2")
    q2.awaitTermination(300000)
    val after = spark.read.parquet(layout)
    assert(after.count() == before - ids.length, "bulk delete row count")
    assert(after.filter(col("vec_id").isin(ids: _*)).count() == 0, "tombstoned ids still present")
  }
}
