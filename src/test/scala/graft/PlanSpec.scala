package graft

import graft.operators.{Analytics, TimeSeries}

/** Physical-plan assertions for the scale claims the operator docs make
  * (SURVEY §4): not "does it answer right" (check.py's job) but "is the
  * plan the one that survives 100×". */
class PlanSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countExchanges(p: String): Int =
    "(?i)Exchange (hash|range)partitioning".r.findAllIn(p).length

  test("salted join runs as a shuffle join (a broadcast would make the salt vacuous)") {
    val p = plan(Analytics.qJoinSkewSalted(spark, sf0001))
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin in:\n$p")
    assert(!p.contains("BroadcastHashJoin"), "dim side must not broadcast in the salt demo")
  }

  test("decorrelated scalar subquery broadcasts the 25-row aggregate, not the fact side") {
    val p = plan(Analytics.qSubqueryScalar(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$p")
  }

  test("window-form retention shuffles the daily table once, not twice (no self-join)") {
    val p = plan(TimeSeries.qTsRetention(spark, sf0001))
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("ShuffledHashJoin"),
      s"retention must not self-join:\n$p")
    // distinct + user_id (window) + d (agg) + the orderBy range exchange
    assert(countExchanges(p) <= 4, s"too many exchanges:\n$p")
  }

  test("cohort matrix: window form, no self-join, bounded exchanges") {
    val p = plan(TimeSeries.qTsCohort(spark, sf0001))
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("ShuffledHashJoin"),
      s"cohort must not self-join:\n$p")
    // distinct + user_id (first-day window) + (cohort,offset) agg +
    // cohort (rate window) + the orderBy range exchange
    assert(countExchanges(p) <= 5, s"too many exchanges:\n$p")
  }

  test("pivot with explicit values reads the source once (no distinct discovery scan)") {
    val p = plan(Analytics.qPivot(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"explicit value list must not trigger a discovery scan:\n$p")
    // (day,type) pre-agg shuffle + pivotfirst-on-day shuffle + order
    assert(countExchanges(p) <= 3, s"too many exchanges:\n$p")
  }

  test("tfidf reuses the tf aggregation for df (no second tokenize of the corpus)") {
    val df = graft.operators.LlmScale.qTextTfidf(spark, sf0001)
    df.collect() // AQE settles the final plan only after execution
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    // count scans in the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(p).length
    // one tokenize scan + the zero-column corpus-count scan (footer-only)
    assert(scans <= 2, s"tf must be computed once, not re-derived for df ($scans scans):\n$p")
  }

  test("stratified sample filters on the hash prefix BEFORE the window sort") {
    val qe = Analytics.qSampleStratified(spark, sf0001).queryExecution
    val opt = qe.optimizedPlan.toString
    // the md5 < '4' prefilter must sit below the Window node so only 25%
    // of rows reach the per-stratum sort (at sf0.001 the guard then fires
    // at collect-time — the plan, not the result, is under test here)
    val filterIdx = opt.indexOf("< 4")
    val windowIdx = opt.indexOf("Window")
    assert(filterIdx >= 0, s"hash prefilter missing from optimized plan:\n$opt")
    assert(windowIdx >= 0 && filterIdx > windowIdx,
      s"prefilter must be pushed below the window (appear after it in the tree):\n$opt")
  }

  test("ohlc is a single hash aggregate, not a window sort") {
    val p = plan(TimeSeries.qTsOhlc(spark, sf0001))
    assert(!p.contains("Window"), s"OHLC must not use a window:\n$p")
    // partial+final agg share one (h, type) exchange; plus the orderBy
    assert(countExchanges(p) <= 2, s"too many exchanges:\n$p")
  }

  test("sketch aggregates: object hash aggregate with map-side partials, one data shuffle") {
    import graft.operators.Sketches
    val qs = Seq(
      "tdigest" -> Sketches.qSketchQuantile,
      "freq" -> Sketches.qSketchFreqExact,
      "hist_quantile" -> Sketches.qSketchHistQuantile)
    qs.foreach { case (name, q) =>
      val p = plan(q(spark, sf0001))
      // TypedImperativeAggregates run in ObjectHashAggregate; TWO nodes
      // (partial + final) mean the sketch states merge map-side, so the
      // shuffle carries O(state) per partition per group — the 100 TB shape
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$name: expected partial+final ObjectHashAggregate:\n$p")
      assert(countExchanges(p) <= 2, s"$name: too many exchanges:\n$p")
    }
  }

  test("merged per-day sketches: day agg + global merge, no extra shuffles") {
    import graft.operators.Sketches
    Seq("tdigest_merge" -> Sketches.qSketchTdigestMerge,
        "freq_hh" -> Sketches.qSketchFreqHh).foreach { case (name, q) =>
      val p = plan(q(spark, sf0001))
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$name: expected partial+final ObjectHashAggregate:\n$p")
      // day-keyed exchange (+ rnk orderBy for freq_hh); the global merge
      // runs through Exchange SinglePartition, which is not a data shuffle
      assert(countExchanges(p) <= 2, s"$name: too many exchanges:\n$p")
    }
  }

  test("scan projection is pruned to the selected columns at the parquet reader") {
    val p = plan(graft.Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"scan reads pruned columns only, got: $readSchema")
  }

  test("bloom probe filters the fact scan BELOW the join, inside whole-stage codegen") {
    val df = graft.operators.Relational.qJoinBloomPruned(spark, sf0001)
    df.collect() // AQE settles the final plan only after execution
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val probeAt = p.indexOf("graft_might_contain")
    assert(probeAt >= 0, s"expected graft_might_contain in:\n$p")
    // plans print top-down: the join node must appear BEFORE (above) the
    // probe filter, i.e. the probe runs scan-side, pre-shuffle
    val joinAt = "Join".r.findFirstMatchIn(p).map(_.start).getOrElse(Int.MaxValue)
    assert(joinAt < probeAt, s"probe must sit below the join:\n$p")
    // the probe's Filter line is codegen'd (starts with the `*(n)` span
    // marker) — a CodegenFallback here would break the scan stage's span
    val probeLine = p.substring(0, probeAt).split("\n").last + "graft_might_contain"
    assert(probeLine.contains("*("),
      s"probe filter must be inside a WholeStageCodegen span, got: $probeLine")
  }

  test("irate: both window passes ride ONE shuffle (shared partition key)") {
    val p = plan(TimeSeries.qTsIrate(spark, sf0001))
    // 1 hash exchange for the (user, day) windows + 1 range exchange for
    // the ordered output — a second hash exchange would mean the desc-rank
    // pass re-shuffled what the lag pass already partitioned
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected one hash exchange, got $hashEx:\n$p")
  }

  test("deriv: moment sums are one hash aggregate, no window, single scan") {
    val p = plan(TimeSeries.qTsDeriv(spark, sf0001))
    assert(!p.contains("Window"), s"deriv must not use a window:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected one aggregation shuffle, got $hashEx:\n$p")
  }

  test("predict_linear: closed-form moment sums, no window, single scan + one shuffle") {
    val p = plan(TimeSeries.qTsPredictLinear(spark, sf0001))
    assert(!p.contains("Window"), s"predict_linear must not use a window:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected one aggregation shuffle, got $hashEx:\n$p")
  }

  test("resets: lag window and reset-count aggregate share ONE (user, day) shuffle") {
    val p = plan(TimeSeries.qTsResets(spark, sf0001))
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"window + agg must ride one hash exchange, got $hashEx:\n$p")
  }

  test("quantile_over_time: sliding windows Expand each row <=4x, no grid range-join") {
    val p = plan(TimeSeries.qTsQuantileTime(spark, sf0001))
    assert(p.contains("Expand"), s"F.window sliding must lower to Expand:\n$p")
    assert(!p.toLowerCase.contains("join"), s"no grid join allowed:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
  }

  test("temperature mix sampling: rate tables broadcast, corpus never sort-merge-joins") {
    val p = plan(graft.operators.LlmScale.qDocsTempSample(spark, sf0001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"per-source rates must broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle for a 6-row rate table:\n$p")
  }

  test("seasonal naive: hourly aggregate + weekly lag, one scan, no self-join") {
    val p = plan(TimeSeries.qTsSeasonalNaive(spark, sf0001))
    assert(!p.toLowerCase.contains("join"), s"seasonal baseline must not self-join:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
  }

  test("vector ratio: both PromQL sides come from ONE scan and ONE aggregate, no join") {
    val p = plan(TimeSeries.qTsVectorRatio(spark, sf0001))
    assert(!p.toLowerCase.contains("join"), s"ratio must not join two aggregates:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected one aggregation shuffle, got $hashEx:\n$p")
  }

  test("burn rate + alert_for: ONE aggregation shuffle each; windows ride the post-agg series") {
    for (q <- Seq(graft.operators.Ops.qTsBurnRate, graft.operators.Ops.qTsAlertFor)) {
      val p = plan(q(spark, sf0001))
      assert(!p.toLowerCase.contains("join"), s"no join belongs here:\n$p")
      val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashEx == 1, s"expected one hourly-agg shuffle, got $hashEx:\n$p")
    }
  }

  test("epoch shuffle: TakeOrdered head, zero exchanges, never a global sort") {
    val p = plan(graft.operators.Corpus.qDocsShuffle(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered top-k:\n$p")
    assert(countExchanges(p) == 0, s"head-of-order probe must not shuffle:\n$p")
  }

  test("bm25: the only nested-loop is the 1-row stats broadcast; terms broadcast too") {
    val p = plan(graft.operators.Corpus.qTextBm25(spark, sf0001))
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 1, s"only the single-row stats cross may nest:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"the 2-term dim must broadcast, not sort-merge:\n$p")
  }

  test("xcorr/acf: ONE events scan, ONE aggregation shuffle; lag windows ride the grid") {
    for (q <- Seq(graft.operators.Signal.qTsXcorrLag, graft.operators.Signal.qTsAcf)) {
      val p = plan(q(spark, sf0001))
      assert("FileScan parquet".r.findAllIn(p).length == 1,
        s"the raw series must be scanned once:\n$p")
      assert(!p.toLowerCase.contains("sortmergejoin"),
        s"the grid join must broadcast, not shuffle the series:\n$p")
    }
  }

  test("m4 is a pure hash aggregate: no window, no per-bucket sort") {
    val p = plan(graft.operators.Signal.qTsM4(spark, sf0001))
    assert(!p.contains("Window"), s"min_by/max_by replaces the window form:\n$p")
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected one bucket-agg shuffle, got $hashEx:\n$p")
  }

  test("decay top-k ends in TakeOrdered, never a global sort") {
    val p = plan(graft.operators.Signal.qTsDecayTopk(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered top-k:\n$p")
  }

  test("interval overlap: the merged window set broadcasts; sessions never sort-merge") {
    val p = plan(graft.operators.Signal.qJoinIntervalOverlap(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"range join against the tiny merged set must broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("CartesianProduct"),
      s"no shuffle join / cartesian on the session side:\n$p")
  }

  test("eval metrics: 20-row query side broadcasts onto one candidate scan") {
    val p = plan(graft.operators.Retrieval.qSimEvalMetrics(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), s"query side must broadcast:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"embeddings read at most twice (queries + candidates):\n$p")
  }

  test("paths + attribution ride ONE user-keyed shuffle plus the rollup") {
    for (q <- Seq(graft.operators.Graphs.qGraphPaths, graft.operators.Graphs.qGraphAttribution)) {
      val p = plan(q(spark, sf0001))
      assert(!p.toLowerCase.contains("sortmergejoin"), s"no join belongs here:\n$p")
      val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashEx <= 2, s"user window + rollup only, got $hashEx exchanges:\n$p")
    }
  }

  test("rolling corr: one events scan; all six moments share one window frame") {
    val p = plan(graft.operators.Signal.qTsRollingCorr(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert("Window".r.findAllIn(p).length <= 2, s"moments must share the frame:\n$p")
  }

  test("mad: one scan, one hash-agg shuffle — both percentiles in graft_med_mad") {
    // round 15: the broadcast-dim two-pass shape became ONE custom
    // TypedImperativeAggregate (packed-double buffers; med + mad at eval)
    val p = plan(graft.operators.Signal.qTsMad(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert(!p.toLowerCase.contains("join"), s"no join-back of a median dim:\n$p")
    assert(p.contains("graft_med_mad") && p.contains("ObjectHashAggregate"),
      s"med+mad must ride one object hash aggregate:\n$p")
  }

  test("pit features: one scan; range frame and lag share one user-keyed shuffle") {
    val p = plan(graft.operators.Features.qFeatPit(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert(!p.toLowerCase.contains("join"), s"windows, not a probe join:\n$p")
    val hashEx = "(?i)Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, s"(user,day) agg + user window only, got $hashEx:\n$p")
  }

  test("sliding distinct expands the PRESENCE set, never the raw scan") {
    val p = plan(graft.operators.Features.qTsSlidingDistinct(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert(!p.toLowerCase.contains("join"), s"expansion, not a grid join:\n$p")
    // the Generate (explode) must sit ABOVE the first distinct aggregate
    val gen = p.indexOf("Generate")
    val firstAgg = p.lastIndexOf("HashAggregate")
    assert(gen >= 0 && gen < firstAgg, s"explode must consume pre-distinct presence:\n$p")
  }

  test("dq audit: the referential check anti-joins via broadcast") {
    val p = plan(graft.operators.Features.qDqAudit(spark, sf0001))
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("CartesianProduct"),
      s"dims broadcast in every check:\n$p")
  }

  test("dpp: the runtime hot-day dim becomes a dynamic partition filter on the fact scan") {
    val p = plan(graft.sources.IngestQueries.qIngestDpp(spark, sf0001))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the fact PartitionFilters:\n$p")
  }

  test("sax motif: day stats broadcast back; no shuffle join anywhere") {
    val p = plan(graft.operators.Signal.qTsSaxMotif(spark, sf0001))
    assert(!p.toLowerCase.contains("sortmergejoin"), s"stats dim must broadcast:\n$p")
  }

  test("psi: counts come from one conditional-sum pass, frame joins broadcast") {
    val p = plan(graft.operators.Signal.qTsDriftPsi(spark, sf0001))
    assert(!p.toLowerCase.contains("sortmergejoin"), s"tiny frames must broadcast:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"bucket counts + type dim only:\n$p")
  }

  test("target encode: category moments broadcast back onto one fact scan") {
    val p = plan(graft.operators.Features.qFeatTargetEncode(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"moments dim must broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("ShuffledHashJoin"),
      s"the fact side must never shuffle for a vocabulary-sized dim:\n$p")
  }

  test("periodogram: no join, no window — two hash aggregates around a literal-array explode") {
    val p = plan(graft.operators.Signal.qTsPeriodogram(spark, sf0001))
    assert(!p.toLowerCase.contains("join"), s"basis lookup is a CASE, not a join:\n$p")
    assert(!p.contains("Window"), s"no window function needed:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
  }

  test("slo burn: both alert windows ride ONE global sort of the post-agg hourly series") {
    val p = plan(graft.operators.Promql.qTsSloBurn(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    // hour agg exchange + the single-partition window + final order
    assert("Window".r.findAllIn(p).length == 1,
      s"w6 and w24 frames must share one Window operator:\n$p")
  }

  test("substring dup: big pass is one generator + one exchange; rebuild joins only the bounded winners") {
    // corpus-sized half (r16): the doc_grams generator pre-rolls the
    // (gh, doc) level per document, so the big pass has NO join and
    // exactly ONE exchange — the (gh) aggregate
    val big = plan(graft.operators.Corpus.substringDupLvl2(
      graft.Tables.documents(spark, sf0001)))
    assert(!"(?i)(sortmergejoin|hashjoin|nestedloopjoin|cartesianproduct)".r.findFirstIn(big).isDefined,
      s"no join in the corpus-sized pass:\n$big")
    assert(big.contains("graft_doc_grams"), s"the native generator must drive it:\n$big")
    assert("FileScan parquet".r.findAllIn(big).length == 1, s"one corpus scan:\n$big")
    assert("(?i)Exchange hashpartitioning".r.findAllIn(big).length == 1,
      s"the (gh) aggregate is the only exchange:\n$big")
    // returned plan = the text-recovery rebuild: the doc_id winner filter
    // must push into the scan, the winner join must broadcast, and
    // nothing may sort-merge or go cartesian
    val p = plan(graft.operators.Corpus.qTextSubstringDup(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length <= 1, s"at most one rebuild scan:\n$p")
    if (p.contains("FileScan")) {
      assert("PushedFilters: \\[[^\\]]*In\\(doc_id".r.findFirstIn(p).isDefined ||
        p.contains("doc_id#") && p.contains("INSET"),
        s"the winner doc filter must reach the scan:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"winner counts must broadcast:\n$p")
    }
    assert(!"(?i)(sortmergejoin|nestedloopjoin|cartesianproduct)".r.findFirstIn(p).isDefined,
      s"no sort-merge / cartesian in the rebuild:\n$p")
  }

  test("keyset pagination: cursor predicate reaches the scan, sort+limit is TakeOrdered") {
    val p = plan(graft.operators.Relational.qPageKeyset(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"ORDER+LIMIT must not be a global sort:\n$p")
    assert("PushedFilters: \\[[^\\]]*ts".r.findFirstIn(p).isDefined ||
      p.contains("DataFilters: [((ts"),
      s"the cursor inequality must reach the scan:\n$p")
  }

  test("rfm: quintiles ride the collapsed users table; scoring is join-free") {
    // Since the round-15 cut-key Rank.withNtiles rewrite each quintile
    // dimension contributes only 4 boundary-key literals, and the outer
    // plan is the cached users rollup + three map-side CASE columns +
    // one segment aggregate: no parquet scan (the one raw-events scan
    // lives inside the cached rollup), NO join of any kind, and no
    // cartesian. Any join appearing here means a join-back crept back in.
    val df = graft.operators.Analytics.qRfmSegments(spark, sf0001)
    val outerScans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(outerScans.isEmpty, s"outer plan must read the cached rollup, not parquet")
    val p = plan(df)
    assert(!"(?i)cartesianproduct".r.findFirstIn(p).isDefined, s"no cartesian:\n$p")
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"cut-key scoring must be join-free:\n$p")
  }

  test("rrf fusion: the query block broadcasts; rank windows partition by query") {
    val p = plan(graft.operators.Retrieval.qSimRrfFusion(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"20-row query side must broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("CartesianProduct"),
      s"no shuffled pair materialization:\n$p")
  }

  test("winsorize: the per-type fence table broadcasts back onto the fact scan") {
    val p = plan(graft.operators.Sre.qTsWinsorize(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"fences must broadcast:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffled join for a <=types-row dim:\n$p")
  }

  test("bollinger: one raw-scan aggregate; the rolling window rides the (type x hour) panel") {
    val p = plan(graft.operators.Sre.qTsBollinger(spark, sf0001))
    // events scanned twice by design (type dim + hourly agg), both collapse
    // before the window; the 24h moments must NOT window the raw scan
    assert(p.contains("Window"), s"rolling frame expected:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"grid join must broadcast, not shuffle:\n$p")
  }

  test("assoc rules: singles and the user-count dim broadcast onto the pair aggregate") {
    val p = plan(graft.operators.Analytics.qAssocRules(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"both single-count dims must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row user count must broadcast:\n$p")
  }

  test("mode: one scan, pair aggregate, rank window inside the user shuffle — no join") {
    val p = plan(graft.operators.Analytics.qAggMode(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert(!"(?i)(sortmergejoin|hashjoin|nestedloopjoin|cartesianproduct)".r.findFirstIn(p).isDefined,
      s"no join anywhere:\n$p")
  }

  test("range frame: one shuffle on event_type carries the RANGE window; no join, no grid") {
    val p = plan(graft.operators.TimeSeries.qTsRangeFrame(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1, s"one scan expected:\n$p")
    assert(!"(?i)(sortmergejoin|hashjoin|nestedloopjoin|cartesianproduct)".r.findFirstIn(p).isDefined,
      s"no join anywhere:\n$p")
    // type-partition exchange + the final event_id order exchange
    assert(countExchanges(p) <= 2, s"too many exchanges:\n$p")
  }

  test("session hours: the generator fans out map-side (Generate node, no extra exchange)") {
    val p = plan(graft.operators.TimeSeries.qTsSessionHours(spark, sf0001))
    assert(p.contains("Generate"), s"TimeSlices must plan as a Generate node:\n$p")
    // user window exchange + (user,sid) agg + slice agg + final order; the
    // explosion itself must not add an exchange
    assert(countExchanges(p) <= 4, s"too many exchanges:\n$p")
  }

  test("item cooc: basket pairs generate in-row, no presence self-join, top-k stays an aggregate") {
    val p = plan(graft.operators.Analytics.qItemCoocTopk(spark, sf0001))
    // the i<j pairs come from the per-order basket array — any join of
    // scan-sized tables means the self-join formulation leaked back
    // (the ni broadcast joins live behind the scored localCheckpoint,
    // so the final plan must contain NO join at all)
    assert(!"(?i)(sortmergejoin|shuffledhashjoin|cartesianproduct|nestedloop)".r
      .findFirstIn(p).isDefined, s"pairs must come from the basket array:\n$p")
    // the top-3 cut is the graft_topk aggregate: no Window node may
    // sort the symmetric pair fan-out
    assert(!p.contains("Window"), s"top-k must be an aggregate, not a window sort:\n$p")
  }

  test("root cause: the checkpointed cube feeds every rollup — no raw re-scan per dimension") {
    val p = plan(graft.operators.Sre.qSreRootCause(spark, sf0001))
    // the raw pass materializes ONCE into the localCheckpoint; a parquet
    // scan in the final plan means a rollup branch re-planned the raw pass
    assert(!p.contains("FileScan parquet"), s"rollups must read the pinned cube:\n$p")
    assert(!"(?i)(sortmergejoin|cartesianproduct)".r.findFirstIn(p).isDefined,
      s"rollups must rejoin broadcast-side only:\n$p")
  }

  test("bootstrap: the 32x replicate fan-out is a Generate feeding one hash aggregate, no join") {
    val p = plan(graft.operators.Stats.qStatBootstrapCi(spark, sf0001))
    assert(p.contains("Generate"), s"replicate fan-out must be a Generate:\n$p")
    assert(!"(?i)(sortmergejoin|shuffledhashjoin|cartesianproduct)".r.findFirstIn(p).isDefined,
      s"no non-broadcast join anywhere:\n$p")
  }

  test("geo bbox join: grid cells make it a BroadcastHashJoin, never a nested loop") {
    val p = plan(graft.operators.Geo.qGeoBboxJoin(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"expected cell-id BroadcastHashJoin:\n$p")
    assert(!"(?i)(nestedloop|cartesianproduct|sortmergejoin)".r.findFirstIn(p).isDefined,
      s"the quadratic BETWEEN formulation leaked through:\n$p")
  }

  test("geo nearest hub: argmin is a hash aggregate (map-side combine), not a window over the fan-out") {
    val p = plan(graft.operators.Geo.qGeoNearestHub(spark, sf0001))
    assert(!p.contains("Window"), s"argmin must not window-sort the 25x fan-out:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 25-row hub dim must broadcast under the cross join:\n$p")
  }

}
