package graft.sources

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** The write path: layout-aware ingestion that makes the scale story real.
  *
  * VERDICT r01 ("what's missing" #5): the engine documented "persist the
  * LSH bucket as a partition column so probes prune at the source" but
  * never wrote anything. This module is that piece:
  *
  *  - `eventsByDay` — the TSDB ingest layout: events partitioned by event
  *    day. Time-range queries then prune whole partition directories at
  *    planning time (`PartitionFilters` in the scan, verified in
  *    WritePathSpec) — at 100 TB a one-week query reads 7/365ths of the
  *    data before a single row is decoded.
  *  - `embeddingsByBucket` — the ANN ingest layout: embeddings partitioned
  *    by SRP-LSH bucket. A probe computes its bucket driver-side (same
  *    arithmetic as the `srpBucket` expression) and the scan prunes to ONE
  *    directory: probing cost is corpus/2^planes I/O, not a full scan.
  *  - `writeBucketed` — hash-bucketed tables (`bucketBy` + `saveAsTable`)
  *    for co-located joins: two tables bucketed on the join key by the
  *    same bucket count join with NO shuffle on either side (no Exchange
  *    in the plan, verified in WritePathSpec).
  *
  * Small-files discipline: each writer `repartition`s by the partition
  * column first, so every partition directory gets one file per shuffle
  * task that owns the key — at local scale exactly one file per
  * directory. At cluster scale add a salt to the repartition (e.g.
  * `repartition(n, col, salt)`) to split hot partitions across writers
  * without changing the layout contract.
  *
  * Writes are memoized per (JVM, dataset, scale dir): ingest is a
  * once-per-corpus cost, queries only ever pay the pruned read — the same
  * contract as the cached tables and the prebuilt IVF index in Bench.
  */
object Ingest {

  /** Root for locally materialized layouts (harness-safe scratch space). */
  def defaultRoot: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_ingest"

  private val materialized = TrieMap.empty[String, String]

  private def slug(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  // ---- events by day ------------------------------------------------------

  /** Write `events` partitioned by event day (the TSDB layout). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  /** Materialize (once per JVM) the by-day layout for a scale dir; returns
    * the dataset path. */
  def eventsByDay(spark: SparkSession, sfDir: String, root: String = defaultRoot): String = {
    val p = materialized.getOrElseUpdate(s"events_by_day:$sfDir:$root", {
      val path = s"$root/${slug(sfDir)}/events_by_day"
      writeEventsByDay(Tables.events(spark, sfDir), path)
      path
    })
    // The writer guarantees day == to_date(ts) for this layout; mark it so
    // DerivedPartitionFilters may derive day bounds from ts predicates.
    graft.plans.DerivedPartitionFilters.registerPath(spark, p)
    p
  }

  /** Read the by-day layout. `day` comes back as a DATE partition column;
    * filters on it prune directories at planning time. */
  def readEventsByDay(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---- per-day bloom index (sketch-as-partition-index) --------------------

  /** Build (once per JVM) the per-day Bloom index over `event_id` for the
    * by-day layout: one row per day — (day, serialized graft_bloom). This
    * is the sketch-index half of the TSDB ingest story: the same
    * single-shuffle mergeable aggregate that serves the runtime-filter
    * join, stored next to the layout as a partition-level index (what
    * parquet/Iceberg column bloom filters do, lifted to the layout level
    * where the PLANNER can use it to skip whole directories). */
  def eventsDayBloomIndex(spark: SparkSession, sfDir: String,
                          numBits: Int = 65536, numHashes: Int = 6,
                          root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_day_bloom:$sfDir:$numBits:$numHashes:$root", {
      val p = s"$root/${slug(sfDir)}/events_day_bloom"
      graft.functions.GraftFunctions.register(spark)
      readEventsByDay(spark, eventsByDay(spark, sfDir, root))
        .groupBy("day")
        .agg(call_function("graft_bloom",
          col("event_id"), lit(numBits), lit(numHashes)).as("bloom"))
        .coalesce(1) // one row per day; the whole index is days × numBits/8 bytes
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Point lookups through the bloom index: read the index (a driver-side
    * collect of days × numBits/8 bytes — 30 rows here, 365/year at 100 TB;
    * bounded by design like the IVF centroid pull), keep the days whose
    * bloom MIGHT contain one of the probed ids, scan ONLY those partition
    * directories, and apply the exact id filter (removing bloom false
    * positives). The result is exact; the I/O is candidate-days/all-days
    * of the corpus — for unique ids that is ≈ |ids| directories, the
    * needle-in-haystack read a raw scan can never give you. */
  def eventsByIdPruned(spark: SparkSession, sfDir: String, eventIds: Seq[Long],
                       root: String = defaultRoot): DataFrame = {
    val layout = eventsByDay(spark, sfDir, root)
    val idxPath = eventsDayBloomIndex(spark, sfDir, root = root)
    val candidateDays = spark.read.parquet(idxPath).select("day", "bloom").collect()
      .filter { r =>
        val sk = graft.functions.BloomSketch.deserialize(r.getAs[Array[Byte]]("bloom"))
        eventIds.exists(sk.mightContainLong)
      }
      .map(_.getDate(0))
    readEventsByDay(spark, layout)
      .filter(col("day").isin(candidateDays.toSeq: _*) &&
        col("event_id").isin(eventIds: _*))
  }

  // ---- continuous aggregate (rollup + raw tail) ---------------------------

  /** Materialize (once per JVM) the hourly CONTINUOUS-AGGREGATE rollup of
    * events strictly before `cutoffDay`: one row per (hour, event_type)
    * with (cnt, sv8 = 8-dp-rounded hourly sum). This is the
    * TimescaleDB-continuous-aggregate / Druid-rollup ingest pattern: the
    * closed past is folded into a tiny summary table at ingest time (in
    * production the streaming job appends each day's rows as its watermark
    * closes); queries then never re-scan closed raw history. The rollup
    * for a 100 TB/year feed is hours × types rows — 10⁵ rows per 10¹³. */
  def eventsHourlyRollup(spark: SparkSession, sfDir: String,
                         cutoffDay: String = "2024-01-26",
                         root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_hourly_rollup:$sfDir:$cutoffDay:$root", {
      val p = s"$root/${slug(sfDir)}/events_hourly_rollup_$cutoffDay"
      readEventsByDay(spark, eventsByDay(spark, sfDir, root))
        .filter(col("day") < lit(cutoffDay).cast("date")) // partition-pruned
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          graft.operators.Num.roundd(sum("value"), 8).as("sv8"))
        .coalesce(1) // hours × types rows — one small summary file
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Serve the full-range daily aggregate from rollup + raw tail: hourly
    * partials for days < cutoff come from the STORED rollup (a summary-file
    * read), the open tail ≥ cutoff is aggregated on the fly from the by-day
    * layout under a partition filter (tail directories only — asserted in
    * WritePathSpec). Union of partials → one hash aggregate to day grain.
    * Both engines merge identical 8-dp hourly partials, so the day-level
    * re-round is cross-engine stable (same two-level scheme as
    * q_ts_rollup_time). At 100 TB the query reads the summary table plus
    * only the open days of raw — the whole point of a continuous agg. */
  def caggDailyServe(spark: SparkSession, sfDir: String,
                     cutoffDay: String = "2024-01-26",
                     root: String = defaultRoot): DataFrame = {
    import graft.operators.Num
    val rollup = spark.read.parquet(eventsHourlyRollup(spark, sfDir, cutoffDay, root))
    val tail = readEventsByDay(spark, eventsByDay(spark, sfDir, root))
      .filter(col("day") >= lit(cutoffDay).cast("date")) // partition-pruned
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Num.roundd(sum("value"), 8).as("sv8"))
    caggDailyMerge(rollup, tail)
  }

  /** The serve-side merge, rollup-source-agnostic: any (h, event_type,
    * cnt, sv8) hourly-partial set — the batch-materialized rollup OR the
    * rows a streaming hourlyRollupStream emitted as windows closed
    * (StreamParitySpec holds the streaming-fed serve equal to direct
    * batch aggregation) — unions with the open tail's partials and
    * re-aggregates to day grain under the two-level rounding scheme. */
  def caggDailyMerge(rollup: DataFrame, tail: DataFrame): DataFrame = {
    import graft.operators.Num
    rollup.select("h", "event_type", "cnt", "sv8")
      .unionByName(tail.select("h", "event_type", "cnt", "sv8"))
      .groupBy(date_trunc("day", col("h")).cast("date").as("dday"), col("event_type"))
      .agg(sum("cnt").as("cnt"),
        Num.roundd(Num.roundd(sum("sv8"), 8), 2).as("sv"))
      .orderBy("dday", "event_type")
  }

  // ---- text-format ingestion (JSON / CSV feeds) ----------------------------

  /** Materialize (once per JVM) the events table as JSON-lines and CSV —
    * the wire formats a TSDB's HTTP/collector ingest actually receives —
    * then read them back with EXPLICIT schemas (never inference: one bad
    * row must fail loudly, not silently retype a column at 100 TB).
    * Timestamps round-trip at µs precision through ISO-8601 strings.
    * Returns (jsonPath, csvPath). */
  def eventsTextFormats(spark: SparkSession, sfDir: String,
                        root: String = defaultRoot): (String, String) = {
    val key = s"events_textfmt:$sfDir:$root"
    val p = materialized.getOrElseUpdate(key, {
      val base = s"$root/${slug(sfDir)}/events_text"
      val ev = Tables.events(spark, sfDir)
        .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      ev.coalesce(4).write.mode("overwrite").json(s"$base/json")
      ev.coalesce(4).write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      base
    })
    (s"$p/json", s"$p/csv")
  }

  private val eventsTextSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** Read the JSON-lines feed back under the explicit schema. */
  def readEventsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsTextSchema).json(path)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  /** Read the CSV feed back under the explicit schema. */
  def readEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsTextSchema).option("header", "true").csv(path)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  // ---- retention + compaction (layout maintenance) -------------------------

  /** Apply a retention policy to a COPY of the by-day layout: partition
    * directories older than `keepFromDay` are dropped as pure metadata/file
    * operations — no row is ever read or rewritten, which is why TSDB
    * retention is partition-drop and never DELETE. Materialized once per
    * JVM; returns the retained dataset path. */
  def eventsWithRetention(spark: SparkSession, sfDir: String,
                          keepFromDay: String = "2024-01-08",
                          root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_retention:$sfDir:$keepFromDay:$root", {
      val src = new java.io.File(eventsByDay(spark, sfDir, root))
      val dst = new java.io.File(s"$root/${slug(sfDir)}/events_retained_$keepFromDay")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      // a leftover copy from an earlier JVM would MERGE (filenames differ
      // per write) and double the data — start from nothing
      if (dst.exists) rm(dst)
      def copy(f: java.io.File, t: java.io.File): Unit = {
        if (f.isDirectory) { t.mkdirs(); f.listFiles.foreach(c => copy(c, new java.io.File(t, c.getName))) }
        else java.nio.file.Files.copy(f.toPath, t.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      copy(src, dst)
      val cutoff = java.time.LocalDate.parse(keepFromDay)
      dst.listFiles.filter { f =>
        f.isDirectory && f.getName.startsWith("day=") &&
          java.time.LocalDate.parse(f.getName.stripPrefix("day=")).isBefore(cutoff)
      }.foreach { dir =>
        dir.listFiles.foreach(_.delete()); dir.delete() // the partition DROP
      }
      dst.getPath
    })

  /** A deliberately FRAGMENTED by-day layout — what a streaming ingest
    * actually produces: one file per (microbatch, partition), here
    * simulated by hash-splitting each day across 8 writer tasks. The
    * input fixture for compaction. */
  def eventsFragmented(spark: SparkSession, sfDir: String,
                       root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_fragmented:$sfDir:$root", {
      val p = s"$root/${slug(sfDir)}/events_fragmented"
      Tables.events(spark, sfDir)
        .withColumn("day", to_date(col("ts")))
        // explicit count: AQE must not coalesce the salted shuffle back to
        // one task per day (that would silently write a compact layout)
        .repartition(64, col("day"), pmod(col("event_id"), lit(8))) // ~8 files/dir
        .write.mode("overwrite").partitionBy("day").parquet(p)
      p
    })

  /** Compact the fragmented layout into one file per partition directory
    * (a rewrite into a NEW dataset; the source is untouched): the nightly
    * small-files merge every streaming-ingest TSDB runs — file-per-
    * microbatch write amplification is repaid once, then every later scan
    * opens one footer per partition instead of hundreds. Rows rewrite
    * verbatim, asserted by the oracle-backed round-trip query and the
    * file-count assertions in WritePathSpec. */
  def eventsCompacted(spark: SparkSession, sfDir: String,
                      root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_compacted:$sfDir:$root", {
      val p = s"$root/${slug(sfDir)}/events_compacted"
      spark.read.parquet(eventsFragmented(spark, sfDir, root))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(p)
      p
    })

  // ---- events by z-order prefix (multi-dimensional pruning) ----------------

  /** Bits per z-order dimension: 5 → a 10-bit z-value, partitioned on its
    * top `zPrefixBits` bits. 30 day cells × 32 value cells at local scale;
    * at 100 TB the same curve with wider bits and finer prefixes. */
  val zBits = 5
  val zPrefixBits = 4

  /** Interleave two `zBits`-bit cells (a = even/high bits, b = odd) —
    * the Morton/Z curve. Pure integer function, same on driver and in the
    * generated column expression. */
  def zInterleave(a: Int, b: Int): Int = {
    var z = 0
    var i = 0
    while (i < zBits) {
      z |= ((a >> i) & 1) << (2 * i + 1)
      z |= ((b >> i) & 1) << (2 * i)
      i += 1
    }
    z
  }

  /** day cell: days since 2024-01-01; value cell: floor(value / 100 · 32)
    * clamped to [0, 31] (value lives in [0, 100)). */
  private def zCellExprs = (
    expr("datediff(to_date(ts), DATE '2024-01-01')").cast("int"),
    expr("least(31, greatest(0, cast(floor(value / 3.125) as int)))"))

  /** Write `events` partitioned by the top `zPrefixBits` bits of the
    * z-interleave of (day cell, value cell) — the MULTI-dimensional
    * layout: a query box on BOTH time and value prunes directories, where
    * the by-day layout can prune on time only. This is what Z-ORDER
    * clustering does in lakehouse table formats, expressed as a plain
    * partition column so the stock planner prunes it. */
  def writeEventsZordered(events: DataFrame, path: String): Unit = {
    val (dayCell, valCell) = zCellExprs
    // the z-value of the full cells, built by the same bit algebra as
    // zInterleave, as a codegen'd integer expression
    val zCol = (0 until zBits).foldLeft(lit(0)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(dayCell, i).bitwiseAND(lit(1)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(valCell, i).bitwiseAND(lit(1)), 2 * i))
    }
    events
      .withColumn("zp", shiftright(zCol.cast("int"), 2 * zBits - zPrefixBits))
      .repartition(col("zp"))
      .write.mode("overwrite").partitionBy("zp").parquet(path)
  }

  /** Materialize (once per JVM) the z-ordered layout for a scale dir. */
  def eventsZordered(spark: SparkSession, sfDir: String, root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_zorder:$sfDir:$root", {
      val p = s"$root/${slug(sfDir)}/events_zorder"
      writeEventsZordered(Tables.events(spark, sfDir), p)
      p
    })

  /** The z-prefix partitions a (day, value) query box can touch: walk all
    * cell pairs in the box (≤ 2^(2·zBits) = 1024 — driver-side, O(1) in
    * data size) and collect their prefixes. Exact, no false dismissals;
    * the residual filter inside the scan removes box-external rows that
    * share a touched prefix. */
  def zPrefixesFor(dayLo: Int, dayHi: Int, cellLo: Int, cellHi: Int): Seq[Int] =
    (for {
      d <- dayLo to dayHi
      v <- cellLo to cellHi
    } yield zInterleave(d, v) >> (2 * zBits - zPrefixBits)).distinct.sorted

  /** Time+value box query over the z-ordered layout: the zp IN (...)
    * partition filter prunes directories on BOTH dimensions at planning
    * time (WritePathSpec asserts the listing), the exact predicates
    * remove the curve's false positives inside the pruned scan. */
  def eventsZboxQuery(spark: SparkSession, sfDir: String,
                      dayLo: String, dayHi: String,
                      valLo: Double, valHi: Double,
                      root: String = defaultRoot): DataFrame = {
    val path = eventsZordered(spark, sfDir, root)
    val d0 = java.time.LocalDate.parse(dayLo).toEpochDay - java.time.LocalDate.parse("2024-01-01").toEpochDay
    val d1 = java.time.LocalDate.parse(dayHi).toEpochDay - java.time.LocalDate.parse("2024-01-01").toEpochDay
    val c0 = math.min(31, math.max(0, math.floor(valLo / 3.125).toInt))
    val c1 = math.min(31, math.max(0, math.floor(valHi / 3.125).toInt))
    val zps = zPrefixesFor(d0.toInt, d1.toInt, c0, c1)
    spark.read.parquet(path)
      .filter(col("zp").isin(zps: _*) &&
        to_date(col("ts")).between(lit(dayLo).cast("date"), lit(dayHi).cast("date")) &&
        col("value") >= valLo && col("value") < valHi)
  }

  // ---- embeddings by LSH bucket -------------------------------------------

  /** Write `embeddings` partitioned by SRP-LSH bucket (the ANN layout). */
  def writeEmbeddingsByBucket(emb: DataFrame, path: String,
                              nPlanes: Int = 6, dim: Int = 64): Unit =
    emb
      .withColumn("bucket", Similarity.srpBucket("embedding", nPlanes, dim))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Materialize (once per JVM) the by-bucket layout for a scale dir. */
  def embeddingsByBucket(spark: SparkSession, sfDir: String,
                         nPlanes: Int = 6, dim: Int = 64,
                         root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"emb_by_bucket:$sfDir:$nPlanes:$dim:$root", {
      val p = s"$root/${slug(sfDir)}/embeddings_by_bucket_$nPlanes"
      writeEmbeddingsByBucket(Tables.embeddings(spark, sfDir), p, nPlanes, dim)
      p
    })

  /** Driver-side twin of the `srpBucket` expression: same md5-derived
    * plane matrix, same left-to-right double accumulation, same strict
    * `dot > 0` sign rule — a vector lands in the same bucket whether
    * bucketed here or by the codegen'd column (asserted in WritePathSpec). */
  def srpBucketOf(vec: Array[Double], nPlanes: Int, dim: Int = 64): Int = {
    require(vec.length == dim,
      s"graft srpBucketOf: vector length ${vec.length} != dim $dim")
    val planes = Similarity.srpPlanes(nPlanes, dim)
    planes.zipWithIndex.foldLeft(0) { case (acc, (plane, h)) =>
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += vec(i) * plane(i); i += 1 }
      if (dot > 0) acc | (1 << h) else acc
    }
  }

  /** ANN top-k against the by-bucket layout: the probe's bucket is computed
    * driver-side and the scan reads ONLY that partition directory (source
    * pruning — `PartitionFilters: [bucket = b]`, one dir in `inputFiles`).
    * Exact codegen'd cosine inside the bucket; same results as the
    * unpartitioned `Similarity.annTopK` for the same planes. */
  def annTopKPruned(spark: SparkSession, path: String, probeVec: Array[Double],
                    excludeId: Long, k: Int, nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val b = srpBucketOf(probeVec, nPlanes, dim)
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(path)
      .filter(col("bucket") === b && col("vec_id") =!= excludeId)
      .withColumn("__probe", typedlit(probeVec.map(_.toFloat).toSeq))
      .withColumn("sim", expr("graft_cosine(embedding, __probe)"))
      .select(col("vec_id"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batch multiprobe ANN over the by-bucket layout — the production
    * serving shape: N probes answered in ONE plan against the pruned
    * scan. Each probe searches its own bucket plus every hamming-1
    * neighbor (one flipped hyperplane sign — the buckets most likely to
    * hold near-misses), so recall rises from single-bucket LSH while the
    * scan still reads only the probed partition directories:
    * `bucket IN (...)` is a partition filter, I/O is
    * probes × (nPlanes+1) / 2^nPlanes of the corpus, not a full scan
    * (WritePathSpec asserts the pruning). The tiny exploded probe set
    * broadcasts; exact codegen'd cosine ranks within the probed buckets
    * on the ROUNDED sim with vec_id tiebreak — a total order both
    * engines share, so the entry is oracle-backed end-to-end. */
  def annBatchPruned(spark: SparkSession, path: String,
                     probes: Seq[(Long, Array[Double])], k: Int,
                     nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val probeRows = probes.flatMap { case (id, v) =>
      val b = srpBucketOf(v, nPlanes, dim)
      (b +: (0 until nPlanes).map(h => b ^ (1 << h)))
        .map(bb => (id, v.map(_.toFloat).toSeq, bb))
    }
    val buckets = probeRows.map(_._3).distinct.sorted
    val pdf = spark.createDataFrame(probeRows).toDF("probe_id", "pv", "bucket")
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id").asc)
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(pdf), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim",
        graft.operators.Num.roundd(expr("graft_cosine(embedding, pv)"), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("probe_id", "rnk", "vec_id", "sim")
      .orderBy("probe_id", "rnk")
  }

  // ---- row-level delete (GDPR / right-to-be-forgotten) ---------------------

  /** Outcome of a copy-on-write delete: how much of the layout was touched.
    * `filesRewritten / filesTotal` is the 100 TB cost story — a delete of
    * |ids| rows rewrites at most |ids| files, never the corpus. */
  case class DeleteStats(filesTotal: Int, filesRewritten: Int, rowsDeleted: Long)

  private def bloomIdxPath(path: String): String = path.stripSuffix("/") + "_bloomidx"

  /** Write `df` as an `nFiles` hash-split corpus plus a per-FILE Bloom
    * index over `idCol` — the same sketch-as-index pattern as the by-day
    * bloom index, at file grain: the index is what lets a row-level delete
    * find the files holding a doc without scanning the corpus. */
  def writeCorpusWithIndex(df: DataFrame, idCol: String, path: String,
                           nFiles: Int = 8, numBits: Int = 65536, numHashes: Int = 6): Unit = {
    df.repartition(nFiles, col(idCol)).write.mode("overwrite").parquet(path)
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.sparkSession.read.parquet(path)
      .select(col(idCol), col("_metadata.file_path").as("file"))
      .groupBy("file")
      .agg(call_function("graft_bloom", col(idCol), lit(numBits), lit(numHashes)).as("bloom"))
      .coalesce(1) // nFiles rows × numBits/8 bytes — a footer-sized index
      .write.mode("overwrite").parquet(bloomIdxPath(path))
  }

  /** Row-level DELETE as copy-on-write (the GDPR / right-to-be-forgotten
    * path — VERDICT r6 missing #2). Retention drops whole partitions;
    * this deletes individual ids:
    *
    *  1. consult the per-file Bloom index (a driver-side collect of
    *     nFiles rows — bounded like the IVF centroid pull) for the files
    *     that MIGHT contain a target id;
    *  2. rewrite ONLY those files with the ids anti-filtered out (bloom
    *     false positives cost a no-op rewrite, never a wrong result);
    *  3. swap the rewritten files in and update the index incrementally —
    *     untouched files keep their bytes AND their index rows.
    *
    * At 100 TB: I/O is |affected files|, i.e. ≈ |ids| of the ~corpus/nFiles
    * file size, not a corpus rewrite. Idempotent: deleting absent ids
    * rewrites nothing (second call returns rowsDeleted = 0). */
  def deleteRows(spark: SparkSession, path: String, idCol: String, ids: Seq[Long],
                 numBits: Int = 65536, numHashes: Int = 6): DeleteStats = {
    val idx = spark.read.parquet(bloomIdxPath(path)).select("file", "bloom").collect()
    val cand = idx.filter { r =>
      val sk = graft.functions.BloomSketch.deserialize(r.getAs[Array[Byte]]("bloom"))
      ids.exists(sk.mightContainLong)
    }.map(_.getString(0))
    if (cand.isEmpty) return DeleteStats(idx.length, 0, 0L)
    val candDf = spark.read.parquet(cand.toSeq: _*)
    val keepDf = candDf.filter(!col(idCol).isin(ids: _*))
    val rowsBefore = candDf.count()
    val rowsAfter = keepDf.count()
    if (rowsAfter == rowsBefore) return DeleteStats(idx.length, 0, 0L) // pure false positives
    val tmp = path.stripSuffix("/") + "_rewrite_tmp"
    keepDf.write.mode("overwrite").parquet(tmp)
    def fileOf(u: String) = new java.io.File(new java.net.URI(u).getPath)
    cand.foreach(u => fileOf(u).delete())
    val dir = new java.io.File(path)
    // job-unique part-file names cannot collide with the survivors
    new java.io.File(tmp).listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.move(f.toPath, new java.io.File(dir, f.getName).toPath)
    }
    new java.io.File(tmp).listFiles.foreach(_.delete())
    new java.io.File(tmp).delete()
    // incremental index maintenance: untouched rows survive verbatim, the
    // adopted files get fresh blooms (which no longer contain the ids)
    val keepRows = idx.filterNot(r => cand.contains(r.getString(0)))
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("bloom")))
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val newRows = spark.read.parquet(path)
      .select(col(idCol), col("_metadata.file_path").as("file"))
      .filter(!col("file").isin(keepRows.map(_._1).toSeq: _*))
      .groupBy("file")
      .agg(call_function("graft_bloom", col(idCol), lit(numBits), lit(numHashes)).as("bloom"))
      .as[(String, Array[Byte])].collect()
    (keepRows ++ newRows).toSeq.toDF("file", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(bloomIdxPath(path))
    DeleteStats(idx.length, cand.length, rowsBefore - rowsAfter)
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmTree)
    f.delete()
  }

  private def copyTree(f: java.io.File, t: java.io.File): Unit = {
    if (f.isDirectory) { t.mkdirs(); f.listFiles.foreach(c => copyTree(c, new java.io.File(t, c.getName))) }
    else java.nio.file.Files.copy(f.toPath, t.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The user whose events the TSDB GDPR fixture forgets. */
  val gdprUserIds: Seq[Long] = Seq(7L)

  /** GDPR for the PARTITIONED layout: erase `userIds`' events from a copy
    * of the by-day dataset, rewriting only the day DIRECTORIES whose
    * per-day bloom over user_id might contain one of them — partition-
    * granular copy-on-write, the companion of the file-granular
    * deleteRows for flat corpora. A day the user never touched keeps its
    * bytes (at 100 TB a short-lived user's forget request rewrites days,
    * not years; the synthetic fixture's users are active almost daily, so
    * the pruning there is thin — the mechanism, not the fixture, is the
    * contract). Returns the retained dataset path; memoized per JVM. */
  def eventsGdprDeleted(spark: SparkSession, sfDir: String,
                        root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_gdpr:$sfDir:$root", {
      val src = new java.io.File(eventsByDay(spark, sfDir, root))
      val dst = new java.io.File(s"$root/${slug(sfDir)}/events_gdpr")
      if (dst.exists) rmTree(dst)
      copyTree(src, dst)
      deleteUserEventsInPlace(spark, dst.getPath, gdprUserIds)
      dst.getPath
    })

  /** The rewrite step: per-day user blooms → candidate day dirs → each
    * candidate rewritten with the users anti-filtered. Returns stats with
    * filesTotal/filesRewritten counted in DAY PARTITIONS. */
  def deleteUserEventsInPlace(spark: SparkSession, layoutPath: String, userIds: Seq[Long],
                              numBits: Int = 65536, numHashes: Int = 6): DeleteStats = {
    graft.functions.GraftFunctions.register(spark)
    val idx = spark.read.parquet(layoutPath)
      .groupBy("day")
      .agg(call_function("graft_bloom", col("user_id"), lit(numBits), lit(numHashes)).as("bloom"))
      .collect()
    val cand = idx.filter { r =>
      val sk = graft.functions.BloomSketch.deserialize(r.getAs[Array[Byte]]("bloom"))
      userIds.exists(sk.mightContainLong)
    }.map(_.getDate(0).toString)
    var removed = 0L
    cand.foreach { day =>
      val dayDir = new java.io.File(layoutPath, s"day=$day")
      val before = spark.read.parquet(dayDir.getPath)
      val kept = before.filter(!col("user_id").isin(userIds: _*))
      removed += before.count() - kept.count()
      val tmp = new java.io.File(layoutPath, s"_rewrite_day_$day")
      kept.write.mode("overwrite").parquet(tmp.getPath)
      rmTree(dayDir)
      dayDir.mkdirs()
      tmp.listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath, new java.io.File(dayDir, f.getName).toPath)
      }
      rmTree(tmp)
    }
    DeleteStats(idx.length, cand.length, removed)
  }

  /** Late-correction UPSERT for the PARTITIONED layout (the TSDB backfill
    * path: a collector re-sends fixed readings after the fact). Each
    * correction row carries its event time, so the affected day
    * directories come straight from the batch — no index needed; only
    * those directories rewrite, with stale versions of the corrected
    * event_ids replaced by the new rows. Day-granular copy-on-write,
    * the events-table sibling of upsertRows. */
  def upsertEventsInPlace(spark: SparkSession, layoutPath: String,
                          corrections: DataFrame): DeleteStats = {
    val corr = corrections.withColumn("__day", to_date(col("ts"))).cache()
    val days = corr.select("__day").distinct().collect().map(_.getDate(0).toString)
    val allDays = new java.io.File(layoutPath).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    var replaced = 0L
    days.foreach { day =>
      val dayDir = new java.io.File(layoutPath, s"day=$day")
      require(dayDir.isDirectory, s"graft upsertEventsInPlace: no partition for day=$day")
      val dayCorr = corr.filter(col("__day") === lit(day).cast("date")).drop("__day")
      val ids = dayCorr.select("event_id").collect().map(_.getLong(0)).toSeq
      val before = spark.read.parquet(dayDir.getPath)
      val kept = before.filter(!col("event_id").isin(ids: _*))
      replaced += before.count() - kept.count()
      val merged = kept.unionByName(dayCorr.select(before.columns.map(col): _*))
      val tmp = new java.io.File(layoutPath, s"_rewrite_day_$day")
      merged.write.mode("overwrite").parquet(tmp.getPath)
      rmTree(dayDir)
      dayDir.mkdirs()
      tmp.listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath, new java.io.File(dayDir, f.getName).toPath)
      }
      rmTree(tmp)
    }
    corr.unpersist(blocking = false)
    DeleteStats(allDays, days.length, replaced)
  }

  /** The event_ids the correction fixture re-sends with value 999.5. */
  val correctionIds: Seq[Long] = Seq(5L, 17L, 23L)

  /** Materialize (once per JVM) the correction fixture: a copy of the
    * by-day layout with `correctionIds`' readings re-sent at value 999.5
    * (same envelope, fixed measurement). Returns the layout path. */
  def eventsCorrected(spark: SparkSession, sfDir: String,
                      root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"events_corrected:$sfDir:$root", {
      val src = new java.io.File(eventsByDay(spark, sfDir, root))
      val dst = new java.io.File(s"$root/${slug(sfDir)}/events_corrected")
      if (dst.exists) rmTree(dst)
      copyTree(src, dst)
      val corrections = Tables.events(spark, sfDir)
        .filter(col("event_id").isin(correctionIds: _*))
        .withColumn("value", lit(999.5))
      upsertEventsInPlace(spark, dst.getPath, corrections)
      dst.getPath
    })

  /** Row-level UPSERT as copy-on-write (CDC MERGE semantics — the other
    * half of the mutation story next to deleteRows): rows in `updates`
    * REPLACE same-id rows in the corpus, new ids INSERT.
    *
    *  1. bloom-index lookup finds the files that might hold a stale
    *     version of an incoming id (no false negatives ⇒ untouched files
    *     provably hold none);
    *  2. those files rewrite with stale versions anti-filtered out, the
    *     whole update batch unioned in (replacements + inserts together);
    *  3. swap + incremental index maintenance, same as deleteRows.
    *
    * The update batch's ids are collected driver-side to probe the index
    * — the CDC-batch-is-bounded contract (a firehose would instead
    * semi-join the index). I/O is |affected files| + |batch|, never the
    * corpus. Idempotent: re-applying the same batch yields the same
    * corpus state. */
  def upsertRows(spark: SparkSession, path: String, idCol: String, updates: DataFrame,
                 numBits: Int = 65536, numHashes: Int = 6): DeleteStats = {
    val ids = updates.select(idCol).collect().map(_.getLong(0)).toSeq
    require(ids.nonEmpty, "graft upsertRows: empty update batch")
    val idx = spark.read.parquet(bloomIdxPath(path)).select("file", "bloom").collect()
    val cand = idx.filter { r =>
      val sk = graft.functions.BloomSketch.deserialize(r.getAs[Array[Byte]]("bloom"))
      ids.exists(sk.mightContainLong)
    }.map(_.getString(0))
    val stale =
      if (cand.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(cand.toSeq: _*)
    val survivors =
      if (cand.isEmpty) updates
      else stale.filter(!col(idCol).isin(ids: _*)).unionByName(updates)
    val removed = if (cand.isEmpty) 0L
      else stale.filter(col(idCol).isin(ids: _*)).count()
    val tmp = path.stripSuffix("/") + "_rewrite_tmp"
    survivors.write.mode("overwrite").parquet(tmp)
    def fileOf(u: String) = new java.io.File(new java.net.URI(u).getPath)
    cand.foreach(u => fileOf(u).delete())
    val dir = new java.io.File(path)
    new java.io.File(tmp).listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.move(f.toPath, new java.io.File(dir, f.getName).toPath)
    }
    new java.io.File(tmp).listFiles.foreach(_.delete())
    new java.io.File(tmp).delete()
    val keepRows = idx.filterNot(r => cand.contains(r.getString(0)))
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("bloom")))
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val newRows = spark.read.parquet(path)
      .select(col(idCol), col("_metadata.file_path").as("file"))
      .filter(!col("file").isin(keepRows.map(_._1).toSeq: _*))
      .groupBy("file")
      .agg(call_function("graft_bloom", col(idCol), lit(numBits), lit(numHashes)).as("bloom"))
      .as[(String, Array[Byte])].collect()
    (keepRows ++ newRows).toSeq.toDF("file", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(bloomIdxPath(path))
    DeleteStats(idx.length, cand.length, removed)
  }

  /** The CDC fixture batch applied by q_docs_upsert: two replacements of
    * existing ids + two inserts (mirrored literally in the oracle SQL). */
  def cdcBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (3L, "updated text three", "en", "cdc", 18L),
      (8L, "updated text eight", "en", "cdc", 18L),
      (100000L, "new doc one", "en", "cdc", 11L),
      (100001L, "new doc two", "en", "cdc", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Materialize (once per JVM) the CDC fixture: a documents corpus with
    * `cdcBatch` upserted copy-on-write. Returns the corpus path. */
  def cdcUpserted(spark: SparkSession, sfDir: String, root: String = defaultRoot): String =
    materialized.getOrElseUpdate(s"cdc_upserted:$sfDir:$root", {
      val p = s"$root/${slug(sfDir)}/docs_cdc"
      writeCorpusWithIndex(Tables.documents(spark, sfDir), "doc_id", p)
      upsertRows(spark, p, "doc_id", cdcBatch(spark))
      p
    })

  /** The ids the catalog's GDPR fixture deletes (present at every SF). */
  val gdprIds: Seq[Long] = Seq(7L, 13L, 101L, 256L)

  /** Materialize (once per JVM) the GDPR fixture: corpus copies of
    * documents AND embeddings with `gdprIds` deleted copy-on-write — a
    * forget request erases the raw text and its vectors together, the
    * training-data-pipeline staple. Returns (docsPath, embeddingsPath). */
  def gdprDeleted(spark: SparkSession, sfDir: String, root: String = defaultRoot): (String, String) = {
    val joined = materialized.getOrElseUpdate(s"gdpr_deleted:$sfDir:$root", {
      val pd = s"$root/${slug(sfDir)}/docs_gdpr"
      val pe = s"$root/${slug(sfDir)}/emb_gdpr"
      writeCorpusWithIndex(Tables.documents(spark, sfDir), "doc_id", pd)
      writeCorpusWithIndex(Tables.embeddings(spark, sfDir), "vec_id", pe)
      deleteRows(spark, pd, "doc_id", gdprIds)
      deleteRows(spark, pe, "vec_id", gdprIds)
      s"$pd|$pe"
    })
    val Array(a, b) = joined.split('|')
    (a, b)
  }

  // ---- hash-bucketed tables (co-located joins) ----------------------------

  /** Save `df` as a bucketed table: hash-bucketed AND sorted by `key` into
    * `buckets` files. Two tables bucketed on their join key with the same
    * bucket count then join with zero Exchange — at 100 TB that is the
    * difference between a network-bound shuffle of both fact tables and a
    * local merge per bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    // explicit external location keeps catalog-query writes out of the
    // session's default warehouse (which may be the repo cwd)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Materialize (once per session catalog) bucketed twins of orders and
    * customer for a scale dir; returns the (orders, customer) table names.
    * Table names embed the scale dir so different SFs never collide. */
  def bucketedOrdersCustomer(spark: SparkSession, sfDir: String,
                             buckets: Int = 8, root: String = defaultRoot): (String, String) = {
    val tag = slug(sfDir)
    // identifier-safe: a dot in a table name parses as a namespace separator
    val id = tag.replace(".", "_").replace("-", "_")
    val (to, tc) = (s"graft_orders_b_$id", s"graft_customer_b_$id")
    if (!spark.catalog.tableExists(to))
      writeBucketed(Tables.orders(spark, sfDir), to, "o_custkey", buckets,
        Some(s"$root/$tag/orders_bucketed"))
    if (!spark.catalog.tableExists(tc))
      writeBucketed(Tables.customer(spark, sfDir), tc, "c_custkey", buckets,
        Some(s"$root/$tag/customer_bucketed"))
    (to, tc)
  }
}
