package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap interpolation over a dense time axis: LOCF (carry last observation
  * forward) and linear interpolation (lerp between the surrounding
  * observations), both in a CHUNKED formulation that scales.
  *
  * VERDICT r01 flagged the global `Window.orderBy(time)` carry — a single
  * task at any axis size. Here the carry is two-level:
  *   1. per-chunk window — partitioned by `date_trunc(chunk, time)`, so
  *      every chunk sorts/carries in parallel;
  *   2. cross-chunk stitch — a per-chunk boundary table (ONE row per
  *      chunk: its last/first observation) gets the running carry with a
  *      global window over #chunks rows (bounded: days-per-year, not
  *      points-per-axis), then broadcast-joins back onto the axis.
  * Total: one shuffle on chunk + one tiny global window + one broadcast
  * join — no single-task pass over the data ever happens. Results are
  * identical to the global-window form (the specs and the DuckDB oracle,
  * which uses the global form, hold it to that).
  */
object Interpolate {

  /** Adds `__prev_v`/`__prev_t`: the last non-null observation of `valCol`
    * at-or-before each row (chunked carry as described above). */
  def withPrevObs(df: DataFrame, timeCol: String, valCol: String,
                  chunk: String = "day"): DataFrame = {
    val chunked = df.withColumn("__chunk", date_trunc(chunk, col(timeCol)))
    val wIn = Window.partitionBy("__chunk").orderBy(timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = chunked
      .withColumn("__pv_local", last(col(valCol), ignoreNulls = true).over(wIn))
      .withColumn("__pt_local",
        last(when(col(valCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wIn))
    // one row per chunk: its last observation (absent for empty chunks)
    val perChunk = chunked.filter(col(valCol).isNotNull)
      .groupBy("__chunk")
      .agg(max_by(struct(col(valCol).as("v"), col(timeCol).as("t")), col(timeCol)).as("__last"))
    // running carry over STRICTLY EARLIER chunks — #chunks rows, bounded
    val wChunks = Window.orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunked.select("__chunk").distinct()
      .join(perChunk, Seq("__chunk"), "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wChunks))
      .select(col("__chunk"), col("__carry"))
    local.join(broadcast(carry), Seq("__chunk"), "left")
      .withColumn("__prev_v", coalesce(col("__pv_local"), col("__carry.v")))
      .withColumn("__prev_t", coalesce(col("__pt_local"), col("__carry.t")))
      .drop("__pv_local", "__pt_local", "__carry")
  }

  /** Adds `__next_v`/`__next_t`: the first non-null observation of
    * `valCol` at-or-after each row (mirror of withPrevObs). */
  def withNextObs(df: DataFrame, timeCol: String, valCol: String,
                  chunk: String = "day"): DataFrame = {
    val chunked = df.withColumn("__chunk", date_trunc(chunk, col(timeCol)))
    val wIn = Window.partitionBy("__chunk").orderBy(timeCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val local = chunked
      .withColumn("__nv_local", first(col(valCol), ignoreNulls = true).over(wIn))
      .withColumn("__nt_local",
        first(when(col(valCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wIn))
    val perChunk = chunked.filter(col(valCol).isNotNull)
      .groupBy("__chunk")
      .agg(min_by(struct(col(valCol).as("v"), col(timeCol).as("t")), col(timeCol)).as("__first"))
    val wChunks = Window.orderBy("__chunk")
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = chunked.select("__chunk").distinct()
      .join(perChunk, Seq("__chunk"), "left")
      .withColumn("__carry", first(col("__first"), ignoreNulls = true).over(wChunks))
      .select(col("__chunk"), col("__carry"))
    local.join(broadcast(carry), Seq("__chunk"), "left")
      .withColumn("__next_v", coalesce(col("__nv_local"), col("__carry.v")))
      .withColumn("__next_t", coalesce(col("__nt_local"), col("__carry.t")))
      .drop("__nv_local", "__nt_local", "__carry")
  }

  /** LOCF: `outCol` = the value itself where observed, else the last
    * earlier observation (leading gap stays NULL). */
  def locf(df: DataFrame, timeCol: String, valCol: String, outCol: String,
           chunk: String = "day"): DataFrame =
    withPrevObs(df, timeCol, valCol, chunk)
      .withColumn(outCol, col("__prev_v"))
      .drop("__chunk", "__prev_v", "__prev_t")

  /** Adds BOTH `__prev_v`/`__prev_t` and `__next_v`/`__next_t` in one
    * pass. r18: `lerp` used to nest withNextObs(withPrevObs(df)) — each
    * layer consumes its input in three branches (local windows, per-chunk
    * boundary aggregate, chunk-distinct carry), so the input subtree
    * re-evaluated ~6× and the plan carried 10 exchanges
    * (plans/r18/ts_lerp_before). The fused form rides ONE per-chunk
    * sort for both direction windows (same partition+order spec, two
    * frames — no second exchange), ONE boundary aggregate carrying
    * (last, first) together, and ONE carry table join. Identical output
    * columns, pinned by OperatorSpec's global-window equivalence. */
  def withBothObs(df: DataFrame, timeCol: String, valCol: String,
                  chunk: String = "day"): DataFrame = {
    val chunked = df.withColumn("__chunk", date_trunc(chunk, col(timeCol)))
    val wPrev = Window.partitionBy("__chunk").orderBy(timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("__chunk").orderBy(timeCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val local = chunked
      .withColumn("__pv_local", last(col(valCol), ignoreNulls = true).over(wPrev))
      .withColumn("__pt_local",
        last(when(col(valCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wPrev))
      .withColumn("__nv_local", first(col(valCol), ignoreNulls = true).over(wNext))
      .withColumn("__nt_local",
        first(when(col(valCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wNext))
    val perChunk = chunked.filter(col(valCol).isNotNull)
      .groupBy("__chunk")
      .agg(
        max_by(struct(col(valCol).as("v"), col(timeCol).as("t")), col(timeCol)).as("__last"),
        min_by(struct(col(valCol).as("v"), col(timeCol).as("t")), col(timeCol)).as("__first"))
    val wPrevChunks = Window.orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNextChunks = Window.orderBy("__chunk")
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = chunked.select("__chunk").distinct()
      .join(perChunk, Seq("__chunk"), "left")
      .withColumn("__pcarry", last(col("__last"), ignoreNulls = true).over(wPrevChunks))
      .withColumn("__ncarry", first(col("__first"), ignoreNulls = true).over(wNextChunks))
      .select(col("__chunk"), col("__pcarry"), col("__ncarry"))
    local.join(broadcast(carry), Seq("__chunk"), "left")
      .withColumn("__prev_v", coalesce(col("__pv_local"), col("__pcarry.v")))
      .withColumn("__prev_t", coalesce(col("__pt_local"), col("__pcarry.t")))
      .withColumn("__next_v", coalesce(col("__nv_local"), col("__ncarry.v")))
      .withColumn("__next_t", coalesce(col("__nt_local"), col("__ncarry.t")))
      .drop("__pv_local", "__pt_local", "__nv_local", "__nt_local",
        "__pcarry", "__ncarry")
  }

  /** Linear interpolation: observed rows keep their value; gaps get
    * prev + (next - prev) · Δt-ratio (µs-exact ratio as a double, the
    * same left-to-right arithmetic as the SQL oracle); a leading gap is
    * NULL, a trailing gap carries the last observation (LOCF tail). */
  def lerp(df: DataFrame, timeCol: String, valCol: String, outCol: String,
           chunk: String = "day"): DataFrame = {
    def us(c: Column) = expr(s"unix_micros(cast(${c.toString} as timestamp))")
    val both = withBothObs(df, timeCol, valCol, chunk)
    both
      .withColumn(outCol,
        when(col(valCol).isNotNull, col(valCol))
          .when(col("__prev_v").isNull, lit(null).cast("double"))
          .when(col("__next_v").isNull, col("__prev_v"))
          .otherwise(
            col("__prev_v") + (col("__next_v") - col("__prev_v")) *
              ((us(col(timeCol)) - us(col("__prev_t"))).cast("double") /
                (us(col("__next_t")) - us(col("__prev_t"))).cast("double"))))
      .drop("__chunk", "__prev_v", "__prev_t", "__next_v", "__next_t")
  }
}
