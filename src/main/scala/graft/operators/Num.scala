package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric determinism helpers (SURVEY.md §2.0).
  *
  * `roundd` mimics DuckDB 1.0's DOUBLE rounding bit-for-bit:
  * `copysign(floor(|x|*10^n + 0.5), x) / 10^n`, all in IEEE double space.
  * Spark's built-in `round` goes through exact BigDecimal(HALF_UP), which
  * disagrees with DuckDB by one ulp whenever `|x|*10^n` lands within an ulp
  * of a .5 boundary (empirically verified: round(47.253749999999996, 4) is
  * 47.2537 in DuckDB, 47.2538 via BigDecimal). Since the correctness gate is
  * an exact hash-compare against DuckDB, every rounded output column goes
  * through this helper instead. Both engines then evaluate the identical
  * IEEE expression on identical inputs.
  *
  * Valid for |x|*10^n < 2^53 — far beyond any value in the inventory.
  *
  * Sign-bit preservation: DuckDB's copysign-based round carries the input's
  * IEEE sign bit onto a zero result, so round(-0.0) = -0.0 and
  * round(0/-x) = -0.0. A plain `when(c < 0, ...)` drops that bit because
  * `-0.0 < 0` is false. Detecting the sign bit of a zero in Spark SQL is
  * subtle: `1.0/c` trips ANSI divide-by-zero, and Spark's `atan2`
  * deliberately adds 0.0 to its operands (normalizing -0.0 away). The one
  * built-in that still sees the raw bit is the string cast —
  * Java `Double.toString(-0.0)` is "-0.0" — so the zero branch probes
  * `cast(c as string) == '-0.0'`. The Or short-circuits in codegen, so the
  * string path only runs on rows where c == 0. `-mag` on mag == +0.0 then
  * emits -0.0, matching DuckDB bit-for-bit.
  */
object Num {
  def roundd(c: Column, n: Int): Column = {
    val p = math.pow(10, n) // exact double for 0 <= n <= 22
    val mag = floor(abs(c) * p + lit(0.5)) / p
    val negBit = c < 0 || (c === lit(0.0) && c.cast("string") === lit("-0.0"))
    when(negBit, -mag).otherwise(mag)
  }

  /** Scalar twin of [[roundd]] — bit-identical by construction: the column
    * form codegens to exactly `Math.floor(Math.abs(x) * p + 0.5) / p` with
    * the sign bit copied from the input (Spark's floor/abs on DoubleType
    * are Math.floor/Math.abs; `*`, `+`, `/` are the same IEEE ops on both
    * paths, and `p = math.pow(10, n)` is the same plan-time constant). Used
    * by the in-memory per-key kernels (matrix profile) whose intermediate
    * roundings cannot be emitted back through Spark literal expressions;
    * NumSpec sweeps the two forms for equality over boundary values. */
  def rounddD(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    val mag = math.floor(math.abs(x) * p + 0.5) / p
    // negative sign bit (covers -0.0, which `x < 0` misses)
    if (x < 0 || (x == 0.0 && java.lang.Double.doubleToRawLongBits(x) != 0L)) -mag else mag
  }

  /** Exact 50th percentile with Spark's Percentile interpolation, on a
    * SORTED array: position = 0.5·(n−1); integral position indexes, a
    * fractional one blends (higher−pos)·a[lo] + (pos−lower)·a[hi] — the
    * aggregate's exact coefficient order, so in-memory folds are
    * bit-identical to `percentile(x, 0.5)` (for the median the two
    * coefficients are exactly 0.5, making the blend order-proof). Shared
    * by the in-group MAD kernels (Signal, graft_med_mad). */
  def pct50Sorted(a: Array[Double]): Double = {
    val pos = 0.5 * (a.length - 1)
    val lower = math.floor(pos).toInt
    val higher = math.ceil(pos).toInt
    if (higher == lower) a(lower)
    else (higher - pos) * a(lower) + (pos - lower) * a(higher)
  }
}
