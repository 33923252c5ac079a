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
  */
object Num {
  def roundd(c: Column, n: Int): Column = {
    val p = math.pow(10, n) // exact double for 0 <= n <= 22
    val mag = floor(abs(c) * p + lit(0.5)) / p
    when(c < 0, -mag).otherwise(mag)
  }
}
