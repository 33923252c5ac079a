package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Native Catalyst GENERATOR (the UDTF rung of the extension ladder):
  * `graft_time_slices(start_us, end_us, width_us)` explodes a time
  * interval into the aligned buckets it overlaps, yielding one
  * (slice_us, ov_us) row per bucket — the interval→bucket allocation
  * primitive behind "session minutes per hour", time-weighted billing,
  * and occupancy heatmaps.
  *
  * Semantics (closed-open interval [start, end)):
  *  - buckets are multiples of width_us; the first is floor(start/width);
  *  - ov_us = min(end, slice+width) − max(start, slice) — exact integer µs;
  *  - a zero-duration interval (end ≤ start) emits its single containing
  *    bucket with ov_us = 0, so point sessions still register presence;
  *  - any null argument generates no rows (explode semantics).
  *
  * Like the built-in explode/posexplode, the analyzer wraps this in a
  * Generate node, so the fan-out runs inside whole-stage pipelines
  * map-side — no shuffle, no driver involvement, ≤ span/width rows per
  * input row. CodegenFallback is fine here: generators evaluate once per
  * input ROW (not once per pair inside a join loop), so interpreted eval
  * is off the hot path by construction.
  */
case class TimeSlices(start: Expression, end: Expression, width: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(start, end, width)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_time_slices expects three bigint arguments (start_us, end_us, width_us), got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def elementSchema: StructType = StructType(Seq(
    StructField("slice_us", LongType, nullable = false),
    StructField("ov_us", LongType, nullable = false)))

  override def prettyName: String = "graft_time_slices"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s0 = start.eval(input); val e0 = end.eval(input); val w0 = width.eval(input)
    if (s0 == null || e0 == null || w0 == null) return Nil
    val s = s0.asInstanceOf[Long]; val e = e0.asInstanceOf[Long]; val w = w0.asInstanceOf[Long]
    require(w > 0, s"graft_time_slices: width_us must be positive, got $w")
    val first = Math.floorDiv(s, w) * w
    if (e <= s) return Seq(InternalRow(first, 0L))
    Iterator.iterate(first)(_ + w).takeWhile(_ < e).map { b =>
      InternalRow(b, math.min(e, b + w) - math.max(s, b))
    }.toSeq
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TimeSlices =
    copy(start = newChildren(0), end = newChildren(1), width = newChildren(2))
}
