package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_lttb(points, n_out)` — Largest-Triangle-Three-Buckets downsampling
  * (Steinarsson, "Downsampling Time Series for Visual Representation",
  * 2013): reduce a (t, v) series to `n_out` points while preserving its
  * visual shape. First and last points are always kept; the interior is
  * split into `n_out − 2` index buckets, and from each bucket the point
  * forming the LARGEST triangle with the previously selected point and the
  * next bucket's average is chosen — spikes survive, flat stretches thin
  * out. The TSDB dashboard read: render 2M raw points as 1k without losing
  * the outage dip or the spike.
  *
  * Input must be sorted by t (callers build it with sort_array over a
  * collected struct, the EWMA/Holt pattern). Deterministic: ties on area
  * break to the earliest point. Sequential by construction (each choice
  * depends on the previous), so it runs per GROUP over the collected
  * series — O(series length) memory per group, the same contract as the
  * per-day fold queries; chunk the series (per day/week) when a single
  * series outgrows an executor.
  *
  * n < 3 or n_out >= n returns the input unchanged; n_out < 3 keeps just
  * the endpoints (n_out = 2) — it never throws on degenerate series.
  */
case class Lttb(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  private val pointType = StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), IntegerType)
      if s.length == 2 && s(0).dataType == LongType && s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case got => TypeCheckResult.TypeCheckFailure(
      s"graft_lttb expects (array<struct<t bigint, v double>>, int), got $got")
  }

  override def dataType: DataType = ArrayType(pointType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lttb"

  override def nullSafeEval(pointsAny: Any, nOutAny: Any): Any = {
    val arr = pointsAny.asInstanceOf[ArrayData]
    val nOut = nOutAny.asInstanceOf[Int]
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ts(i) = row.getLong(0)
      vs(i) = row.getDouble(1)
      i += 1
    }
    val keep: Array[Int] =
      if (n <= 1 || nOut >= n) Array.range(0, n)
      else if (nOut <= 2 || n < 3) Array(0, n - 1)
      else {
        val nb = nOut - 2
        val out = new Array[Int](nOut)
        out(0) = 0
        var last = 0
        var k = 0
        while (k < nb) {
          // interior indices 1..n-2 split into nb even index buckets
          val lo = 1 + ((k.toLong * (n - 2)) / nb).toInt
          val hi = 1 + (((k + 1).toLong * (n - 2)) / nb).toInt // exclusive
          // the NEXT bucket's average (the last bucket pairs with the end point)
          val nlo = if (k + 1 < nb) 1 + (((k + 1).toLong * (n - 2)) / nb).toInt else n - 1
          val nhi = if (k + 1 < nb) 1 + (((k + 2).toLong * (n - 2)) / nb).toInt else n
          var at = 0.0; var av = 0.0
          var j = nlo
          while (j < nhi) { at += ts(j).toDouble; av += vs(j); j += 1 }
          val cnt = (nhi - nlo).toDouble
          val ax = at / cnt; val ay = av / cnt
          val lx = ts(last).toDouble; val ly = vs(last)
          var best = lo
          var bestArea = -1.0
          j = lo
          while (j < hi) {
            // 2× triangle area; strict > keeps the earliest on ties
            val area = math.abs((lx - ax) * (vs(j) - ly) - (lx - ts(j).toDouble) * (ay - ly))
            if (area > bestArea) { bestArea = area; best = j }
            j += 1
          }
          out(k + 1) = best
          last = best
          k += 1
        }
        out(nOut - 1) = n - 1
        out
      }
    new GenericArrayData(keep.map(ix => InternalRow(ts(ix), vs(ix)): Any)): ArrayData
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lttb =
    Lttb(newLeft, newRight)
}
