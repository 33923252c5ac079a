package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_hist(value, lo, hi, bins)` — fixed-bin histogram as a custom
  * Catalyst `TypedImperativeAggregate`: the same partial/merge/serialize
  * contract a t-digest or HLL sketch needs, exercised with EXACT
  * semantics so the correctness gate can hash-match it cross-engine.
  *
  * Buffer = `Array[Long]` of `bins + 2` counters (underflow, bins,
  * overflow). Update is O(1); merge is elementwise add — associative and
  * commutative, so map-side partial aggregation bounds shuffle volume at
  * (bins + 2) longs per partition per group regardless of row count: the
  * shape that makes distribution sketches viable at 100 TB.
  *
  * Determinism: bin index = floor((v - lo) * bins / (hi - lo)), evaluated
  * in IEEE double order identical to the oracle's SQL formulation; counts
  * are integers, so merge order cannot change the result.
  */
case class HistogramAgg(
    child: Expression,
    lo: Expression,
    hi: Expression,
    bins: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with QuaternaryLike[Expression] {

  private lazy val loV = lo.eval().asInstanceOf[Double]
  private lazy val hiV = hi.eval().asInstanceOf[Double]
  private lazy val binsV = bins.eval().asInstanceOf[Int]

  override def first: Expression = child
  override def second: Expression = lo
  override def third: Expression = hi
  override def fourth: Expression = bins

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(DoubleType, DoubleType, DoubleType, IntegerType)
    val got = children.map(_.dataType)
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hist expects (double, double, double, int) literals, got $got")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hist"

  override def createAggregationBuffer(): Array[Long] = {
    require(bins.foldable && lo.foldable && hi.foldable,
      "graft_hist: lo/hi/bins must be literals")
    require(binsV > 0 && hiV > loV, s"graft_hist: need bins > 0 and hi > lo")
    new Array[Long](binsV + 2)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      val idx =
        if (d < loV) 0
        else if (d >= hiV) binsV + 1
        else 1 + math.floor((d - loV) * binsV / (hiV - loV)).toInt
      buf(idx) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HistogramAgg =
    copy(child = newFirst, lo = newSecond, hi = newThird, bins = newFourth)
}

/** `graft_hist_quantile(hist, lo, hi, q)` — quantile served from a stored
  * `graft_hist` array (the `histogram_quantile` read every metrics TSDB
  * answers from pre-aggregated histograms): linear interpolation inside
  * the selected bin, assuming uniform density within it. Because the bin
  * counts are exact integers and the interpolation is a fixed left-to-
  * right IEEE double formula, the result is deterministic and the catalog
  * entry carries a full cross-engine oracle — DuckDB reproduces the same
  * selection rule and arithmetic in SQL (unlike t-digest, whose state
  * depends on merge order).
  *
  * Semantics, mirrored verbatim in the oracle: target = q·total over ALL
  * counters (underflow + bins + overflow); the hit bin is the first with
  * cumBefore < target ≤ cumBefore + n (empty bins can never hit); a hit
  * in underflow clamps to `lo`, in overflow to `hi`, else
  * value = lo + (bin−1)·w + w·(target − cumBefore)/n with w = (hi−lo)/bins.
  * q must lie in (0, 1]; an all-zero histogram yields NULL. Scalar over
  * already-aggregated rows, so CodegenFallback costs nothing. */
case class HistQuantile(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends Expression with CodegenFallback with QuaternaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(ArrayType(LongType, containsNull = false),
      DoubleType, DoubleType, DoubleType)
    val got = children.map(_.dataType)
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hist_quantile expects (array<bigint>, double, double, double), got $got")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hist_quantile"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val hA = first.eval(input)
    val loA = second.eval(input)
    val hiA = third.eval(input)
    val qA = fourth.eval(input)
    if (hA == null || loA == null || hiA == null || qA == null) return null
    val h = hA.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val lo = loA.asInstanceOf[Double]
    val hi = hiA.asInstanceOf[Double]
    val q = qA.asInstanceOf[Double]
    require(q > 0.0 && q <= 1.0, s"graft_hist_quantile: q must be in (0, 1], got $q")
    val bins = h.length - 2
    var total = 0L
    var i = 0
    while (i < h.length) { total += h(i); i += 1 }
    if (total == 0L) return null
    val target = q * total
    val w = (hi - lo) / bins
    var cumBefore = 0L
    i = 0
    while (i < h.length) {
      val n = h(i)
      if (cumBefore < target && target <= cumBefore + n) {
        return if (i == 0) lo
        else if (i == bins + 1) hi
        else lo + (i - 1) * w + w * (target - cumBefore) / n
      }
      cumBefore += n
      i += 1
    }
    hi // unreachable for q ≤ 1 (target ≤ total = final cum); keeps the compiler total
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HistQuantile =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
