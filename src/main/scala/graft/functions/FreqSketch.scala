package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequency summary — the MERGEABLE heavy-hitters sketch
  * (Misra & Gries 1982; merge rule and error analysis from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): at most `capacity` (item, count)
  * entries, with the invariant
  *
  *   true(x) − errBound  ≤  est(x)  ≤  true(x)
  *
  * where est(x) = 0 for absent items and errBound (tracked in the sketch)
  * is the sum of all decrement steps, bounded by N/(capacity+1) over any
  * sequence of adds AND merges. Consequences the property tests assert:
  * every item with true frequency > errBound is present, estimates never
  * overcount, and when capacity ≥ distinct items the summary is EXACT
  * (errBound = 0) — which is what makes an oracle-backed catalog entry
  * possible on a low-cardinality column.
  *
  * Completes the sketch triad next to HLL (distinct) and t-digest
  * (quantiles) in operators/Sketches.scala, with the same serving shape:
  * O(capacity) state, associative merge, map-side partial combine, and a
  * storable binary form for sketch-at-ingest / merge-at-query.
  */
final class FreqSketch(capacity0: Int) extends Serializable {

  /** 0 = "adopt from first merged sketch" (merge-aggregate buffers start
    * unparameterized; a sketch's own capacity travels with its bytes). */
  private var cap: Int = capacity0

  private[functions] val counts = mutable.HashMap.empty[String, Long]

  var errBound: Long = 0L
  var totalWeight: Long = 0L

  private def effCap: Int = if (cap > 0) cap else 64

  def add(item: String, w: Long): Unit = {
    counts.updateWith(item) { c => Some(c.getOrElse(0L) + w) }
    totalWeight += w
    trim()
  }

  def mergeFrom(o: FreqSketch): Unit = {
    if (cap <= 0) cap = o.cap
    o.counts.foreach { case (k, v) =>
      counts.updateWith(k) { c => Some(c.getOrElse(0L) + v) }
    }
    errBound += o.errBound
    totalWeight += o.totalWeight
    trim()
  }

  /** The PODS'12 merge-trim: subtract the (capacity+1)-th largest count
    * from every entry and drop the non-positive ones (for a single-add
    * overflow this degenerates to the classic decrement-by-min). Each trim
    * removes ≥ (capacity+1)·d weight, which is what bounds Σd — and thus
    * every estimate's undercount — by N/(capacity+1). */
  private def trim(): Unit = if (counts.size > effCap) {
    val vs = counts.values.toArray
    java.util.Arrays.sort(vs)
    val d = vs(vs.length - 1 - effCap) // (capacity+1)-th largest
    counts.filterInPlace((_, v) => v > d)
    counts.mapValuesInPlace((_, v) => v - d)
    errBound += d
  }

  /** Entries sorted by (count desc, item asc) — a total order, so output
    * is deterministic given the same sketch state. */
  def top(k: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)

  def size: Int = counts.size

  /** Wire layout: capacity, errBound, totalWeight, entry count, then
    * (utf8 length, utf8 bytes, count) per entry. */
  def serialize(): Array[Byte] = {
    val items = counts.toSeq.map { case (k, v) => (k.getBytes(StandardCharsets.UTF_8), v) }
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + items.map(_._1.length + 12).sum)
    bb.putInt(cap).putLong(errBound).putLong(totalWeight).putInt(items.size)
    items.foreach { case (bytes, v) =>
      bb.putInt(bytes.length).put(bytes).putLong(v)
    }
    bb.array()
  }
}

object FreqSketch {
  def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new FreqSketch(bb.getInt)
    s.errBound = bb.getLong
    s.totalWeight = bb.getLong
    val n = bb.getInt
    // entries restore directly (not via add): counts at rest are post-trim
    // residuals, and errBound/totalWeight were already read back above
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val buf = new Array[Byte](len)
      bb.get(buf)
      val v = bb.getLong
      s.counts.update(new String(buf, StandardCharsets.UTF_8), v)
      i += 1
    }
    s
  }
}

/** `graft_freq(item, capacity)` — build a Misra-Gries frequency summary
  * per group; returns the serialized sketch (BINARY), storable and
  * re-aggregable with `graft_freq_merge`. */
case class FreqSketchAgg(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] with BinaryLike[Expression] {

  private lazy val capV = capacityExpr.eval().asInstanceOf[Int]

  override def left: Expression = child
  override def right: Expression = capacityExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(StringType, IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq expects (string, int literal), got $got")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq"

  override def createAggregationBuffer(): FreqSketch = {
    require(capacityExpr.foldable, "graft_freq: capacity must be a literal")
    require(capV >= 2, s"graft_freq: capacity must be >= 2, got $capV")
    new FreqSketch(capV)
  }

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = { a.mergeFrom(b); a }

  override def eval(buf: FreqSketch): Any = buf.serialize()

  override def serialize(buf: FreqSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): FreqSketch = FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketchAgg =
    copy(child = newLeft, capacityExpr = newRight)
}

/** `graft_freq_merge(sketch)` — union stored frequency summaries (the
  * merge-at-query half; error bounds add, staying ≤ N/(capacity+1)). */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_merge expects a binary frequency sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_merge"

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(0)

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(FreqSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = { a.mergeFrom(b); a }

  override def eval(buf: FreqSketch): Any = buf.serialize()

  override def serialize(buf: FreqSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): FreqSketch = FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** `graft_freq_topk(sketch, k)` — the top-k entries of a stored summary as
  * `array<struct<item string, cnt_min bigint>>`, ordered by (count desc,
  * item asc). cnt_min is the LOWER estimate (Misra-Gries undercounts by at
  * most `graft_freq_err` of the same sketch). */
case class FreqTopK(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(BinaryType, IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_topk expects (binary, int), got $got")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt_min", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_topk"

  override def nullSafeEval(sketch: Any, k: Any): Any = {
    val s = FreqSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val rows: Array[Any] = s.top(k.asInstanceOf[Int]).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c): Any
    }.toArray
    new GenericArrayData(rows): ArrayData
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopK =
    FreqTopK(newLeft, newRight)
}

/** `graft_freq_err(sketch)` — the sketch's accumulated undercount bound:
  * every true frequency satisfies cnt_min ≤ true ≤ cnt_min + err. */
case class FreqErr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_err expects a binary frequency sketch, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_err"

  override def nullSafeEval(sketch: Any): Any =
    FreqSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).errBound

  override protected def withNewChildInternal(newChild: Expression): FreqErr =
    FreqErr(newChild)
}
