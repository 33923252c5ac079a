package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KMV ("k minimum values" / bottom-k) distinct-value sketch over
  * md5-derived 60-bit hashes (Bar-Yossef et al. 2002; set-operation
  * estimators from Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * State is the at-most-k SMALLEST distinct hash values seen. Two
  * properties make it the one distinct sketch in this codebase whose
  * ESTIMATES carry a full cross-engine oracle (unlike HLL, whose register
  * layout is engine-internal):
  *
  *  - the state is a pure function of the input SET: "k smallest distinct
  *    md5 hashes" is reproducible in any engine with md5 — DuckDB
  *    recomputes the identical state with ORDER BY hash LIMIT k;
  *  - the estimators are closed-form arithmetic over that state:
  *    distinct ≈ (k-1) / (h_(k) / 2^60), and for two sketches A, B the
  *    Beyer et al. intersection estimate ρ·D_U where U = the kk smallest
  *    of A ∪ B, ρ = |{h ∈ U : h ∈ A ∧ h ∈ B}| / kk, D_U the union
  *    estimate from U. Every step is integer except two final IEEE
  *    divisions, evaluated in the same order on both engines.
  *
  * Merge is a lossless set union re-trimmed to k (the k smallest of a
  * union are among the per-part k smallest), so sketch-at-ingest /
  * merge-at-query loses nothing vs sketching the whole corpus — asserted
  * in SketchSpec. Undersaturated sketches (distinct < k) are EXACT.
  *
  * Scale shape: O(k) state, associative merge, map-side partial combine —
  * behaves like sum/count in a single-shuffle hash aggregate. The
  * intersection answers "distinct users who did BOTH X and Y" from two
  * stored 512-byte sketches instead of a re-scan + self-join of raw data.
  */
final class KmvSketch(k0: Int) extends Serializable {

  /** 0 = "adopt from first merged sketch" (same convention as FreqSketch). */
  private var k: Int = k0

  /** Sorted distinct kept hashes; size ≤ effK. TreeSet gives O(log k)
    * insert/trim and in-order iteration for serialize/estimate. */
  private[functions] val values = mutable.TreeSet.empty[Long]

  private def effK: Int = if (k > 0) k else 64

  def capacity: Int = effK

  def add(h: Long): Unit = {
    if (values.size < effK) values += h
    else if (h < values.last && !values.contains(h)) {
      values += h
      values -= values.last
    }
  }

  def mergeFrom(o: KmvSketch): Unit = {
    // Mixed-capacity merges would silently bias the estimate (a larger-k
    // sketch's tail is not the k-smallest at the smaller k) — fail loudly,
    // mirroring intersectEstimate's capacity check.
    require(k <= 0 || o.k <= 0 || k == o.k,
      s"graft_kmv merge of mixed capacities: $k vs ${o.k}")
    if (k <= 0) k = o.k
    o.values.foreach(add)
  }

  def size: Int = values.size

  def contains(h: Long): Boolean = values.contains(h)

  /** Distinct estimate: exact below saturation, (k-1)/u_(k) at it. */
  def estimate: Double =
    if (values.size < effK) values.size.toDouble
    else (effK - 1).toDouble / (values.last.toDouble / KmvSketch.TwoPow60)

  /** Wire layout: k, count, then the kept hashes ascending. */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 * values.size)
    bb.putInt(k).putInt(values.size)
    values.foreach(bb.putLong)
    bb.array()
  }
}

object KmvSketch {
  /** Hash domain: md5-derived 60-bit non-negative longs (Dedup.h60). */
  val TwoPow60: Double = 1152921504606846976.0

  def deserialize(bytes: Array[Byte]): KmvSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KmvSketch(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { s.values += bb.getLong; i += 1 }
    s
  }

  /** Beyer et al. 2007 intersection estimate ρ·D_U over two sketches of
    * equal capacity. Exact when the union is undersaturated. */
  def intersectEstimate(a: KmvSketch, b: KmvSketch): Double = {
    require(a.capacity == b.capacity,
      s"graft_kmv_inter: sketch capacities differ (${a.capacity} vs ${b.capacity})")
    val kCap = a.capacity
    val merged = (a.values ++ b.values).toArray // TreeSet union: sorted, distinct
    val kk = math.min(kCap, merged.length)
    if (kk == 0) return 0.0
    var c = 0
    var i = 0
    while (i < kk) {
      if (a.contains(merged(i)) && b.contains(merged(i))) c += 1
      i += 1
    }
    val dU =
      if (merged.length < kCap) merged.length.toDouble
      else (kk - 1).toDouble / (merged(kk - 1).toDouble / TwoPow60)
    c.toDouble / kk * dU
  }
}

/** `graft_kmv(hash, k)` — build a KMV sketch per group from a 60-bit hash
  * column; returns the serialized sketch (BINARY), storable and
  * re-aggregable with `graft_kmv_merge`. */
case class KmvAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] with BinaryLike[Expression] {

  private lazy val kV = kExpr.eval().asInstanceOf[Int]

  override def left: Expression = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(LongType, IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects (bigint hash, int literal), got $got")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvSketch = {
    require(kExpr.foldable, "graft_kmv: k must be a literal")
    require(kV >= 2, s"graft_kmv: k must be >= 2, got $kV")
    new KmvSketch(kV)
  }

  override def update(buf: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = { a.mergeFrom(b); a }

  override def eval(buf: KmvSketch): Any = buf.serialize()

  override def serialize(buf: KmvSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvSketch = KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAgg =
    copy(child = newLeft, kExpr = newRight)
}

/** `graft_kmv_merge(sketch)` — union stored KMV sketches (lossless up to
  * the shared capacity: merged state ≡ whole-corpus state). */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_merge expects a binary KMV sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_merge"

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(0)

  override def update(buf: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(KmvSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = { a.mergeFrom(b); a }

  override def eval(buf: KmvSketch): Any = buf.serialize()

  override def serialize(buf: KmvSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvSketch = KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** `graft_kmv_est(sketch)` — distinct-count estimate of a stored sketch. */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_est expects a binary KMV sketch, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_est"

  override def nullSafeEval(sketch: Any): Any =
    KmvSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    KmvEstimate(newChild)
}

/** `graft_kmv_inter(a, b)` — distinct-intersection estimate between two
  * stored sketches of equal capacity (Beyer et al. 2007 ρ·D_U). */
case class KmvIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(BinaryType, BinaryType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_inter expects (binary, binary), got $got")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_inter"

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(
      KmvSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvSketch.deserialize(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    KmvIntersect(newLeft, newRight)
}
