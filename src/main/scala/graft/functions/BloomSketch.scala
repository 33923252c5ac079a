package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Bloom filter — the RUNTIME-FILTER sketch for 100 TB joins
  * (Bloom 1970; double hashing per Kirsch & Mitzenmacher 2006): build a
  * compact bit-set over the selective side's join keys, ship it to the
  * fact-table scan, and drop non-matching rows BEFORE the shuffle. False
  * positives survive the filter but are removed by the exact join that
  * follows, so the composed result is exact — which is what lets the
  * catalog query carry a full cross-engine oracle (the plain join).
  *
  * Merge is bitwise OR: with deterministic hash functions,
  * bloom(A) | bloom(B) is BIT-IDENTICAL to bloom(A ∪ B), so partial
  * aggregates combine map-side like any sum — the same single-shuffle
  * shape as the HLL / t-digest / Misra-Gries tier next door
  * (operators/Sketches.scala). FPR ≈ (1 − e^(−k·n/m))^k; property tests
  * assert zero false negatives and measured FPR within 2× of that bound.
  *
  * Hashing: splitmix64 finalizer over the long key (strings first fold
  * through FNV-1a 64 on UTF-8 bytes), then k probe positions by double
  * hashing h1 + i·h2 — no per-row allocation, codegen-friendly.
  */
final class BloomSketch(numBits0: Int, numHashes0: Int) extends Serializable {

  /** 0 = "adopt from first merged sketch" (merge-aggregate buffers start
    * unparameterized; a sketch's own geometry travels with its bytes). */
  private var mBits: Int = numBits0
  private var kHashes: Int = numHashes0
  private[functions] var words: Array[Long] =
    if (numBits0 > 0) new Array[Long]((numBits0 + 63) >>> 6) else null

  var nItems: Long = 0L

  def numBits: Int = mBits
  def numHashes: Int = kHashes

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def addLong(key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < kHashes) {
      val pos = (((h1 + i * h2) >>> 1) % mBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    nItems += 1
  }

  def mightContainLong(key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < kHashes) {
      val pos = (((h1 + i * h2) >>> 1) % mBits).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** FNV-1a 64 over the raw UTF-8 bytes, then the same long path. */
  @inline private def foldBytes(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    h
  }

  def addUTF8(s: UTF8String): Unit = addLong(foldBytes(s))
  def mightContainUTF8(s: UTF8String): Boolean = mightContainLong(foldBytes(s))

  def mergeFrom(o: BloomSketch): Unit = {
    if (o.words == null) return
    if (words == null) {
      mBits = o.mBits; kHashes = o.kHashes
      words = new Array[Long](o.words.length)
    }
    require(mBits == o.mBits && kHashes == o.kHashes,
      s"graft_bloom merge: geometry mismatch ($mBits/$kHashes vs ${o.mBits}/${o.kHashes})")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    nItems += o.nItems
  }

  /** Wire layout: numBits, numHashes, nItems, word count, words. */
  def serialize(): Array[Byte] = {
    val w = if (words == null) new Array[Long](0) else words
    val bb = ByteBuffer.allocate(4 + 4 + 8 + 4 + 8 * w.length)
    bb.putInt(mBits).putInt(kHashes).putLong(nItems).putInt(w.length)
    w.foreach(bb.putLong)
    bb.array()
  }
}

object BloomSketch {
  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt; val k = bb.getInt
    val s = new BloomSketch(m, k)
    s.nItems = bb.getLong
    val n = bb.getInt
    if (n > 0) {
      val w = new Array[Long](n)
      var i = 0
      while (i < n) { w(i) = bb.getLong; i += 1 }
      s.words = w // same length the constructor sized from numBits
    }
    s
  }
}

/** `graft_bloom(key, numBits, numHashes)` — build a Bloom filter over a
  * BIGINT or STRING key per group; returns the serialized filter (BINARY),
  * storable and re-aggregable with `graft_bloom_merge`. */
case class BloomAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch] with TernaryLike[Expression] {

  private lazy val mBits = second.eval().asInstanceOf[Int]
  private lazy val kHashes = third.eval().asInstanceOf[Int]
  private lazy val isString = first.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = first.dataType == LongType || first.dataType == IntegerType ||
      first.dataType == StringType
    if (keyOk && second.dataType == IntegerType && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects (bigint|int|string, int literal, int literal), got " +
        children.map(_.dataType).mkString(", "))
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): BloomSketch = {
    require(second.foldable && third.foldable,
      "graft_bloom: numBits and numHashes must be literals")
    require(mBits >= 64, s"graft_bloom: numBits must be >= 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16,
      s"graft_bloom: numHashes must be in [1,16], got $kHashes")
    new BloomSketch(mBits, kHashes)
  }

  override def update(buf: BloomSketch, input: InternalRow): BloomSketch = {
    val v = first.eval(input)
    if (v != null) {
      if (isString) buf.addUTF8(v.asInstanceOf[UTF8String])
      else buf.addLong(v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = { a.mergeFrom(b); a }

  override def eval(buf: BloomSketch): Any = buf.serialize()

  override def serialize(buf: BloomSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch = BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_bloom_merge(sketch)` — bitwise-OR union of stored Bloom filters
  * (the merge-at-query half; identical geometry required). */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_merge expects a binary bloom sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_merge"

  override def createAggregationBuffer(): BloomSketch = new BloomSketch(0, 0)

  override def update(buf: BloomSketch, input: InternalRow): BloomSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(BloomSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = { a.mergeFrom(b); a }

  override def eval(buf: BloomSketch): Any = buf.serialize()

  override def serialize(buf: BloomSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch = BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomMergeAgg =
    copy(child = newChild)
}

/** `graft_might_contain(sketch, key)` — probe a Bloom filter. The sketch
  * argument must be FOLDABLE (a literal produced by collecting the
  * one-row `graft_bloom` aggregate — bounded at numBits/8 bytes by
  * construction): it is deserialized ONCE driver-side and embedded in the
  * generated code as a reference object, so the per-row probe is a tight
  * primitive loop inside whole-stage codegen — this expression sits in
  * the fact-table scan's hot path, where a CodegenFallback would break
  * the WholeStageCodegen span. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_might_contain expects a FOLDABLE binary bloom sketch as arg 1")
    else if (right.dataType == LongType || right.dataType == IntegerType ||
      right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain expects a bigint|int|string key, got ${right.dataType}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val sketch: BloomSketch =
    BloomSketch.deserialize(left.eval().asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(sk: Any, key: Any): Any = right.dataType match {
    case StringType => sketch.mightContainUTF8(key.asInstanceOf[UTF8String])
    case _ => sketch.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, key) => {
      val ref = ctx.addReferenceObj("bloom", sketch, classOf[BloomSketch].getName)
      val probe = right.dataType match {
        case StringType => s"$ref.mightContainUTF8($key)"
        case IntegerType => s"$ref.mightContainLong((long) $key)"
        case _ => s"$ref.mightContainLong($key)"
      }
      s"${ev.value} = $probe;"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    BloomMightContain(newLeft, newRight)
}
