package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", arXiv:1902.04023): a MERGEABLE quantile
  * sketch — unlike Greenwald-Khanna (`percentile_approx`'s algorithm,
  * which merges lossily and cannot be stored/re-aggregated), t-digest
  * states combine associatively, so the TSDB serving pattern works:
  * sketch each ingest window once, store the binary digest next to the
  * rollup, answer any later quantile-over-range query by merging the
  * stored digests — no re-scan of raw data. Same contract as the HLL
  * tier in operators/Sketches.scala.
  *
  * Size bound: the k1 scale function k(q) = δ/(2π)·asin(2q−1) admits at
  * most ~⌈πδ/2⌉ centroids, so a digest is O(δ) doubles regardless of
  * input size — (2·δ·8)-ish bytes per group per partition is the whole
  * shuffle footprint, the shape that makes per-window quantiles viable
  * at 100 TB. Rank error concentrates at the tails as ~q(1−q)/δ: δ=200
  * holds p99 to a fraction of a percent of rank.
  *
  * Determinism caveat (documented, inherent to the algorithm): centroid
  * placement depends on input partitioning/merge order, so two runs can
  * differ in the last ulps of a quantile. Results are therefore declared
  * oracle-less (like HLL) and property-tested by RANK ERROR against the
  * exact distribution in SketchSpec.
  */
final class TDigest(compression0: Double) extends Serializable {

  /** 0 = "adopt from first merged digest" (the merge-aggregate's buffer
    * starts unparameterized; a digest's own δ travels with its bytes). */
  private var comp: Double = compression0

  def compression: Double = comp

  // compressed centroids, sorted by mean
  private var cMean = new Array[Double](0)
  private var cWeight = new Array[Double](0)
  // unmerged incoming points; capacity fixed at first add (~5δ) so the
  // amortized compress cost is O(δ log δ) per 5δ points
  private var bMean: Array[Double] = null
  private var bWeight: Array[Double] = null
  private var bN = 0

  var totalWeight = 0.0
  var vMin = Double.PositiveInfinity
  var vMax = Double.NegativeInfinity

  private def effComp: Double = if (comp > 0) comp else 200.0

  private def ensureBuf(): Unit = if (bMean == null) {
    val cap = math.max(64, (5 * effComp).toInt)
    bMean = new Array[Double](cap)
    bWeight = new Array[Double](cap)
  }

  def add(x: Double, w: Double): Unit = {
    ensureBuf()
    if (bN == bMean.length) compress()
    bMean(bN) = x
    bWeight(bN) = w
    bN += 1
    totalWeight += w
    if (x < vMin) vMin = x
    if (x > vMax) vMax = x
  }

  /** Fold `o`'s centroids into this digest (adopting its δ if unset).
    * Centroids are weighted points to the merge pass — the paper's
    * digest-union. `o` is compressed first; it is not otherwise mutated. */
  def mergeFrom(o: TDigest): Unit = {
    if (comp <= 0) comp = o.comp
    o.compress()
    var i = 0
    while (i < o.cMean.length) { add(o.cMean(i), o.cWeight(i)); i += 1 }
  }

  /** k1 scale: a centroid spanning quantiles [q0, q2] is admissible while
    * k(q2) − k(q0) ≤ 1 — narrow near the tails, wide in the middle. */
  private def kScale(q: Double): Double = {
    val qc = math.min(1.0, math.max(0.0, q))
    effComp / (2 * math.Pi) * math.asin(2 * qc - 1)
  }

  /** Merge buffered points + existing centroids into a fresh centroid set
    * (single sorted pass, the paper's merging algorithm). */
  def compress(): Unit = {
    if (bN == 0) return
    val n = cMean.length + bN
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(cMean, 0, ms, 0, cMean.length)
    System.arraycopy(cWeight, 0, ws, 0, cMean.length)
    System.arraycopy(bMean, 0, ms, cMean.length, bN)
    System.arraycopy(bWeight, 0, ws, cMean.length, bN)
    val order = Array.range(0, n).sortBy(ms(_))

    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var outN = 0
    var curMean = ms(order(0))
    var curW = ws(order(0))
    var wSoFar = 0.0            // weight emitted before the current centroid
    var kLeft = kScale(0.0)
    var i = 1
    while (i < n) {
      val m = ms(order(i))
      val w = ws(order(i))
      val q2 = (wSoFar + curW + w) / totalWeight
      if (kScale(q2) - kLeft <= 1.0) {
        curW += w
        curMean += (w / curW) * (m - curMean) // weighted incremental mean
      } else {
        outM(outN) = curMean; outW(outN) = curW; outN += 1
        wSoFar += curW
        kLeft = kScale(wSoFar / totalWeight)
        curMean = m; curW = w
      }
      i += 1
    }
    outM(outN) = curMean; outW(outN) = curW; outN += 1
    cMean = java.util.Arrays.copyOf(outM, outN)
    cWeight = java.util.Arrays.copyOf(outW, outN)
    bN = 0
  }

  /** Quantile by interpolation over centroid midpoints, anchored at the
    * exact observed min/max (so q→0/1 converge to true extremes). */
  def quantile(q: Double): Double = {
    compress()
    val n = cMean.length
    if (n == 0) return Double.NaN
    if (n == 1) return cMean(0)
    val t = math.min(1.0, math.max(0.0, q)) * totalWeight
    var cum = 0.0
    var prevMid = 0.0
    var prevVal = vMin
    var i = 0
    while (i < n) {
      val mid = cum + cWeight(i) / 2
      if (t <= mid) {
        val frac = if (mid > prevMid) (t - prevMid) / (mid - prevMid) else 0.0
        return prevVal + frac * (cMean(i) - prevVal)
      }
      cum += cWeight(i)
      prevMid = mid
      prevVal = cMean(i)
      i += 1
    }
    val frac = if (totalWeight > prevMid) (t - prevMid) / (totalWeight - prevMid) else 1.0
    prevVal + frac * (vMax - prevVal)
  }

  /** Wire layout: δ, min, max, totalWeight, centroid count, means, weights.
    * Compressed first, so size is bounded by the k1 centroid cap (~πδ/2). */
  def serialize(): Array[Byte] = {
    compress()
    val n = cMean.length
    val bb = ByteBuffer.allocate(4 * 8 + 4 + 16 * n)
    bb.putDouble(comp).putDouble(vMin).putDouble(vMax).putDouble(totalWeight)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(cMean(i)); i += 1 }
    i = 0
    while (i < n) { bb.putDouble(cWeight(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    d.vMin = bb.getDouble
    d.vMax = bb.getDouble
    val tw = bb.getDouble
    val n = bb.getInt
    val ms = Array.fill(n)(bb.getDouble)
    val ws = Array.fill(n)(bb.getDouble)
    var i = 0
    while (i < n) { d.add(ms(i), ws(i)); i += 1 }
    d.totalWeight = tw // add() re-accumulated; restore the exact serialized sum
    d
  }
}

/** `graft_tdigest(value, δ)` — build a t-digest per group; returns the
  * serialized sketch (BINARY), storable and re-aggregable with
  * `graft_tdigest_merge`. Partial states merge associatively, so map-side
  * combine bounds shuffle volume at O(δ) per partition per group. */
case class TDigestAgg(
    child: Expression,
    compressionExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with BinaryLike[Expression] {

  private lazy val compV = compressionExpr.eval().asInstanceOf[Int]

  override def left: Expression = child
  override def right: Expression = compressionExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(DoubleType, IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tdigest expects (double, int literal), got $got")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_tdigest"

  override def createAggregationBuffer(): TDigest = {
    require(compressionExpr.foldable, "graft_tdigest: compression must be a literal")
    require(compV >= 20, s"graft_tdigest: compression must be >= 20, got $compV")
    new TDigest(compV.toDouble)
  }

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = { a.mergeFrom(b); a }

  override def eval(buf: TDigest): Any = buf.serialize()

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestAgg =
    copy(child = newLeft, compressionExpr = newRight)
}

/** `graft_tdigest_merge(sketch)` — union stored t-digest sketches (the
  * merge-at-query half of the serving pattern). The buffer adopts δ from
  * the first sketch it sees; digests of differing δ still merge (the
  * result honors the buffer's δ). */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tdigest_merge expects a binary t-digest sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_tdigest_merge"

  override def createAggregationBuffer(): TDigest = new TDigest(0.0)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = { a.mergeFrom(b); a }

  override def eval(buf: TDigest): Any = buf.serialize()

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

/** `graft_tdigest_quantile(sketch, q)` — extract a quantile from a stored
  * sketch. Scalar over already-aggregated rows (one per group/window), so
  * CodegenFallback costs nothing on the hot path; an empty digest yields
  * NULL. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(BinaryType, DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tdigest_quantile expects (binary, double), got $got")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tdigest_quantile"

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val d = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (d.totalWeight == 0) null else d.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    TDigestQuantile(newLeft, newRight)
}
