package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: parallel arrays sorted by (score desc, weight
  * desc, id asc), size ≤ k. The hot path is the O(1) reject against the
  * current k-th element; accepted rows insertion-sort in O(k) (k is a
  * small literal — 3 in every catalog use). Ids are unique per group, so
  * the composite order is total and the result is independent of
  * partitioning and merge order. */
final class TopKState(val k: Int) {
  val sc = new Array[Double](k)
  val wt = new Array[Long](k)
  val id = new Array[Long](k)
  var n: Int = 0

  private def precedes(s: Double, w: Long, i: Long, j: Int): Boolean =
    s > sc(j) || (s == sc(j) && (w > wt(j) || (w == wt(j) && i < id(j))))

  def add(s: Double, w: Long, i: Long): Unit = {
    if (n == k && !precedes(s, w, i, n - 1)) return
    var j = if (n == k) k - 1 else { n += 1; n - 1 }
    while (j > 0 && precedes(s, w, i, j - 1)) {
      sc(j) = sc(j - 1); wt(j) = wt(j - 1); id(j) = id(j - 1)
      j -= 1
    }
    sc(j) = s; wt(j) = w; id(j) = i
  }

  def mergeFrom(o: TopKState): Unit = {
    require(k == o.k, s"graft_topk merge of mixed k: $k vs ${o.k}")
    var i = 0
    while (i < o.n) { add(o.sc(i), o.wt(i), o.id(i)); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 24 * n)
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(sc(i)).putLong(wt(i)).putLong(id(i)); i += 1 }
    bb.array()
  }
}

object TopKState {
  def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new TopKState(bb.getInt)
    val n = bb.getInt
    var i = 0
    // entries arrive in sorted order, so add() appends in O(1) shifts
    while (i < n) { st.add(bb.getDouble, bb.getLong, bb.getLong); i += 1 }
    st
  }
}

/** `graft_topk(score double, weight bigint, id bigint, k int)` — the
  * mergeable bounded top-k aggregate: array<struct<score, weight, id>>
  * ordered by (score desc, weight desc, id asc), at most k entries.
  *
  * The native successor of the typed TopNeighbors Aggregator: a
  * TypedImperativeAggregate keeps the state as ONE JVM object per group
  * inside ObjectHashAggregate — no per-row buffer encode/decode — so the
  * per-row cost is three child evals plus one comparison for the
  * (overwhelmingly common) reject. Map-side partials reduce every group
  * to ≤k entries BEFORE the shuffle, the property that replaces a
  * per-group window sort in q_item_cooc_topk / q_ts_sliding_topk. */
case class TopKAgg(
    scoreExpr: Expression,
    weightExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with QuaternaryLike[Expression] {

  private lazy val kV = kExpr.eval().asInstanceOf[Int]

  override def first: Expression = scoreExpr
  override def second: Expression = weightExpr
  override def third: Expression = idExpr
  override def fourth: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(DoubleType, LongType, LongType, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (double score, bigint weight, bigint id, int literal k), got $got")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("weight", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKState = {
    require(kExpr.foldable, "graft_topk: k must be a literal")
    require(kV >= 1, s"graft_topk: k must be >= 1, got $kV")
    new TopKState(kV)
  }

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val w = weightExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && w != null && i != null)
      buf.add(s.asInstanceOf[Double], w.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKState, b: TopKState): TopKState = { a.mergeFrom(b); a }

  override def eval(buf: TopKState): Any =
    new GenericArrayData(Array.tabulate[Any](buf.n)(i =>
      InternalRow(buf.sc(i), buf.wt(i), buf.id(i))))

  override def serialize(buf: TopKState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKState = TopKState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): TopKAgg =
    copy(scoreExpr = f, weightExpr = s, idExpr = t, kExpr = q)
}
