package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-slot bounded top-k state over a fixed slot grid: `slots`
  * independent (cnt desc, id asc) top-k lists in flat parallel arrays.
  * An input INTERVAL [lo, hi] offers its (cnt, id) to every slot it
  * covers — the device that replaces exploding an interval into
  * one row per covered slot before a grouped top-k: the fan-out
  * becomes a tight in-state loop whose overwhelmingly common step is
  * ONE long compare against the slot's current k-th entry, with no
  * row materialization, no hash probe, and no shuffle carrying the
  * interval length as a row multiplier. Ids are unique per slot by
  * construction in catalog uses, so the composite order is total and
  * the result is independent of partitioning and merge order. */
final class RangeTopKState(val k: Int, val slots: Int) {
  val cn = new Array[Long](slots * k)
  val id = new Array[Long](slots * k)
  val n = new Array[Int](slots)

  private def precedes(c: Long, i: Long, j: Int): Boolean =
    c > cn(j) || (c == cn(j) && i < id(j))

  def add(slot: Int, c: Long, i: Long): Unit = {
    val base = slot * k
    val sn = n(slot)
    if (sn == k && !precedes(c, i, base + k - 1)) return
    var j = if (sn == k) k - 1 else { n(slot) = sn + 1; sn }
    while (j > 0 && precedes(c, i, base + j - 1)) {
      cn(base + j) = cn(base + j - 1); id(base + j) = id(base + j - 1)
      j -= 1
    }
    cn(base + j) = c; id(base + j) = i
  }

  /** Offer (c, i) to every slot in [lo, hi] ∩ [0, slots). */
  def addRange(lo: Long, hi: Long, c: Long, i: Long): Unit = {
    // clamp BEFORE narrowing: lo in [2^31, 2^63) would wrap to a negative
    // Int slot and index out of bounds (ADVICE r16)
    var w = math.min(math.max(lo, 0L), slots.toLong).toInt
    val end = math.min(hi, (slots - 1).toLong)
    while (w <= end) { add(w, c, i); w += 1 }
  }

  def mergeFrom(o: RangeTopKState): Unit = {
    require(k == o.k && slots == o.slots,
      s"graft_range_topk merge of mixed shape: ($k,$slots) vs (${o.k},${o.slots})")
    var w = 0
    while (w < slots) {
      var j = 0
      val base = w * k
      while (j < o.n(w)) { add(w, o.cn(base + j), o.id(base + j)); j += 1 }
      w += 1
    }
  }

  def serialize(): Array[Byte] = {
    var bytes = 8
    var w = 0
    while (w < slots) { bytes += 4 + 16 * n(w); w += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(k).putInt(slots)
    w = 0
    while (w < slots) {
      bb.putInt(n(w))
      var j = 0
      val base = w * k
      while (j < n(w)) { bb.putLong(cn(base + j)).putLong(id(base + j)); j += 1 }
      w += 1
    }
    bb.array()
  }
}

object RangeTopKState {
  def deserialize(bytes: Array[Byte]): RangeTopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new RangeTopKState(bb.getInt, bb.getInt)
    var w = 0
    while (w < st.slots) {
      val sn = bb.getInt
      var j = 0
      // entries arrive in sorted order, so add() appends with O(1) shifts
      while (j < sn) { st.add(w, bb.getLong, bb.getLong); j += 1 }
      w += 1
    }
    st
  }
}

/** `graft_range_topk(lo bigint, hi bigint, cnt bigint, id bigint,
  * k int, slots int)` — the interval-offer top-k aggregate:
  * array<struct<wi, rk, id, cnt>> holding, for every slot wi in
  * [0, slots), the top-k (cnt desc, id asc) entries among all input
  * intervals covering wi, ranked 1..k. Slots with no coverage emit
  * nothing.
  *
  * Built for trailing-window leaderboards (q_ts_sliding_topk): a
  * per-key prefix-sum step function yields constant-count intervals of
  * bounded length W (every +c delta is followed by its −c within W),
  * and each step row offers its count to the ≤W grid slots it covers —
  * inside the aggregate state, not as exploded rows. Map-side partials
  * reduce each partition to ≤ slots·k entries before the shuffle, so
  * shuffle volume is partitions·slots·k, independent of both row count
  * and the window length that the explode form pays as a ×W row
  * multiplier. k and slots are literals; the state is slots·k entries
  * (two longs each), bounded at 2^22 entries (64 MiB) — far above any
  * grid a single leaderboard serves, loud beyond it. */
case class RangeTopKAgg(
    loExpr: Expression,
    hiExpr: Expression,
    cntExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    slotsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RangeTopKState] {

  private lazy val kV = kExpr.eval().asInstanceOf[Int]
  private lazy val slotsV = slotsExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] =
    Seq(loExpr, hiExpr, cntExpr, idExpr, kExpr, slotsExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(LongType, LongType, LongType, LongType, IntegerType, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_range_topk expects (bigint lo, bigint hi, bigint cnt, bigint id, " +
        s"int literal k, int literal slots), got $got")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("wi", LongType, nullable = false),
    StructField("rk", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_range_topk"

  override def createAggregationBuffer(): RangeTopKState = {
    require(kExpr.foldable && slotsExpr.foldable,
      "graft_range_topk: k and slots must be literals")
    require(kV >= 1, s"graft_range_topk: k must be >= 1, got $kV")
    require(slotsV >= 1 && slotsV.toLong * kV <= (1L << 22),
      s"graft_range_topk: slots*k = ${slotsV.toLong * kV} exceeds the " +
        "2^22-entry state bound (64 MiB); shard the grid across groups")
    new RangeTopKState(kV, slotsV)
  }

  override def update(buf: RangeTopKState, input: InternalRow): RangeTopKState = {
    val lo = loExpr.eval(input)
    val hi = hiExpr.eval(input)
    val c = cntExpr.eval(input)
    val i = idExpr.eval(input)
    if (lo != null && hi != null && c != null && i != null)
      buf.addRange(lo.asInstanceOf[Long], hi.asInstanceOf[Long],
        c.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: RangeTopKState, b: RangeTopKState): RangeTopKState = {
    a.mergeFrom(b); a
  }

  override def eval(buf: RangeTopKState): Any = {
    var total = 0
    var w = 0
    while (w < buf.slots) { total += buf.n(w); w += 1 }
    val out = new Array[Any](total)
    var o = 0
    w = 0
    while (w < buf.slots) {
      var j = 0
      val base = w * buf.k
      while (j < buf.n(w)) {
        out(o) = InternalRow(w.toLong, (j + 1).toLong, buf.id(base + j), buf.cn(base + j))
        o += 1; j += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: RangeTopKState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): RangeTopKState =
    RangeTopKState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RangeTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RangeTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeTopKAgg =
    copy(loExpr = newChildren(0), hiExpr = newChildren(1), cntExpr = newChildren(2),
      idExpr = newChildren(3), kExpr = newChildren(4), slotsExpr = newChildren(5))
}
