package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `graft_med_mad(value)` — exact median AND median-absolute-deviation in
  * ONE aggregate: struct(n, med, mad) per group.
  *
  * Why a custom aggregate: the MAD needs |x − med| re-ranked, which the
  * built-ins can only express as percentile → broadcast-join the median
  * back → percentile again (two scans, two value-buffer shuffles), and a
  * groupByKey/mapGroups fusion pays per-row Dataset serde plus a
  * sort-based shuffle (measured 2× WORSE than the two-pass form at the
  * 100M-row slice). This aggregate keeps the hash-aggregate shape — the
  * buffer is a packed primitive Array[Double], map-side partials merge by
  * concatenation — and computes both quantiles at eval, where the group's
  * values are already local. Memory per group = the group's values:
  * exactly Spark's own exact-percentile bound, no worse.
  *
  * Determinism: values sort with java.util.Arrays.sort (the total order
  * Spark's Percentile uses), the 50th percentile interpolates with
  * Percentile's exact coefficient order ((hi−pos)·a[lo] + (pos−lo)·a[hi];
  * both coefficients are exactly 0.5 for a median), med pre-rounds at
  * 4 dp through Num.rounddD before the deviation pass, and mad rounds at
  * 4 dp — SignalSpec pins equality to the two-pass percentile form.
  * Merge is concatenation BEFORE the one sort at eval, so partial-merge
  * order cannot affect the result.
  */
case class MedMadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MedMadAgg.Buf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_med_mad expects a double column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("med", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_med_mad"

  override def createAggregationBuffer(): MedMadAgg.Buf = new MedMadAgg.Buf

  override def update(buf: MedMadAgg.Buf, input: InternalRow): MedMadAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: MedMadAgg.Buf, b: MedMadAgg.Buf): MedMadAgg.Buf = {
    a.addAll(b)
    a
  }

  override def eval(buf: MedMadAgg.Buf): Any = {
    if (buf.n == 0) return null
    val vals = buf.toArray
    java.util.Arrays.sort(vals)
    val med = graft.operators.Num.rounddD(graft.operators.Num.pct50Sorted(vals), 4)
    var i = 0
    while (i < vals.length) { vals(i) = math.abs(vals(i) - med); i += 1 }
    java.util.Arrays.sort(vals)
    val mad = graft.operators.Num.rounddD(graft.operators.Num.pct50Sorted(vals), 4)
    new GenericInternalRow(Array[Any](buf.n.toLong, med, mad))
  }

  override def serialize(buf: MedMadAgg.Buf): Array[Byte] = {
    // 4 + n*8 overflows Int for n ≥ ~268M; fail loudly at the bound with
    // the per-group value-buffer limit named (the convention elsewhere)
    // instead of letting ByteBuffer.allocate throw on a negative size
    require(buf.n <= (Int.MaxValue - 4) / 8,
      s"graft_med_mad: per-group value buffer (${buf.n} values) exceeds the " +
        "serializable bound of (Int.MaxValue - 4) / 8 values per group")
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MedMadAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MedMadAgg.Buf
    buf.values = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { buf.values(i) = bb.getDouble; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MedMadAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MedMadAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MedMadAgg =
    copy(child = newChild)
}

object MedMadAgg {
  /** Growable packed double buffer (no boxing, concat-merge). */
  final class Buf {
    var values = new Array[Double](16)
    var n = 0
    def add(v: Double): Unit = {
      if (n == values.length) values = java.util.Arrays.copyOf(values, n * 2)
      values(n) = v
      n += 1
    }
    def addAll(o: Buf): Unit = {
      if (n + o.n > values.length)
        values = java.util.Arrays.copyOf(values, math.max(n + o.n, n * 2))
      System.arraycopy(o.values, 0, values, n, o.n)
      n += o.n
    }
    def toArray: Array[Double] = java.util.Arrays.copyOf(values, n)
  }
}
