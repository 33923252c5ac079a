package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram(array<bigint> m)` — the exact integer Gram accumulator:
  * Σ over rows of the outer product mᵢ·mⱼ, returned as the row-major
  * flattened dim×dim matrix (array<bigint> of length dim²; empty array
  * on empty input).
  *
  * Why an aggregate and not a plan: the declarative Gram build was a
  * corpus SELF-JOIN on vec_id of the posexploded element table — the
  * whole corpus×dim row set shuffled twice and fanned out to
  * corpus×dim² join rows before the (i, j) hash aggregate could shrink
  * it. Here the outer product is one JVM loop per row and the exchange
  * ships ONE dim²-long buffer per map-side partition (guide §2.3: the
  * partial-aggregation shape). Long addition is associative and
  * commutative, so the merged entries are bit-identical to the join
  * form's `sum(mi*mj)` — the oracle is untouched. Per-term and
  * accumulator overflow mirror the ANSI path loudly via
  * multiplyExact/addExact (the declarative form ERRORS under ANSI SQL
  * rather than wrapping). Rows with a NULL array are skipped (the
  * posexplode of a NULL array emitted nothing); dim is fixed by the
  * first row seen and ragged inputs fail loudly. dim is capped at 4096
  * (a 128 MiB buffer) — the operator's bounded-state contract. */
case class GramAgg(
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def child: Expression = mExpr

  override def checkInputDataTypes(): TypeCheckResult = mExpr.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"

  // empty = "no rows seen yet"; sized dim² once the first row fixes dim
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a0 = mExpr.eval(input)
    if (a0 == null) return buf
    val m = a0.asInstanceOf[ArrayData].toLongArray()
    val dim = m.length
    if (dim == 0) return buf
    val b =
      if (buf.length == 0) {
        require(dim <= 4096, s"graft_gram: dim must be <= 4096, got $dim")
        new Array[Long](dim * dim)
      } else {
        require(buf.length == dim * dim,
          s"graft_gram: ragged input — saw dim $dim after dim ${math.sqrt(buf.length).toInt}")
        buf
      }
    var i = 0
    while (i < dim) {
      val mi = m(i)
      val row = i * dim
      var j = 0
      while (j < dim) {
        b(row + j) = Math.addExact(b(row + j), Math.multiplyExact(mi, m(j)))
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    if (a.length == 0) return b
    require(a.length == b.length,
      s"graft_gram: ragged partials — ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(mExpr = newChild)
}
