package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_boot_sums(h1, h2, cents, k)` — the fused Poisson-bootstrap
  * accumulator: for each replicate b in [0, k), weight w_b follows the
  * engine's shared recipe (u_b = ((h1 + b·h2) mod 10⁶ + 0.5)/10⁶ against
  * the cumulative Poisson(1) CDF thresholds at 6 dp), and the buffer
  * keeps Σ w_b·cents and Σ w_b per replicate — 2k exact longs.
  *
  * Why an aggregate and not a plan: the declarative form exploded k rows
  * per event into a k-group hash aggregate (k× the corpus through the
  * exchange machinery), and the HOF transform() variant evaluates its
  * lambda INTERPRETED per element (the measured µs/lambda tax the dedup
  * screen documents) — here the whole fan-out is one JVM loop per row,
  * map-side partials carry 2k longs per partition, and the arithmetic is
  * operand-identical to the exploded form (nonneg h1/h2 make % ≡ pmod;
  * thresholds are the same parsed doubles), so the oracle is untouched.
  * Returns array<struct<swx, sw>> of length k. */
case class BootSumsAgg(
    h1Expr: Expression,
    h2Expr: Expression,
    centsExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with QuaternaryLike[Expression] {

  private lazy val kV = kExpr.eval().asInstanceOf[Int]

  override def first: Expression = h1Expr
  override def second: Expression = h2Expr
  override def third: Expression = centsExpr
  override def fourth: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(LongType, LongType, LongType, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_boot_sums expects (bigint h1, bigint h2, bigint cents, int literal k), got $got")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("swx", LongType, nullable = false),
    StructField("sw", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_boot_sums"

  override def createAggregationBuffer(): Array[Long] = {
    require(kExpr.foldable, "graft_boot_sums: k must be a literal")
    require(kV >= 1 && kV <= (1 << 16),
      s"graft_boot_sums: k must be in [1, 65536], got $kV")
    new Array[Long](2 * kV)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h1v = h1Expr.eval(input)
    val h2v = h2Expr.eval(input)
    val cv = centsExpr.eval(input)
    if (h1v == null || h2v == null || cv == null) return buf
    val h1 = h1v.asInstanceOf[Long]
    val h2 = h2v.asInstanceOf[Long]
    val c = cv.asInstanceOf[Long]
    // ADVICE r16: Java % only equals the declarative pmod on nonneg sums,
    // and under ANSI SQL (Spark 4 default) the exploded form ERRORS on an
    // overflowing h1 + b·h2 rather than wrapping — so the operand-identity
    // claim is only meaningful on the overflow-free nonneg range. Enforce
    // it loudly (the k-require discipline): h1 < 2^60 (a 60-bit digest
    // half), h2 < 2^40 ⇒ h1 + b·h2 < 2^60 + 2^56 for k ≤ 65536.
    require(h1 >= 0L && h1 < (1L << 60) && h2 >= 0L && h2 < (1L << 40),
      s"graft_boot_sums: h1 must be in [0, 2^60) and h2 in [0, 2^40) " +
        s"(overflow-free pmod range for k <= 65536); got h1=$h1 h2=$h2")
    var b = 0
    while (b < kV) {
      val u = ((h1 + b * h2) % 1000000L + 0.5) / 1000000.0
      // cumulative Poisson(1) CDF at k = 0..5, 6-dp shared literals
      val w =
        if (u < 0.367879) 0L else if (u < 0.735759) 1L
        else if (u < 0.919699) 2L else if (u < 0.981012) 3L
        else if (u < 0.996340) 4L else if (u < 0.999406) 5L else 6L
      buf(b) += w * c
      buf(kV + b) += w
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate[Any](kV)(b => InternalRow(buf(b), buf(kV + b))))

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BootSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootSumsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BootSumsAgg =
    copy(h1Expr = f, h2Expr = s, centsExpr = t, kExpr = q)
}
