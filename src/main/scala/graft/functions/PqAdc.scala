package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_pq_adc(codes, dot_lut, norm2_lut)` — the product-quantization
  * asymmetric-distance kernel (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): approximate cosine between the
  * probe and a PQ-encoded vector from per-subspace lookup tables.
  *
  * The probe is folded into the tables driver-side (both LUTs are
  * FOLDABLE M×K matrices, evaluated once and embedded in the generated
  * code as reference objects — the NearestCentroid template):
  *
  *   dot_lut(m)(c)   = <probe_m, book_m(c)> / ||probe||
  *   norm2_lut(m)(c) = ||book_m(c)||²
  *
  * so the per-row work is M array reads and 2M adds:
  *
  *   sim ≈ Σ_m dot_lut(m)(codes(m)) / sqrt(Σ_m norm2_lut(m)(codes(m)))
  *
  * — no decode of the original vector, which is the whole point: the ADC
  * scan touches only the M-byte code column (32× smaller than the f32
  * vector at M=8, dim=64), and the kernel JITs into whole-stage codegen.
  */
case class PqAdcSim(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(IntegerType, _) =>
      val lutOk = (e: Expression) => e.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) if e.foldable => true
        case _ => false
      }
      if (lutOk(second) && lutOk(third)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc expects FOLDABLE array<array<double>> lookup tables")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects array<int> PQ codes, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val dotLut: Array[Array[Double]] = {
    val ad = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  @transient private lazy val norm2Lut: Array[Array[Double]] = {
    val ad = third.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def sim(codes: ArrayData): Double = {
    var dot = 0.0; var n2 = 0.0
    var m = 0
    val len = math.min(codes.numElements(), dotLut.length)
    while (m < len) {
      val c = codes.getInt(m)
      dot += dotLut(m)(c)
      n2 += norm2Lut(m)(c)
      m += 1
    }
    if (n2 > 0) dot / math.sqrt(n2) else 0.0
  }

  override protected def nullSafeEval(codes: Any, a: Any, b: Any): Any =
    sim(codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, _, _) => {
      val dl = ctx.addReferenceObj("pqDotLut", dotLut, "double[][]")
      val nl = ctx.addReferenceObj("pqNorm2Lut", norm2Lut, "double[][]")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val dot = ctx.freshName("dot"); val n2 = ctx.freshName("n2")
      val len = ctx.freshName("len")
      s"""
         |double $dot = 0.0; double $n2 = 0.0;
         |int $len = java.lang.Math.min($codes.numElements(), $dl.length);
         |for (int $m = 0; $m < $len; $m++) {
         |  int $c = $codes.getInt($m);
         |  $dot += $dl[$m][$c];
         |  $n2 += $nl[$m][$c];
         |}
         |${ev.value} = $n2 > 0 ? $dot / java.lang.Math.sqrt($n2) : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcSim =
    copy(first = newFirst, second = newSecond, third = newThird)
}
