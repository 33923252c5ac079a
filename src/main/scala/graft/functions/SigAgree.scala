package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: number of positions at which two
  * bigint-array columns agree — the MinHash signature-agreement count
  * behind the dedup cascade's verify-stage prefilter (est-Jaccard =
  * agree / |sig|).
  *
  * Same motivation as [[LongDotProduct]]: the HOF form
  * `size(filter(sequence(0, k-1), i -> a[i+1] = b[i+1]))` evaluates
  * interpretively at ~µs per lambda call, which is ruinous over millions
  * of candidate pairs × 64 positions (measured: the interpreted screen
  * cost more than the exact-Jaccard work it saved at the 1000× slice).
  * This generates a tight primitive long-compare loop inline in the
  * stage.
  *
  * Ragged inputs compare the common prefix; null if either input is
  * null. DedupSpec holds it equal to the HOF form.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sig_agree expects two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var c = 0L
    var i = 0
    while (i < n) { if (va.getLong(i) == vb.getLong(i)) c += 1L; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}
