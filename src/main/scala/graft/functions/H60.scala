package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free kernel behind [[H60]]: md5 the UTF-8 bytes through the
  * reusable per-thread [[FastMd5]] and return the engine's 60-bit prefix.
  * Callable from generated Java (standalone object → static forwarder). */
object H60Kernel {
  private final class Scratch {
    val md5 = new FastMd5
    var buf = new Array[Byte](256)
  }
  private val tl: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  def hash(s: UTF8String): Long = {
    val sc = tl.get()
    val n = s.numBytes()
    // highestOneBit << 1 overflows negative for n > 2^30 — cap at n
    if (sc.buf.length < n)
      sc.buf = new Array[Byte](math.max(n, java.lang.Integer.highestOneBit(n) << 1))
    s.writeToMemory(sc.buf, Platform.BYTE_ARRAY_OFFSET)
    sc.md5.h60(sc.buf, n)
  }
}

/** `graft_h60(str)` — the engine's 60-bit md5 hash as a native, codegen'd
  * expression: byte-identical to the declarative
  * `cast(conv(substr(md5(str), 1, 15), 16, 10) as bigint)` chain (and to
  * DuckDB's `CAST('0x' || substr(md5(str), 1, 15) AS BIGINT)`), but with
  * zero per-row allocation — the declarative chain pays MessageDigest +
  * hex-string + substr + conv allocations on every row, which is the
  * dominant constant in gram/shingle/sketch pipelines (the FastMd5
  * finding, r15). [[graft.operators.Dedup.h60]] emits this function, so
  * every oracle-backed h60 user shares one kernel; FunctionsSpec pins
  * equality against the declarative chain on multibyte / empty /
  * block-boundary inputs. */
case class H60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 expects a string argument, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    H60Kernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60Kernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}
