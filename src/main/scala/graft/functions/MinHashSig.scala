package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass MinHash kernel, shared by the expression's eval
  * and generated code. Semantics are EXACTLY the declarative pipeline it
  * replaces (and the DuckDB oracle mirrors):
  *
  *   w        = split(text, ' ')              -- java regex, -1 limit
  *   grams    = word n-grams joined with ' '  -- duplicates harmless: min
  *   h60(g)   = first 15 hex digits of md5('m:' || g) as a 60-bit long
  *   h31      = h60 % (2^31 - 1)
  *   sig[i]   = min over grams of ((2i+1)·h31 + 12582917·i) % (2^31 - 1)
  *
  * Returns null for texts with fewer than n words (callers filter), the
  * same rows the `size(split) >= n` pre-filter drops. One md5 + k affine
  * folds per gram in a tight compiled loop — this kernel exists because
  * the higher-order-function formulation evaluates interpretively at
  * ~µs/lambda, which dominated the LSH queries' runtime (BENCH r02 wip:
  * 6.3 s → sub-second).
  */
object MinhashKernel extends Serializable {
  val P: Long = 2147483647L // Mersenne prime 2^31 - 1

  // shipped to executors as a codegen reference object: the module itself
  // java-serializes (readResolve restores the singleton), the ThreadLocal
  // must not
  @transient private lazy val tlMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of the 16-byte md5 as a long — identical to
    * conv(substr(md5hex, 1, 15), 16, 10): bytes 0..6 then the high nibble
    * of byte 7. */
  private def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Distinct word-n-grams, first-occurrence order (≡ the declarative
    * array_distinct(transform(...)) shingler); null if fewer than n words. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return null
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** MessageDigest reference implementation of [[sig]] — kept as the
    * readable spec twin (MinhashSpec pins the two equal; the declarative
    * md5() pipeline is the cross-engine contract). */
  private[graft] def sigReference(text: UTF8String, n: Int, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = tlMd.get()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      sb.append("m:")
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val h31 = h60(md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))) % P
      var t = 0
      while (t < k) {
        val hv = ((2 * t + 1) * h31 + 12582917L * t) % P
        if (hv < mins(t)) mins(t) = hv
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-thread scratch for the allocation-free sketch path: a FastMd5
    * instance, a prefix buffer for "m:" + shingle bytes, and growable
    * word-boundary index arrays. */
  private final class Scratch {
    val md5 = new FastMd5
    var buf = new Array[Byte](512)
    var starts = new Array[Int](128)
    var ends = new Array[Int](128)
  }
  @transient private lazy val tlScratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Allocation-free sketch (round 15): the shingle "w_i … w_{i+n-1}"
    * joined with single spaces is EXACTLY the original text's byte range
    * from the start of word i to the end of word i+n−1 (split(" ", -1)
    * consumes exactly one space per boundary, and 0x20 never occurs
    * inside a UTF-8 multi-byte sequence, so byte-splitting ≡
    * char-splitting). So the kernel walks word boundaries on the raw
    * UTF-8 bytes and hashes "m:" + range through [[FastMd5]] into a
    * reusable buffer — the only per-document allocations are the
    * signature array itself and (at most) one byte copy of the text.
    * Duplicate shingles need no dedup: duplicates cannot change a min.
    * Byte-identical to [[sigReference]] (MinhashSpec).
    *
    * Precondition: `text` holds VALID UTF-8 (true for anything Spark read
    * from parquet/json/csv, whose decoders replace bad sequences on
    * ingest). This path hashes the raw bytes, while [[sigReference]] and
    * the declarative md5() pipeline round-trip through String — where
    * malformed sequences become U+FFFD — so on invalid bytes the two
    * would diverge. Feeding raw binary through a bytes→string cast must
    * normalize first. */
  def sig(text: UTF8String, n: Int, k: Int): ArrayData = {
    val s = tlScratch.get()
    val tb = text.getBytes
    // word boundaries: segments between 0x20 bytes, empties included
    var m = 0
    var pos = 0
    var start = 0
    while (pos <= tb.length) {
      if (pos == tb.length || tb(pos) == 0x20) {
        if (m == s.starts.length) {
          s.starts = java.util.Arrays.copyOf(s.starts, m * 2)
          s.ends = java.util.Arrays.copyOf(s.ends, m * 2)
        }
        s.starts(m) = start
        s.ends(m) = pos
        m += 1
        start = pos + 1
      }
      pos += 1
    }
    if (m < n) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= m - n) {
      val from = s.starts(i)
      val to = s.ends(i + n - 1)
      val len = to - from + 2
      if (s.buf.length < len + 1) s.buf = new Array[Byte](math.max(len + 1, s.buf.length * 2))
      s.buf(0) = 'm'
      s.buf(1) = ':'
      System.arraycopy(tb, from, s.buf, 2, to - from)
      val h31 = s.md5.h60(s.buf, len) % P
      var t = 0
      while (t < k) {
        val hv = ((2 * t + 1) * h31 + 12582917L * t) % P
        if (hv < mins(t)) mins(t) = hv
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_shingles(text, n)`: distinct word-n-gram shingles as
  * array<string> — the compiled twin of the declarative
  * `array_distinct(transform(...))` shingler (Dedup.withShingles), null
  * for texts with fewer than n words (callers filter). First-occurrence
  * order, matching array_distinct. */
case class ShinglesExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (string, foldable int n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else MinhashKernel.shingles(t.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kernelRef = ctx.addReferenceObj(
      "minhashKernel", MinhashKernel, "graft.functions.MinhashKernel$")
    val t = left.genCode(ctx)
    val arg = s"$n"
    ev.copy(code =
      code"""
         |${t.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${t.isNull}) {
         |  ${ev.value} = $kernelRef.shingles(${t.value}, $arg);
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShinglesExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash(text, n, k)`: MinHash signature (array of k minima over
  * word-n-gram shingles) straight from the text column — n and k must be
  * foldable ints. Null on null text or fewer than n words. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType && second.foldable && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_minhash expects (string, foldable int n, foldable int k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  @transient private lazy val n: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val k: Int = third.eval().asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null
    else MinhashKernel.sig(t.asInstanceOf[UTF8String], n, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kernelRef = ctx.addReferenceObj(
      "minhashKernel", MinhashKernel, "graft.functions.MinhashKernel$")
    val t = first.genCode(ctx)
    val args = s"$n, $k"
    ev.copy(code =
      code"""
         |${t.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${t.isNull}) {
         |  ${ev.value} = $kernelRef.sig(${t.value}, $args);
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}
