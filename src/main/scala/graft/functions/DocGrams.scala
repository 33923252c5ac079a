package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator `graft_doc_grams(text, n, seed)`: the distinct word
  * n-grams of one document as (gh, cnt) rows, where gh is the engine's
  * 60-bit hash h60(seed, gram) and cnt the gram's in-doc occurrence
  * count.
  *
  * This is the per-document HALF of the cross-doc repeated-gram
  * aggregate (q_text_substring_dup) executed where the document already
  * is: the declarative form exploded one row per gram POSITION
  * (array_join string build + declarative md5 per gram) and needed a
  * corpus-sized (gh, doc) shuffle just to collapse in-doc repeats before
  * the real (gh) aggregate — at the 100M-row slice that is two ~3.5B-row
  * exchanges. The generator walks word boundaries on the raw UTF-8 bytes
  * (0x20 never occurs inside a multi-byte sequence, and split-by-space ≡
  * byte-splitting — the [[MinHashSig]] equivalence, pinned in
  * MinhashSpec), hashes "seed:" + the gram's exact byte range through
  * the reusable [[FastMd5]] (identical to h60 of the array_join'd slice
  * — array_join reinserts exactly the one space per boundary that split
  * consumed), and collapses repeats in a reusable open-addressing map —
  * so the only exchange left is the final (gh) aggregate, at one row per
  * DISTINCT (doc, gram).
  *
  * A 60-bit in-doc collision would merge two grams' counts — the same
  * merge the downstream (gh) aggregate applies anyway, so the output is
  * exactly the declarative form's (gh, doc) rollup. Emission order
  * within a document is map order (unspecified); every consumer is an
  * aggregate. */
case class DocGramsH60(text: Expression, nExpr: Expression, seedExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, nExpr, seedExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.map(_.dataType) == Seq(StringType, IntegerType, StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_doc_grams expects (string text, int literal n, string literal seed), got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def elementSchema: StructType = StructType(Seq(
    StructField("gh", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  override def prettyName: String = "graft_doc_grams"

  @transient private lazy val nV: Int = {
    require(nExpr.foldable && seedExpr.foldable,
      "graft_doc_grams: n and seed must be literals")
    val v = nExpr.eval().asInstanceOf[Int]
    require(v >= 1, s"graft_doc_grams: n must be >= 1, got $v")
    v
  }
  @transient private lazy val prefix: Array[Byte] = {
    val s = seedExpr.eval().asInstanceOf[UTF8String]
    val sb = s.getBytes
    val p = java.util.Arrays.copyOf(sb, sb.length + 1)
    p(sb.length) = ':'.toByte
    p
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t0 = text.eval(input)
    if (t0 == null) return Nil
    val sc = DocGramsH60.tl.get()
    val tb = t0.asInstanceOf[UTF8String].getBytes
    // word boundaries: segments between 0x20 bytes, empties included —
    // identical to split(text, ' ') (the MinHashSig walk)
    var m = 0
    var pos = 0
    var start = 0
    while (pos <= tb.length) {
      if (pos == tb.length || tb(pos) == 0x20) {
        if (m == sc.starts.length) {
          sc.starts = java.util.Arrays.copyOf(sc.starts, m * 2)
          sc.ends = java.util.Arrays.copyOf(sc.ends, m * 2)
        }
        sc.starts(m) = start
        sc.ends(m) = pos
        m += 1
        start = pos + 1
      }
      pos += 1
    }
    if (m < nV) return Nil
    val grams = m - nV + 1
    sc.reset(grams)
    if (sc.buf.length < prefix.length + tb.length) {
      val need = prefix.length + tb.length
      // highestOneBit << 1 overflows negative past 2^30 — cap at need
      sc.buf = new Array[Byte](math.max(need, java.lang.Integer.highestOneBit(need) << 1))
    }
    System.arraycopy(prefix, 0, sc.buf, 0, prefix.length)
    var i = 0
    while (i < grams) {
      val lo = sc.starts(i)
      val len = sc.ends(i + nV - 1) - lo
      System.arraycopy(tb, lo, sc.buf, prefix.length, len)
      sc.add(sc.md5.h60(sc.buf, prefix.length + len))
      i += 1
    }
    sc.emit()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DocGramsH60 =
    copy(text = newChildren(0), nExpr = newChildren(1), seedExpr = newChildren(2))
}

object DocGramsH60 {
  /** Per-thread scratch: FastMd5, boundary arrays, gram byte buffer, and
    * a generation-stamped open-addressing long→count map (no per-doc
    * clear — the stamp invalidates stale slots). */
  private final class Scratch {
    val md5 = new FastMd5
    var buf = new Array[Byte](512)
    var starts = new Array[Int](128)
    var ends = new Array[Int](128)
    var keys = new Array[Long](1024)
    var cnts = new Array[Int](1024)
    var stamps = new Array[Int](1024)
    var gen = 0
    var mask = 1023
    var used = 0

    def reset(expected: Int): Unit = {
      var cap = keys.length
      while (cap < expected * 2) cap <<= 1
      if (cap != keys.length) {
        keys = new Array[Long](cap)
        cnts = new Array[Int](cap)
        stamps = new Array[Int](cap)
        mask = cap - 1
      }
      // a wrapped generation could alias a stale stamp; clear once per
      // 2^31 documents per thread instead of once per document
      if (gen == Int.MaxValue) { java.util.Arrays.fill(stamps, 0); gen = 0 }
      gen += 1
      used = 0
    }

    def add(k: Long): Unit = {
      var slot = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & mask
      while (true) {
        if (stamps(slot) != gen) {
          stamps(slot) = gen; keys(slot) = k; cnts(slot) = 1; used += 1
          return
        } else if (keys(slot) == k) {
          cnts(slot) += 1
          return
        }
        slot = (slot + 1) & mask
      }
    }

    def emit(): Seq[InternalRow] = {
      val out = new Array[InternalRow](used)
      var o = 0
      var s = 0
      while (o < used) {
        if (stamps(s) == gen) { out(o) = InternalRow(keys(s), cnts(s).toLong); o += 1 }
        s += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  private val tl: ThreadLocal[Scratch] = ThreadLocal.withInitial(() => new Scratch)
}
