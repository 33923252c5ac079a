package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator `graft_winnow(text, n, w, seed)`: the DISTINCT
  * winnowing fingerprints of one document as (fp) rows — fp is the
  * minimum h60 gram hash of each length-`w` window over the document's
  * word-`n`-gram hash sequence (Schleimer et al. 2003 window-min
  * selection).
  *
  * Byte-identical to the declarative chain it replaces
  * (q_docs_winnow, r12-r16 form):
  *   tk  = filter(split(text,' '), x -> x != '')          [NON-empty]
  *   h_i = graft_h60(concat(seed, ':', tk[i], ' ', tk[i+1], …))
  *   fp  = array_distinct(transform(seq, j -> array_min(slice(h, j, w))))
  * The chain paid an interpreted lambda + a concat allocation per gram
  * plus a slice allocation per window; here the gram bytes are assembled
  * once into a reusable buffer (tokens joined with single 0x20 bytes —
  * NOT the raw byte range, because empty tokens are dropped while the
  * raw text may hold runs of spaces), hashed through the reusable
  * [[FastMd5]], window minima come from one backward-scan loop, and
  * distinctness rides the [[DocGramsH60]] generation-stamped map.
  * Docs with fewer than n+w-1 non-empty tokens emit nothing — exactly
  * the `size(tk) >= n+w-1` guard the declarative form needed to keep
  * its sequence() ascending. Emission order is map order (unspecified);
  * every consumer aggregates. */
case class WinnowFps(text: Expression, nExpr: Expression, wExpr: Expression,
                     seedExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, nExpr, wExpr, seedExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.map(_.dataType) == Seq(StringType, IntegerType, IntegerType, StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_winnow expects (string text, int literal n, int literal w, string literal seed), got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def elementSchema: StructType = StructType(Seq(
    StructField("fp", LongType, nullable = false)))

  override def prettyName: String = "graft_winnow"

  @transient private lazy val nV: Int = {
    require(nExpr.foldable && wExpr.foldable && seedExpr.foldable,
      "graft_winnow: n, w and seed must be literals")
    val v = nExpr.eval().asInstanceOf[Int]
    require(v >= 1, s"graft_winnow: n must be >= 1, got $v")
    v
  }
  @transient private lazy val wV: Int = {
    val v = wExpr.eval().asInstanceOf[Int]
    require(v >= 1, s"graft_winnow: w must be >= 1, got $v")
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
    val sc = WinnowFps.tl.get()
    val tb = t0.asInstanceOf[UTF8String].getBytes
    // NON-EMPTY word boundaries (0x20 never occurs inside a multi-byte
    // UTF-8 sequence): segments between spaces, empties dropped —
    // identical to filter(split(text, ' '), x -> x != '')
    var m = 0
    var pos = 0
    var start = 0
    while (pos <= tb.length) {
      if (pos == tb.length || tb(pos) == 0x20) {
        if (pos > start) {
          if (m == sc.starts.length) {
            sc.starts = java.util.Arrays.copyOf(sc.starts, m * 2)
            sc.ends = java.util.Arrays.copyOf(sc.ends, m * 2)
          }
          sc.starts(m) = start
          sc.ends(m) = pos
          m += 1
        }
        start = pos + 1
      }
      pos += 1
    }
    if (m < nV + wV - 1) return Nil
    val grams = m - nV + 1
    // gram hash sequence: tokens i..i+n-1 joined with single spaces
    if (sc.hs.length < grams) sc.hs = new Array[Long](Integer.highestOneBit(grams) << 1)
    var maxLen = prefix.length
    var i = 0
    while (i < grams) {
      var len = nV - 1 // the n-1 joining spaces
      var j = 0
      while (j < nV) { len += sc.ends(i + j) - sc.starts(i + j); j += 1 }
      if (prefix.length + len > maxLen) maxLen = prefix.length + len
      i += 1
    }
    if (sc.buf.length < maxLen)
      sc.buf = new Array[Byte](math.max(maxLen, Integer.highestOneBit(maxLen) << 1))
    System.arraycopy(prefix, 0, sc.buf, 0, prefix.length)
    i = 0
    while (i < grams) {
      var o = prefix.length
      var j = 0
      while (j < nV) {
        if (j > 0) { sc.buf(o) = 0x20; o += 1 }
        val tl0 = sc.ends(i + j) - sc.starts(i + j)
        System.arraycopy(tb, sc.starts(i + j), sc.buf, o, tl0)
        o += tl0
        j += 1
      }
      sc.hs(i) = sc.md5.h60(sc.buf, o)
      i += 1
    }
    // window minima, distinct via the generation-stamped set
    val wins = grams - wV + 1
    sc.reset(wins)
    var jw = 0
    while (jw < wins) {
      var mn = sc.hs(jw)
      var j = 1
      while (j < wV) {
        val v = sc.hs(jw + j)
        if (v < mn) mn = v
        j += 1
      }
      sc.add(mn)
      jw += 1
    }
    sc.emit()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WinnowFps =
    copy(text = newChildren(0), nExpr = newChildren(1), wExpr = newChildren(2),
      seedExpr = newChildren(3))
}

object WinnowFps {
  /** Per-thread scratch: FastMd5, token boundary arrays, gram byte
    * buffer, gram hash array, and a generation-stamped open-addressing
    * long SET (the [[DocGramsH60]] device, keys only). */
  private final class Scratch {
    val md5 = new FastMd5
    var buf = new Array[Byte](512)
    var starts = new Array[Int](128)
    var ends = new Array[Int](128)
    var hs = new Array[Long](128)
    var keys = new Array[Long](1024)
    var stamps = new Array[Int](1024)
    var gen = 0
    var mask = 1023
    var used = 0

    def reset(expected: Int): Unit = {
      var cap = keys.length
      while (cap < expected * 2) cap <<= 1
      if (cap != keys.length) {
        keys = new Array[Long](cap)
        stamps = new Array[Int](cap)
        mask = cap - 1
      }
      if (gen == Int.MaxValue) { java.util.Arrays.fill(stamps, 0); gen = 0 }
      gen += 1
      used = 0
    }

    def add(k: Long): Unit = {
      var slot = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & mask
      while (true) {
        if (stamps(slot) != gen) {
          stamps(slot) = gen; keys(slot) = k; used += 1
          return
        } else if (keys(slot) == k) return
        slot = (slot + 1) & mask
      }
    }

    def emit(): Seq[InternalRow] = {
      val out = new Array[InternalRow](used)
      var o = 0
      var s = 0
      while (o < used) {
        if (stamps(s) == gen) { out(o) = InternalRow(keys(s)); o += 1 }
        s += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  private val tl: ThreadLocal[Scratch] = ThreadLocal.withInitial(() => new Scratch)
}
