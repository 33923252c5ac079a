package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Native generator `graft_arr_pairs(array<bigint>)`: every
  * position-ordered pair (arr[i], arr[j]) with i < j as (id_a, id_b)
  * rows — the in-bucket pair expansion of the basket/bucket operators
  * (q_item_cooc_topk baskets, expandBucketPairs small buckets).
  *
  * Replaces the interpreted triangle HOF
  * `flatten(transform(seq, j -> transform(slice(ids, 1, j), ...)))`,
  * which paid a lambda invocation + a struct and two array allocations
  * per PAIR. The emitted pair multiset is identical (same (i, j)
  * positions, different emission order); every consumer aggregates or
  * distincts, so order is immaterial. Null or sub-2-element arrays emit
  * nothing. Quadratic per row by construction — the caller bounds the
  * array (basket size / maxBucket tiling), exactly as it bounded the
  * HOF. */
case class ArrPairs(arr: Expression) extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(arr)

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_arr_pairs expects array<bigint>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))

  override def prettyName: String = "graft_arr_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a0 = arr.eval(input)
    if (a0 == null) return Nil
    val ad = a0.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n < 2) return Nil
    val xs = ad.toLongArray()
    // ADVICE r17: n*(n-1)/2 in Int wraps negative past ~65k elements
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue,
      s"graft_arr_pairs: $n elements yield $nPairs pairs > Int.MaxValue — " +
        "bound the group (bucket or cap the per-key list) before pairing")
    val out = new Array[InternalRow](nPairs.toInt)
    var o = 0
    var i = 0
    while (i < n - 1) {
      val x = xs(i)
      var j = i + 1
      while (j < n) {
        out(o) = InternalRow(x, xs(j))
        o += 1; j += 1
      }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrPairs =
    copy(arr = newChildren(0))
}
