package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.1-J): bottom-k payload ids ordered by a
  * double sort key, ties broken by id — a mergeable partial aggregate.
  *
  * Scale design: the buffer is a bounded sorted list of ≤ k (key, id)
  * pairs, so map-side partial aggregation reduces every partition to k
  * elements before the shuffle — the reduce phase merges nPartitions × k
  * elements per group, never the raw rows. This is the same
  * partial/merge/finish contract Spark's built-in aggregates use; a
  * t-digest or HLL aggregator drops into the identical shape.
  *
  * Determinism: (key, id) comparison is a total order (ids unique), so
  * the result is independent of partitioning and merge order.
  */
class BottomK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def cap(s: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val sorted = s.sorted // Tuple2 ordering: key asc, then id asc
    if (sorted.size > k) sorted.take(k) else sorted
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    cap(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    cap(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
