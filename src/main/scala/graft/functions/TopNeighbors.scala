package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: top-k (score, weight, id) neighbor triples ordered by
  * (score desc, weight desc, id asc) — the mergeable top-k that replaces
  * a full per-group window sort with map-side partial aggregation (the
  * [[BottomK]] contract, descending and with a composite tie-break).
  *
  * Scale design: the buffer never exceeds k triples, so every map
  * partition reduces each group to k elements BEFORE the shuffle; the
  * reduce side merges nPartitions × k triples per group instead of
  * sorting the full neighbor fan-out. For the co-occurrence workload
  * that turns an |observed pairs|-row window sort into a bounded-state
  * hash aggregate — the shape that survives a 100× item-catalog.
  *
  * Determinism: ids are unique within a group, so the composite order is
  * total and the result is independent of partitioning and merge order.
  */
class TopNeighbors(k: Int)
  extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {

  private def cap(s: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = {
    val sorted = s.sortBy { case (sc, w, id) => (-sc, -w, id) }
    if (sorted.size > k) sorted.take(k) else sorted
  }

  /** Strictly-precedes in the (score desc, weight desc, id asc) order. */
  private def precedes(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && (a._2 > b._2 || (a._2 == b._2 && a._3 < b._3)))

  override def zero: Seq[(Double, Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long, Long)], in: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    // cap() keeps the buffer sorted, so a full buffer's last element is
    // the current k-th: most rows lose that ONE comparison and skip the
    // sort+allocation entirely — the hot path for a fan-out where k of
    // thousands survive per group (sliding top-k, co-occurrence).
    if (buf.size >= k && !precedes(in, buf.last)) buf
    else cap(buf :+ in)

  override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    cap(a ++ b)

  override def finish(buf: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
