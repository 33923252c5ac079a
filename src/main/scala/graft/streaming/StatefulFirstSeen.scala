package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen screen via `flatMapGroupsWithState` — the ingest
  * face of Ops.qTsNewSeries: admit exactly one event per series (user_id),
  * the one with the EARLIEST event time, so downstream day-rollups of
  * series churn match the batch `min(ts)` definition.
  *
  * "First" is a claim about event time under out-of-order arrival, so an
  * admission seals only when the watermark passes the current candidate:
  * after that, every still-admissible arrival has ts ≥ watermark >
  * candidate and cannot predate it. A `dropDuplicates(user_id)` screen —
  * the obvious shape — admits the first ARRIVAL instead, which
  * misassigns the series' first day whenever its true first event rides a
  * later microbatch; the candidate-and-seal state is what makes the
  * stream equal the batch twin, not merely approximate it.
  *
  * State per series: one (sealed, candidate) pair that persists for the
  * series' lifetime — first-seen is inherently permanent state, the same
  * cardinality the TSDB's series index already carries. At 100 TB the
  * sealed set swaps into a Bloom filter (the ingest-time GDPR index
  * machinery): false positives suppress a real first at the fp rate but
  * can never admit a duplicate, the safe direction for churn metrics.
  */
object StatefulFirstSeen {

  case class FirstState(isSealed: Boolean, candidateUs: Long)
  case class FirstSeen(user_id: Long, first_us: Long)

  private[graft] def screen(
      key: Long,
      events: Iterator[(Long, java.sql.Timestamp, Long)],
      state: GroupState[FirstState]): Iterator[FirstSeen] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val st = state.getOption.getOrElse(FirstState(isSealed = false, Long.MaxValue))
    if (st.isSealed) return Iterator.empty // later events of a known series
    var cand = st.candidateUs
    if (!state.hasTimedOut) events.foreach(e => if (e._3 < cand) cand = e._3)
    if (cand < wmUs) {
      // no admissible arrival can now be earlier — the candidate IS first
      state.update(FirstState(isSealed = true, cand))
      Iterator.single(FirstSeen(key, cand))
    } else {
      state.update(FirstState(isSealed = false, cand))
      // re-fire as the watermark advances so quiet series still seal
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      Iterator.empty
    }
  }

  /** `events` must carry a watermarked TimestampType `ts`. */
  def firstSeenStream(events: DataFrame): Dataset[FirstSeen] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "unix_micros(ts) as us")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(screen)
  }
}
