package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EXACT daily-distinct-users — the "DAU live" panel, sealed
  * per day under the watermark: one `flatMapGroupsWithState` keyed by
  * epoch DAY, whose state is the day's user-id set; when the watermark
  * passes the day boundary no admissible arrival can still land in the
  * day, so the count seals and emits exactly once.
  *
  * Why not chained stateful operators (dedup → windowed count):
  * `dropDuplicatesWithinWatermark` only guarantees dedup WITHIN the
  * watermark delay — a user active at 09:00 and 15:00 re-admits after
  * the morning state evicts and the day double-counts them. Day-keyed
  * set state is the semantics the panel actually means, with state
  * lifetime = one day + watermark, evicted at seal.
  *
  * Scale: state per key is the day's distinct-user set (exact, the same
  * cardinality the batch distinct pays in its shuffle); at 100 TB the
  * set swaps for the KMV/HLL sketch tier — same operator shape, sealed
  * estimate instead of exact count. Keys are days, so parallelism wants
  * (day × sub-key) salting on a real cluster; the emission merge is one
  * tiny rollup of the salted seals.
  */
object StatefulDau {

  case class DauState(isSealed: Boolean, users: Set[Long])
  case class DayUsers(dayUs: Long, n_users: Long)

  private val DAY_US = 86400000000L

  private[graft] def seal(
      dayUs: Long,
      events: Iterator[(Long, Long, java.sql.Timestamp)], // (dayUs, user_id, ts)
      state: GroupState[DauState]): Iterator[DayUsers] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val st = state.getOption.getOrElse(DauState(isSealed = false, Set.empty))
    if (st.isSealed) return Iterator.empty // late stragglers of a sealed day
    val users = if (state.hasTimedOut) st.users else st.users ++ events.map(_._2)
    if (wmUs >= dayUs + DAY_US) {
      // watermark passed end-of-day: the set is complete — seal and shed
      // the user set (the sealed flag alone suppresses stragglers)
      state.update(DauState(isSealed = true, Set.empty))
      Iterator.single(DayUsers(dayUs, users.size.toLong))
    } else {
      state.update(DauState(isSealed = false, users))
      // re-fire as the watermark advances so a quiet day still seals
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      Iterator.empty
    }
  }

  /** `events` must carry a watermarked TimestampType `ts` and `user_id`. */
  def dauStream(events: DataFrame): Dataset[DayUsers] = {
    val s = events.sparkSession
    import s.implicits._
    // `ts` rides along: the watermark is attached to the event-time
    // column, and EventTimeTimeout requires it visible in the fMGWS input
    events
      .selectExpr(s"unix_micros(ts) div $DAY_US * $DAY_US as day_us", "user_id", "ts")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(seal)
  }
}
