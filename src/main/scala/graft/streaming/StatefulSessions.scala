package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state primitive for semantics that `session_window` can't
  * express (here it CAN, which is the point: three independent
  * implementations of the same 30-minute-gap rule — gaps-and-islands
  * windows (batch), native session_window (stream), and this explicit
  * state machine — must agree, and the parity suite holds them to it).
  *
  * State per user: the open session (start, last-seen, count), µs epochs.
  * On each microbatch the group's events are sorted (arrival order within
  * a batch is unspecified), folded into the open session, closed sessions
  * emitted. An event-time timeout at (last + gap) beyond the watermark
  * closes idle sessions without new data — bounded state, the only shape
  * that survives an unbounded feed.
  */
object StatefulSessions {

  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, s_start_us: Long, n_events: Long, dur_s: Long)

  val gapUs: Long = 30L * 60 * 1000000

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, s.startUs,  s.n,
      s.lastUs / 1000000 - s.startUs / 1000000)

  def sessionize(userId: Long, events: Iterator[(Long, java.sql.Timestamp, Long)],
                 state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }
    val ts = events.map(_._3).toArray.sorted
    var open = state.getOption.orNull
    val out = Seq.newBuilder[ClosedSession]
    ts.foreach { t =>
      open match {
        case null =>
          open = OpenSession(t, t, 1)
        case s if t - s.lastUs > gapUs =>
          out += close(userId, s)
          open = OpenSession(t, t, 1)
        case s =>
          // late duplicate inside the session window extends it
          open = s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1)
      }
    }
    if (open != null) {
      state.update(open)
      state.setTimeoutTimestamp(open.lastUs / 1000 + gapUs / 1000) // ms
    }
    out.result().iterator
  }

  /** Streaming face: events must carry a watermarked TimestampType `ts`
    * (the watermarked column must survive into the stateful operator's
    * input row for event-time timeouts to be allowed — hence ts rides
    * along beside its µs projection). */
  def sessionsStream(events: DataFrame): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "unix_micros(ts) as us")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionize)
  }
}
