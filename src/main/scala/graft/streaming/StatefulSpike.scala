package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming week-over-week spike detection — the live face of
  * Sre.qTsSpikeRatio: each (event_type, hour-of-day) cell's daily count
  * compares against the mean of the SAME hour over the previous 7
  * calendar days, sealed per day under the watermark.
  *
  * State per (type, hod) key is a day-index → count map over the grid
  * (absent days are real zeros, exactly like the batch query's gap-filled
  * calendar): a cell seals when the watermark passes ITS hour's end on
  * that day, at which point its 7 predecessor cells sealed a day or more
  * ago and the baseline is final — so each emission is exact and
  * exactly-once (`sealedThrough` advances monotonically; days older than
  * the baseline window evict, bounding state at 8 entries + the open
  * tail). Day-keyed sealing is the same device as StatefulDau; what this
  * adds is the RING of trailing sealed days feeding each new seal's
  * baseline.
  */
object StatefulSpike {

  private val DAY_US = 86400000000L
  private val HOUR_US = 3600000000L
  /** Grid origin, identical to the batch query's calendar grid. */
  private val GRID0_US = 1704067200000000L // 2024-01-01 00:00:00 UTC

  case class SpikeState(sealedThrough: Long, counts: Map[Long, Long])
  case class SpikeRow(event_type: String, dday: java.sql.Date, hod: Long,
                      x: Long, base: Double, ratio: Double, spike: Long)

  private def r4(x: Double): Double = {
    val m = math.floor(math.abs(x) * 1e4 + 0.5) / 1e4
    if (x < 0) -m else m
  }

  private[graft] def seal(
      key: (String, Long),
      events: Iterator[(String, Long, Long, java.sql.Timestamp)], // (type, hod, dayIdx, ts)
      state: GroupState[SpikeState]): Iterator[SpikeRow] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val st = state.getOption.getOrElse(SpikeState(-1L, Map.empty))
    var counts = st.counts
    if (!state.hasTimedOut)
      events.foreach { e => counts = counts.updated(e._3, counts.getOrElse(e._3, 0L) + 1L) }
    val (etype, hod) = key
    def cellEndUs(d: Long) = GRID0_US + d * DAY_US + (hod + 1L) * HOUR_US
    val out = scala.collection.mutable.ArrayBuffer.empty[SpikeRow]
    var d = st.sealedThrough + 1
    while (cellEndUs(d) <= wmUs) {
      // the 7 predecessor cells sealed earlier; absent days are zeros
      val s7 = (d - 7 to d - 1).map(counts.getOrElse(_, 0L)).sum
      if (d >= 7 && s7 > 0) {
        val x = counts.getOrElse(d, 0L)
        val base = r4(s7.toDouble / 7.0)
        val ratio = r4(x.toDouble * 7.0 / s7.toDouble)
        out += SpikeRow(etype,
          java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
          hod, x, base, ratio, if (ratio >= 2.0) 1L else 0L)
      }
      d += 1
    }
    val sealedThrough = d - 1
    // evict everything older than the newest baseline window
    counts = counts.filter { case (day, _) => day >= sealedThrough - 7 }
    state.update(SpikeState(sealedThrough, counts))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    out.iterator
  }

  /** `events` must carry a watermarked TimestampType `ts`. */
  def spikeStream(events: DataFrame): Dataset[SpikeRow] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr(
        "event_type",
        s"unix_micros(ts) % $DAY_US div $HOUR_US as hod",
        s"(unix_micros(ts) - ${GRID0_US}L) div $DAY_US as day_idx",
        "ts")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(e => (e._1, e._2))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(seal)
  }
}
