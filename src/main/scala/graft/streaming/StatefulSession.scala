package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Open-session state for the timer-based processor: event count, value
  * sum, last event time, and the currently registered timer's expiry
  * (tracked so a session-extending event can delete the stale timer
  * before registering the new one — otherwise the old timer fires early
  * and closes a still-live session).
  */
case class TwsSessionState(n: Long, sum: Double, lastMs: Long, timerMs: Long)

/** Gap-based streaming sessionization on `transformWithState` with
  * EVENT-TIME TIMERS — the Spark 4 arbitrary-state surface's timer
  * facility ([[StatefulCard]]/[[StatefulFreq]] cover ValueState under
  * TimeMode.None; this operator exercises registerTimer/deleteTimer/
  * handleExpiredTimer under TimeMode.EventTime), with the same session
  * semantics as the flatMapGroupsWithState
  * [[StreamingMedallion.sessionizeStream]]: a session closes when the
  * watermark passes (last event time + gap), and the gap rule applies
  * INSIDE a microbatch too (backlog replay delivers gap-separated bursts
  * in one batch; folding them would merge sessions the timer would have
  * split).
  *
  * Scale notes: state is one bounded row per LIVE session key (closed
  * sessions delete their state and their timer), the keyed shuffle is on
  * the user id only, and timers live in the RocksDB state store beside
  * the values — the watermark sweep that fires them is a store range
  * scan, not a per-key poll. Deterministic under replay: event-time
  * timers + append mode, the same contract as the old API's
  * EventTimeTimeout.
  */
class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, UserTimedEvent, ClosedSession] {
  @transient private var state: ValueState[TwsSessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TwsSessionState]("session",
      Encoders.product[TwsSessionState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserTimedEvent],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
    var cur: Option[TwsSessionState] =
      if (state.exists()) Some(state.get()) else None
    val hadTimer = cur.map(_.timerMs)
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs > gapMs =>
          closed += ClosedSession(key, s.n, s.sum)
          cur = Some(TwsSessionState(1L, e.value, t, 0L))
        case Some(s) =>
          cur = Some(TwsSessionState(s.n + 1, s.sum + e.value,
            math.max(s.lastMs, t), s.timerMs))
        case None =>
          cur = Some(TwsSessionState(1L, e.value, t, 0L))
      }
    }
    cur.foreach { s =>
      val expiry = s.lastMs + gapMs
      if (!hadTimer.contains(expiry)) {
        hadTimer.filter(_ > 0L).foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiry)
      }
      state.update(s.copy(timerMs = expiry))
    }
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    // A stale timer can fire if delete raced a restart; only close the
    // session if THIS timer is the one the state is waiting on.
    if (state.exists() &&
        state.get().timerMs == expiredTimerInfo.getExpiryTimeInMs) {
      val s = state.get()
      state.clear()
      Iterator.single(ClosedSession(key, s.n, s.sum))
    } else Iterator.empty
  }
}

object StatefulSession {

  /** Wire a typed event stream into the timer-based sessionizer. Append
    * mode: one row per CLOSED session; still-open sessions emit nothing
    * until their timer fires. Requires the RocksDB state store provider
    * (transformWithState's contract).
    */
  def sessionizeTws(events: Dataset[UserTimedEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
