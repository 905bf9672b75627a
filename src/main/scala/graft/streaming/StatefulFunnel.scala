package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** One funnel event: a user performing a named step at an event time. */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
    event_type: String)

/** Funnel outcome: emitted once per user funnel run — either completed
  * (every step reached in order) or abandoned (the watermark passed the
  * last progress + timeout with steps missing).
  */
case class FunnelResult(user_id: Long, steps_completed: Long,
    completed: Boolean, t_first: Long, t_last: Long)

/** Streaming ordered-step funnel with an abandonment timeout on
  * `transformWithState` — the third rung of the arbitrary-state ladder
  * here ([[StatefulCard]]/[[StatefulFreq]]: ValueState, TimeMode.None;
  * [[StatefulSession]]: ValueState + event-time timers; this: MAPSTATE —
  * one entry per achieved step, bounded by the step count — plus a
  * ValueState-tracked timer).
  *
  * Semantics: a user advances from step i to i+1 on the first step-(i+1)
  * event with ts STRICTLY after the step-i time (the batch
  * [[graft.functions.Events.funnel]] rule applied to the monotone
  * streaming prefix; events inside a batch are walked in event-time
  * order, so backlog replay advances correctly, while a cross-batch
  * late event cannot retro-advance — the documented streaming
  * approximation). Completing the last step emits the completed row and
  * clears state; otherwise an event-time timer at (last progress +
  * timeoutMs) fires once the watermark passes it and emits the
  * abandoned row with however many steps were reached.
  */
class FunnelProcessor(steps: Seq[String], timeoutMs: Long)
    extends StatefulProcessor[Long, FunnelEvent, FunnelResult] {
  require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
  require(timeoutMs > 0, s"timeoutMs must be > 0, got $timeoutMs")

  @transient private var reached: MapState[Int, Long] = _
  @transient private var timer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    reached = getHandle.getMapState[Int, Long]("reached",
      Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)
    timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  private def nReached: Int = {
    var n = 0
    while (reached.containsKey(n + 1)) n += 1
    n
  }

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timerValues: TimerValues): Iterator[FunnelResult] = {
    val out = scala.collection.mutable.ListBuffer.empty[FunnelResult]
    var n = nReached
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      if (n < steps.size && e.event_type == steps(n) &&
          (n == 0 || t > reached.getValue(n))) {
        reached.updateValue(n + 1, t)
        n += 1
        if (n == steps.size) {
          out += FunnelResult(key, n.toLong, completed = true,
            reached.getValue(1), t)
          reached.clear()
          if (timer.exists()) { getHandle.deleteTimer(timer.get()); timer.clear() }
          n = 0
        } else {
          if (timer.exists()) getHandle.deleteTimer(timer.get())
          getHandle.registerTimer(t + timeoutMs)
          timer.update(t + timeoutMs)
        }
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelResult] = {
    val n = nReached
    if (n > 0 && timer.exists() &&
        timer.get() == expiredTimerInfo.getExpiryTimeInMs) {
      val first = reached.getValue(1)
      val last = reached.getValue(n)
      reached.clear()
      timer.clear()
      Iterator.single(
        FunnelResult(key, n.toLong, completed = false, first, last))
    } else Iterator.empty
  }
}

object StatefulFunnel {

  /** Wire a typed funnel-event stream into the processor. Append mode:
    * one row per finished funnel run (completed or timed out). Requires
    * the RocksDB state store provider.
    */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
      timeoutMs: Long, watermarkDelay: String = "0 seconds")
      : Dataset[FunnelResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps, timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
