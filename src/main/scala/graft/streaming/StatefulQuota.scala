package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** One quota-metered request: key (domain / tenant / source), event
  * time in micros, and the units it asks for (bytes, documents — any
  * additive cost).
  */
case class QuotaEvent(key: String, ts_us: Long, units: Long)

/** The admission decision for one event, with the bucket's state after
  * it (tokens in micro-units to keep refill arithmetic integral).
  */
case class QuotaDecision(key: String, ts_us: Long, units: Long,
  admitted: Boolean, tokens_after_micro: Long)

/** Persisted bucket: micro-unit token balance at `last_us`. */
case class BucketState(tokens_micro: Long, last_us: Long)

/** Per-key TOKEN-BUCKET rate limiting over `transformWithState` — the
  * ingestion-side admission control a multi-tenant 100 TB pipeline
  * puts in front of expensive stages (crawl fetches per domain,
  * decode/enrich quota per source): each key's bucket refills at
  * `ratePerSec` units/second up to `burst` units; an event is admitted
  * iff the bucket holds its full unit cost at the event's time, and
  * admission debits it. State is two longs per key in RocksDB —
  * bounded regardless of stream length.
  *
  * Deterministic integer arithmetic: balances are micro-units, refill
  * is (elapsed_us · ratePerSec) micro-units per event gap (exact —
  * micros × per-second rate IS micro-units), capped at burst·1e6.
  * Within a microbatch each key's events are processed in (ts, units)
  * order, so a replayed batch admits the identical subset; timestamps
  * must be nondecreasing per key across batches for cross-batch
  * determinism (an out-of-order event simply gets no refill — time
  * never runs backwards, the conservative reading).
  */
class TokenBucketProcessor(ratePerSec: Long, burst: Long)
    extends StatefulProcessor[String, QuotaEvent, QuotaDecision] {
  require(ratePerSec >= 1, s"ratePerSec must be >= 1, got $ratePerSec")
  require(burst >= 1, s"burst must be >= 1, got $burst")
  @transient private var state: ValueState[BucketState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[BucketState]("bucket",
      Encoders.product[BucketState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[QuotaEvent],
      timerValues: TimerValues): Iterator[QuotaDecision] = {
    val capMicro = burst * 1000000L
    var bucket =
      if (state.exists()) state.get()
      else BucketState(capMicro, Long.MinValue)
    val out = rows.toArray.sortBy(e => (e.ts_us, e.units))
      .map { e =>
        val elapsed =
          if (bucket.last_us == Long.MinValue) 0L
          else math.max(0L, e.ts_us - bucket.last_us)
        // clamp the idle gap at "enough to fill the bucket" BEFORE the
        // multiply: a ~100-day gap at a byte-rate quota would overflow
        // elapsed * ratePerSec to a negative balance
        val fillGap = capMicro / ratePerSec + 1L
        val refilled = math.min(capMicro,
          bucket.tokens_micro + math.min(elapsed, fillGap) * ratePerSec)
        val cost = e.units * 1000000L
        val admitted = refilled >= cost
        val after = if (admitted) refilled - cost else refilled
        bucket = BucketState(after, math.max(bucket.last_us, e.ts_us))
        QuotaDecision(key, e.ts_us, e.units, admitted, after)
      }
    state.update(bucket)
    out.iterator
  }
}

object StatefulQuota {

  /** Wire a streaming (keyCol, tsUsCol, unitsCol) frame into per-key
    * token buckets. Requires the RocksDB state store provider like
    * every transformWithState operator.
    */
  def rateLimit(events: DataFrame, keyCol: String, tsUsCol: String,
      unitsCol: String, ratePerSec: Long,
      burst: Long): Dataset[QuotaDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(tsUsCol).cast("long").as("ts_us"),
        col(unitsCol).cast("long").as("units"))
      .filter(col("key").isNotNull && col("ts_us").isNotNull &&
        col("units").isNotNull && col("units") >= 0L)
      .as[QuotaEvent]
      .groupByKey(_.key)
      .transformWithState(new TokenBucketProcessor(ratePerSec, burst),
        TimeMode.None(), OutputMode.Append())
  }
}
