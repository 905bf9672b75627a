package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

import graft.functions.Freq

/** One item occurrence under its tracking key. */
case class ItemEvent(source: String, item: String)

/** A Misra-Gries candidate after a batch: estimated count and the
  * stream length so far (the threshold denominator).
  */
case class HeavyCandidate(source: String, item: String, count_est: Long,
  n_items: Long)

/** Persisted sketch: parallel arrays (a Map has no product encoder);
  * items sorted so the stored form is deterministic.
  */
case class MGSnapshot(items: Array[String], counts: Array[Long],
  n_items: Long)

/** Streaming Misra-Gries heavy hitters per key over `transformWithState`
  * — the INGEST-TIME form of [[Freq.heavyHitters]]'s first pass: each
  * key's bounded (≤ k+1-entry) counter map lives in RocksDB state and
  * folds every microbatch with EXACTLY the batch Aggregator's reduce
  * rule (the instance is reused, not reimplemented), so the streaming
  * sketch inherits its guarantee: after any prefix, every item with
  * true count > n/(k+1) is among the candidates. Per batch it emits the
  * key's current candidate set — a monitoring stream for vocabulary
  * hubs / boilerplate markers while the corpus lands, with the exact
  * confirmation pass ([[Freq.heavyHitters]]'s second scan) run over the
  * landed corpus only when a candidate matters.
  *
  * Estimates (never the guarantee) depend on fold order, exactly like
  * the batch sketch's merge order — the contract of Misra-Gries itself.
  * State per key is bounded at k+1 entries regardless of stream length.
  */
class RunningHeavyHittersProcessor(k: Int)
    extends StatefulProcessor[String, ItemEvent, HeavyCandidate] {
  require(k >= 1, s"k must be >= 1, got $k")
  @transient private var state: ValueState[MGSnapshot] = _
  private val mg = new Freq.MisraGries(k)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MGSnapshot]("mg",
      Encoders.product[MGSnapshot], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ItemEvent],
      timerValues: TimerValues): Iterator[HeavyCandidate] = {
    val start =
      if (state.exists()) {
        val s = state.get()
        (s.items.zip(s.counts).toMap, s.n_items)
      } else mg.zero
    val (m, n) = rows.foldLeft(start)((buf, e) => mg.reduce(buf, e.item))
    val sorted = m.toArray.sortBy { case (i, c) => (-c, i) }
    state.update(MGSnapshot(sorted.map(_._1), sorted.map(_._2), n))
    sorted.iterator.map { case (i, c) => HeavyCandidate(key, i, c, n) }
  }
}

object StatefulFreq {

  /** Wire a streaming (sourceCol, itemCol) frame into the per-key
    * running sketch. Null items are dropped up front (the batch
    * heavyHitters contract). Requires the RocksDB state store provider,
    * as every transformWithState operator does.
    */
  def heavyHittersStream(items: DataFrame, sourceCol: String,
      itemCol: String, k: Int): Dataset[HeavyCandidate] = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(col(sourceCol).cast("string").as("source"),
        col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[ItemEvent]
      .groupByKey(_.source)
      .transformWithState(new RunningHeavyHittersProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
