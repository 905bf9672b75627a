package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One doc's contribution to its source's running card. */
case class CardEvent(source: String, n_tokens: Long)

/** The running per-source datasheet row: docs and token mass seen so far. */
case class RunningCard(source: String, n_docs: Long, n_tokens: Long)

/** Running per-source corpus card over the NEW arbitrary-state API
  * (`transformWithState`, Spark 4's replacement for
  * `flatMapGroupsWithState`): per source, a single `ValueState` row
  * accumulates doc count and token mass across microbatches, and the
  * updated card is emitted every batch the source appears in — the
  * streaming form of `Quality.corpusCard`, maintained DURING ingest
  * instead of recomputed by scans over the landed corpus.
  *
  * Scale notes: state is one bounded row per source (sources are
  * mixture-sized — tens to thousands — never corpus-sized), keyed
  * shuffle only on the source id, and the RocksDB state store the API
  * requires keeps per-key state off-heap with incremental snapshots —
  * the configuration large-state streaming jobs run anyway. The
  * processor is deterministic under replay: counts fold associatively,
  * and exactly-once sink semantics come from the checkpoint as with
  * every other stateful operator here.
  *
  * `TTLConfig` is surfaced for the curation-session use (forget a
  * source's counters after inactivity); the card use wants NONE —
  * cards only grow.
  */
class RunningCardProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, CardEvent, RunningCard] {
  @transient private var state: ValueState[RunningCard] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RunningCard]("card",
      Encoders.product[RunningCard], ttl)

  override def handleInputRows(key: String, rows: Iterator[CardEvent],
      timerValues: TimerValues): Iterator[RunningCard] = {
    var cur =
      if (state.exists()) state.get()
      else RunningCard(key, 0L, 0L)
    rows.foreach { e =>
      cur = RunningCard(key, cur.n_docs + 1L, cur.n_tokens + e.n_tokens)
    }
    state.update(cur)
    Iterator.single(cur)
  }
}

object StatefulCard {

  /** Wire a streaming docs frame (sourceCol, token-count col) into the
    * running-card processor. Emits the UPDATED card row for every
    * source present in the batch (Update output mode). The session must
    * run the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...RocksDBStateStoreProvider`) — transformWithState's contract.
    */
  def runningCardStream(docs: DataFrame, sourceCol: String,
      tokenCol: String, ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningCard] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(sourceCol).cast("string").as("source"),
        col(tokenCol).cast("long").as("n_tokens"))
      .as[CardEvent]
      .groupByKey(_.source)
      .transformWithState(new RunningCardProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
