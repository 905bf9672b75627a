package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** One (true, predicted) labeled prediction — the unit of streaming
  * confusion counting. */
case class PredPair(true_class: String, pred_class: String)

/** A confusion cell's RUNNING total after a microbatch touched it. The
  * latest row per (true, pred) key IS the cell's current count — an
  * update-mode sink (or a last-write-wins view) holds the live matrix.
  */
case class ConfusionCell(true_class: String, pred_class: String, n: Long)

/** One binned scored prediction (bin = quantized confidence, pos =
  * the prediction was correct / the label was positive). */
case class ScoredPred(bin: Long, pos: Boolean)

/** Persisted per-bin tallies. */
case class RelState(n: Long, n_pos: Long)

/** A reliability bin's running totals after a microbatch touched it. */
case class ReliabilityCell(bin: Long, n: Long, n_pos: Long)

/** Streaming CONFUSION counting over `transformWithState` — the
  * incremental form of [[graft.functions.Eval.confusion]], keyed by
  * the (true, pred) cell: each microbatch adds its rows to the cell's
  * persisted count and emits the running total. State is ONE long per
  * touched confusion cell — class²-bounded regardless of stream
  * length — so a deployed classifier's drift is measurable
  * continuously without re-scanning history: feed the latest cells to
  * [[graft.functions.Eval.classMetrics]] for live per-class P/R/F1.
  *
  * Batch parity (spec-pinned): after draining any file set, the latest
  * emitted count per cell equals Eval.confusion over the same rows
  * read as a batch. Restart continuity: counts carry across query
  * restarts through the checkpoint + RocksDB state like every
  * transformWithState operator here.
  */
class ConfusionProcessor
    extends StatefulProcessor[PredPair, PredPair, ConfusionCell] {
  @transient private var state: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: PredPair, rows: Iterator[PredPair],
      timerValues: TimerValues): Iterator[ConfusionCell] = {
    val n = (if (state.exists()) state.get() else 0L) + rows.size
    state.update(n)
    Iterator.single(ConfusionCell(key.true_class, key.pred_class, n))
  }
}

/** Streaming RELIABILITY counting — the incremental form of the
  * calibration table's (bin, n, n_pos) tallies, keyed by confidence
  * bin. State is two longs per bin — bin-domain-bounded. */
class ReliabilityProcessor
    extends StatefulProcessor[Long, ScoredPred, ReliabilityCell] {
  @transient private var state: ValueState[RelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RelState]("rel",
      Encoders.product[RelState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[ScoredPred],
      timerValues: TimerValues): Iterator[ReliabilityCell] = {
    var add = 0L
    var addPos = 0L
    rows.foreach { r => add += 1L; if (r.pos) addPos += 1L }
    val prev = if (state.exists()) state.get() else RelState(0L, 0L)
    val next = RelState(prev.n + add, prev.n_pos + addPos)
    state.update(next)
    Iterator.single(ReliabilityCell(key, next.n, next.n_pos))
  }
}

object StatefulEval {

  /** Wire a streaming (predCol, truthCol) frame into running confusion
    * cells. Null classes are excluded (the inner-join semantics of the
    * batch [[graft.functions.Eval.confusion]]). Requires the RocksDB
    * state store provider like every transformWithState operator.
    */
  def confusionStream(pred: DataFrame, predCol: String,
      truthCol: String): Dataset[ConfusionCell] = {
    val spark = pred.sparkSession
    import spark.implicits._
    pred
      .select(col(truthCol).cast("string").as("true_class"),
        col(predCol).cast("string").as("pred_class"))
      .filter(col("true_class").isNotNull && col("pred_class").isNotNull)
      .as[PredPair]
      .groupByKey(identity)
      .transformWithState(new ConfusionProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Wire a streaming (binCol, posCol) frame into running reliability
    * tallies — `binCol` any bounded integer confidence bin, `posCol`
    * a boolean correctness/label column. */
  def reliabilityStream(pred: DataFrame, binCol: String,
      posCol: String): Dataset[ReliabilityCell] = {
    val spark = pred.sparkSession
    import spark.implicits._
    pred
      .select(col(binCol).cast("long").as("bin"),
        col(posCol).cast("boolean").as("pos"))
      .filter(col("bin").isNotNull && col("pos").isNotNull)
      .as[ScoredPred]
      .groupByKey(_.bin)
      .transformWithState(new ReliabilityProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
