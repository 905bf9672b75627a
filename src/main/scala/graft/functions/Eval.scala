package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CLASSIFIER EVALUATION over corpus-scale prediction frames — the
  * measurement side of the quality/language/seed-classifier gates:
  * confusion matrix, per-class precision/recall/F1, and the
  * reliability (calibration) table. Everything is exact integer
  * counting with [[Stats.fixedPointExact]] ppm renderings — no
  * doubles, no DECIMAL finals, the gate-type contract by construction.
  *
  * Scale: one equi-join of predictions to truth on the id, then
  * class-squared (confusion) or bin-count (reliability) sized
  * aggregates — partial-aggregable throughout, no windows.
  */
object Eval {

  /** Confusion matrix: (true_class, pred_class, n) over the id-joined
    * prediction/truth frames — inner join, so ids missing a prediction
    * (operators that drop unscorable rows) simply don't count.
    */
  def confusion(pred: DataFrame, idCol: String, predCol: String,
      truth: DataFrame, truthCol: String): DataFrame =
    pred.select(col(idCol), col(predCol).as("pred_class"))
      .join(truth.select(col(idCol), col(truthCol).as("true_class")),
        Seq(idCol))
      .groupBy(col("true_class"), col("pred_class"))
      .agg(count(lit(1)).as("n"))

  /** Per-class metrics from a confusion matrix: (class, tp, fp, fn,
    * precision_ppm, recall_ppm, f1_ppm) with exact-integer ppm
    * renderings (F1 = 2tp/(2tp+fp+fn) — the harmonic mean collapsed to
    * one rational). Zero denominators render NULL. Classes are the
    * UNION of true and predicted labels, so a class the model never
    * predicts (or that never occurs) still gets its row.
    */
  def classMetrics(conf: DataFrame): DataFrame = {
    val classes = conf.select(col("true_class").as("class"))
      .union(conf.select(col("pred_class"))).distinct()
    val tp = conf.filter(col("true_class") === col("pred_class"))
      .select(col("true_class").as("class"), col("n").as("tp"))
    val fp = conf.filter(col("true_class") =!= col("pred_class"))
      .groupBy(col("pred_class").as("class")).agg(sum(col("n")).as("fp"))
    val fn = conf.filter(col("true_class") =!= col("pred_class"))
      .groupBy(col("true_class").as("class")).agg(sum(col("n")).as("fn"))
    def ppm(num: Column, den: Column): Column =
      when(den === 0L, lit(null).cast("long"))
        .otherwise(Stats.fixedPointExact(num, den))
    classes
      .join(tp, Seq("class"), "left")
      .join(fp, Seq("class"), "left")
      .join(fn, Seq("class"), "left")
      .select(col("class"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .select(col("class"), col("tp"), col("fp"), col("fn"),
        ppm(col("tp"), col("tp") + col("fp")).as("precision_ppm"),
        ppm(col("tp"), col("tp") + col("fn")).as("recall_ppm"),
        ppm(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1_ppm"))
  }

  /** Reliability (calibration) table: predictions bucketed by an
    * integer confidence column (truncating division by `binWidth`),
    * each bucket's exact count, correct count, and accuracy ppm —
    * accuracy rising with the bucket index IS calibration. NULL
    * confidences (e.g. single-class margins) drop out.
    * Output: (bin, n, n_correct, acc_ppm), one row per occupied bin.
    */
  def reliability(pred: DataFrame, confCol: String, correct: Column,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    pred.filter(col(confCol).isNotNull)
      .select(GroupRank.intDiv(col(confCol).cast("long"), lit(binWidth))
        .as("bin"), when(correct, 1L).otherwise(0L).as("__c"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("n_correct"))
      .select(col("bin"), col("n"), col("n_correct"),
        Stats.fixedPointExact(col("n_correct"), col("n")).as("acc_ppm"))
  }
}
