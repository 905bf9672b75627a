package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single right row with the greatest
  * timestamp <= the left row's timestamp within the same key (inclusive;
  * left rows with no earlier right row get NULLs). The canonical
  * time-series operator Spark lacks natively.
  *
  * Composed from built-ins (preference (a) of the custom-operator ladder):
  * union both sides, then one running `last(..., ignoreNulls)` window per
  * key ordered by (ts, side), with right rows sorting before left rows at
  * equal timestamps. The matched right row travels as ONE struct, so its
  * timestamp and value columns always come from the same row even when
  * values are NULL. Cost = one hash shuffle on the key + a per-partition
  * sort — identical to a sort-merge join, with no range-condition row
  * explosion; running state is a single struct per key, so the operator
  * holds at any scale and any key skew AQE can split.
  */
object AsOf {

  /** `left` joined as-of against `right` on `keyCol`; both ts columns must
    * be mutually comparable (same numeric/timestamp family). Matched right
    * fields are emitted as `asof_ts` and `asof_<valueCol>`. If several
    * right rows share a key+timestamp, the last one in union order wins —
    * pre-deduplicate the right side when that matters.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      valueCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val rPack = struct(
      col(rightTs).as("ts") +: valueCols.map(col): _*)
    // NULL-timestamp right rows can never be an as-of match (ASOF
    // semantics; also DuckDB), but ascending nulls-first ordering would
    // otherwise make them a spurious running match for early left rows.
    // NULL-KEY right rows are excluded for the same reason: SQL equality
    // never matches NULL = NULL, but Window.partitionBy groups NULL keys
    // into one partition, which would hand NULL-key left rows a match.
    val rU = right.filter(col(rightTs).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(rightTs).as("__ts"),
      lit(0).as("__side"), rPack.as("__rpack"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__lpack"))
    val lU = left.select(col(keyCol), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(rU.schema("__rpack").dataType).as("__rpack"),
      struct(leftCols.map(col): _*).as("__lpack"))

    // right rows (side 0) sort before left rows (side 1) at equal ts, so
    // an equal-timestamp right row is visible to its left row (inclusive).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__m", last(col("__rpack"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lpack.$c").as(c)) ++
        (col("__m.ts").as("asof_ts") +:
          valueCols.map(c => col(s"__m.$c").as(s"asof_$c"))): _*)
  }
}
