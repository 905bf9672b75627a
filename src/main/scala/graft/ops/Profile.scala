package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType,
  TimestampNTZType, TimestampType}

/** ANALYZE-style table profiling: per-column row/null/distinct counts and
  * min/max, computed in ONE aggregation pass over the table and emitted
  * one row per column — the datasheet a warehouse publishes per table
  * (and the statistics a cost-based optimizer feeds on).
  *
  * Min/max renderings are type-routed for cross-engine determinism:
  * numeric columns surface as DOUBLE (`min_num`/`max_num` — exact for
  * longs below 2^53 and bit-exact for doubles), string columns as
  * strings, timestamp/date columns formatted to the fixed
  * `yyyy-MM-dd HH:mm:ss` rendering both engines reproduce. Distinct
  * counts are EXACT (count_distinct; Spark plans the multi-distinct
  * aggregate via Expand — one shuffle carrying k column streams). At
  * 100 TB a profile job swaps in approx_count_distinct's HLL per column
  * and keeps everything else unchanged; exactness here is what makes the
  * operator oracle-gateable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"no such column: $c"))

    def minMax(c: String): (Column, Column, Column, Column) =
      schema(c).dataType match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case TimestampType | TimestampNTZType | DateType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss"))
        case other =>
          throw new IllegalArgumentException(
            s"unprofilable column type for $c: ${other.sql}")
      }

    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val (mn, mx, ms, xs) = minMax(c)
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        mn.as(s"__mn_$c"), mx.as(s"__mx_$c"),
        ms.as(s"__ms_$c"), xs.as(s"__xs_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__ms_$c").as("min_str"), col(s"__xs_$c").as("max_str"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }
}
