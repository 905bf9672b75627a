package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy hitters via a Misra-Gries sketch — the bounded-memory
  * frequent-items path for corpus vocabulary analysis at 100 TB, exposed
  * through Spark's typed `Aggregator` extension point (the engine's custom
  * ladder already covers scalar Expression, Generator, logical plan +
  * strategy + physical operators, and optimizer Rule; this is the custom
  * AGGREGATE rung).
  *
  * The sketch holds at most `k` counters per partial aggregate; reduce
  * decrements all counters when full (classic Misra-Gries), and merge sums
  * counter maps then subtracts the (k+1)-largest count (the mergeable-
  * summaries construction of Agarwal et al., SODA'12), preserving the
  * guarantee: every item with true count > N/(k+1) SURVIVES in the sketch,
  * and counter error is at most N/(k+1). Candidate sets therefore
  * OVERapproximate the heavy hitters, but counts are approximate and
  * merge-order-dependent — so `heavyHitters` runs the deterministic
  * two-pass shape: sketch the candidates (one bounded-memory pass), then
  * compute EXACT counts for the <= k candidates and filter by the true
  * threshold. The output is exact and engine-reproducible; only the
  * intermediate candidate set varies with partitioning, and the guarantee
  * makes that harmless.
  */
object Freq {

  /** Misra-Gries sketch over string items. Buffer is (counter map, total
    * item count) — carrying N in the buffer means the sketch pass also
    * yields the threshold denominator, saving a separate full count scan.
    * The map never exceeds k+1 entries; the whole buffer is kryo-encoded.
    * Inputs must be non-null (heavyHitters filters; a null map key would
    * NPE the sorted finish).
    */
  class MisraGries(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Array[String], Long)] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

    override def reduce(buf: (Map[String, Long], Long),
        x: String): (Map[String, Long], Long) = {
      val (m, n) = buf
      val m2 = m.get(x) match {
        case Some(c) => m.updated(x, c + 1)
        case None if m.size < k => m.updated(x, 1L)
        case None => // decrement-all step; drop exhausted counters
          m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }
      (m2, n + 1)
    }

    override def merge(a: (Map[String, Long], Long),
        b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
      val s = b._1.foldLeft(a._1) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      val m = if (s.size <= k) s
      else {
        // subtract the (k+1)-largest count from everything, drop <= 0
        val kth = s.values.toSeq.sorted(Ordering[Long].reverse)(k)
        s.flatMap { case (i, c) => if (c > kth) Some(i -> (c - kth)) else None }
      }
      (m, a._2 + b._2)
    }

    override def finish(buf: (Map[String, Long], Long)): (Array[String], Long) =
      (buf._1.keys.toArray.sorted, buf._2)

    override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
    override def outputEncoder: Encoder[(Array[String], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Long)]()
  }

  /** Exact heavy hitters in two passes: Misra-Gries candidates + total N
    * from one bounded-memory pass (guaranteed superset of items with
    * count > N/(k+1)), then an exact count of the <= k candidates
    * filtered by `count > N/(k+1)` in integer arithmetic. Deterministic
    * regardless of sketch merge order. NULL items are dropped up front
    * (they are not an "item", and counting them would tighten the
    * threshold for everything else). The candidate list (<= k strings)
    * is the only driver-side materialization.
    * Output: (itemCol, cnt) for the true heavy hitters.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    // Both passes run over the SAME cast("string") column: the sketch
    // necessarily stringifies, and filtering the original-typed column
    // with string candidates would lean on implicit comparison casts
    // (ANSI-error-prone for some types) and could conflate distinct
    // values that stringify identically between the two passes. The
    // output item column is therefore string-typed by contract.
    val strs = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    val (cands, n) = strs.as[String].select(new MisraGries(k).toColumn).head()
    strs.filter(col(itemCol).isin(cands.toSeq: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n) // cnt > N/(k+1), exact in integers
      .select(col(itemCol), col("cnt"))
  }
}
