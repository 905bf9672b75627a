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

  /** Misra-Gries sketch over string items. Buffer is a plain counter map
    * (kryo-encoded; the buffer never exceeds k+1 entries).
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1)
        case None if m.size < k => m.updated(x, 1L)
        case None => // decrement-all step; drop exhausted counters
          m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = b.foldLeft(a) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (s.size <= k) s
      else {
        // subtract the (k+1)-largest count from everything, drop <= 0
        val kth = s.values.toSeq.sorted(Ordering[Long].reverse)(k)
        s.flatMap { case (i, c) => if (c > kth) Some(i -> (c - kth)) else None }
      }
    }

    override def finish(m: Map[String, Long]): Array[String] =
      m.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Exact heavy hitters in two passes: Misra-Gries candidates (bounded
    * memory, guaranteed superset of items with count > N/(k+1)), then an
    * exact count of the <= k candidates filtered by `count > N/(k+1)`.
    * Deterministic regardless of sketch merge order. The candidate list
    * (<= k strings) is the only driver-side materialization.
    * Output: (itemCol, cnt) for the true heavy hitters.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(itemCol).cast("string")).as[String]
    val cands: Array[String] =
      ds.select(new MisraGries(k).toColumn).head()
    val total = broadcast(items.agg(count(lit(1)).as("__n")))
    items.filter(col(itemCol).isin(cands.toSeq: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(total)
      .filter(col("cnt") * (k + 1) > col("__n")) // cnt > N/(k+1), exact in integers
      .select(col(itemCol), col("cnt"))
  }
}
