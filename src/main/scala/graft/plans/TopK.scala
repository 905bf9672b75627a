package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bounded top-k per key — the operator a window `row_number() <= k` can't
  * express efficiently: the window formulation shuffles and sorts EVERY row
  * of every key, while this operator truncates to k rows per key on the map
  * side first, so the shuffle carries at most k rows per (partition, key).
  * For corpus-scale "best k per group" (top documents per bucket, top
  * neighbors per query) that map-side truncation is the difference between
  * shuffling the corpus and shuffling k x keys rows.
  *
  * Two phases, both bounded-memory (one k-sized heap per key per open
  * partition):
  *   1. per-partition: hash map of bounded min-heaps keyed by the group
  *   2. repartition by key, then the same bounded merge per key
  * Output adds a `rank` column (1 = best). Ordering is (orderCol
  * direction, then tieCol ascending) — deterministic for stable tieCols.
  */
object TopK {

  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    require(k > 0)
    val schema = df.schema
    val outSchema = StructType(schema.fields :+
      StructField("rank", LongType, nullable = false))
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(orderCol)
    val tieIdx = schema.fieldIndex(tieCol)

    // Orders rows best-first; the heap keeps the WORST retained row on top.
    val better: (Row, Row) => Boolean = { (a, b) =>
      val oa = a.getAs[Any](ordIdx); val ob = b.getAs[Any](ordIdx)
      val c = compareAny(oa, ob)
      if (c != 0) { if (descending) c > 0 else c < 0 }
      else compareAny(a.getAs[Any](tieIdx), b.getAs[Any](tieIdx)) < 0
    }
    val heapOrd = new Ordering[Row] {
      // min-heap of "goodness": head is the worst retained row
      def compare(a: Row, b: Row): Int =
        if (better(a, b)) 1 else if (better(b, a)) -1 else 0
    }

    // Group keys must have value equality: a raw Array[Byte] (BinaryType
    // column) has identity equals/hashCode, which would make every row its
    // own group — no truncation, every rank 1. Wrap arrays in a Seq view.
    def groupKey(r: Row): Seq[Any] = keyIdx.map { i =>
      r.getAs[Any](i) match {
        case bytes: Array[Byte] => bytes.toSeq
        case other => other
      }
    }

    def localTopK(it: Iterator[Row]): Iterator[Row] = {
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val key = groupKey(r)
        val h = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[Row](heapOrd.reverse))
        if (h.size < k) h.enqueue(r)
        else if (better(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    val enc = Encoders.row(schema)
    val partial = df.mapPartitions(localTopK _)(enc)
    val merged = partial
      .repartition(keyCols.map(col): _*)
      .mapPartitions(localTopK _)(enc)

    // Final per-key rank assignment (k rows per key at this point).
    val rank: Iterator[Row] => Iterator[Row] = { it =>
      val byKey = it.toSeq.groupBy(groupKey)
      byKey.valuesIterator.flatMap { rows =>
        rows.sortWith(better).zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (i + 1L))
        }
      }
    }
    merged.mapPartitions(rank)(Encoders.row(outSchema))
  }

  private def compareAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: java.lang.Comparable[_], y) =>
      x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"unsupported ordering type: ${a.getClass}")
  }
}
