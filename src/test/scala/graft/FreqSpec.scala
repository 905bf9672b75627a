package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Freq

/** Misra-Gries heavy hitters: the sketch must keep every item above the
  * N/(k+1) guarantee under any partitioning (merge order), and the
  * two-pass operator must return EXACT heavy hitters.
  */
class FreqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed stream: item "h<i>" appears 2^i times for i in 1..8, plus
    * 300 singletons. N = 2+4+...+256 + 300 = 810.
    */
  private def skewed: Seq[String] =
    (1 to 8).flatMap(i => Seq.fill(1 << i)(s"h$i")) ++
      (1 to 300).map(i => s"noise$i")

  test("sketch candidates contain every item above N/(k+1), any partitioning") {
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(skewed)
    val n = data.size
    val k = 20
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(mustKeep.nonEmpty)
    for (parts <- Seq(1, 3, 13)) {
      val (candArr, total) = data.toDF("item").repartition(parts).as[String]
        .select(new Freq.MisraGries(k).toColumn).head()
      val cands = candArr.toSet
      assert(total == n)
      assert(mustKeep.subsetOf(cands), s"parts=$parts missing ${mustKeep -- cands}")
      assert(cands.size <= k, s"parts=$parts size ${cands.size}")
    }
  }

  test("heavyHitters output is exact and partitioning-independent") {
    val data = new scala.util.Random(11).shuffle(skewed)
    val n = data.size
    val k = 20
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    for (parts <- Seq(2, 7)) {
      val got = Freq.heavyHitters(
          data.toDF("item").repartition(parts), "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("degenerate inputs: uniform stream below threshold, tiny k") {
    val uniform = (1 to 100).map(i => s"u$i")
    assert(Freq.heavyHitters(uniform.toDF("item"), "item", 5).count() == 0)
    // single dominant item with k = 1
    val dom = Seq.fill(50)("top") ++ (1 to 10).map(i => s"x$i")
    val got = Freq.heavyHitters(dom.toDF("item"), "item", 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("top", 50L)))
  }

  test("null items are excluded from candidates, counts, and the threshold") {
    // 6 "a" of 10 non-null items; 90 nulls would push a below any
    // null-inclusive threshold. a must survive with its exact count.
    val data = Seq.fill(6)(Some("a")) ++ (1 to 4).map(i => Some(s"b$i")) ++
      Seq.fill(90)(None: Option[String])
    val got = Freq.heavyHitters(data.toDF("item"), "item", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 6L)))
  }
}
