package graft

import scala.collection.mutable.ListBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PlanMemo

/** The single-slot plan-keyed memo behind the shared Suffix/NB/dedup
  * chains: hit-vs-evict semantics, free hooks, and hook-failure
  * swallowing (a stopped context's blocks are already gone).
  */
class PlanMemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same key hits, key change evicts and frees the old value, " +
      "release frees and empties") {
    val freed = ListBuffer[Int]()
    val memo = PlanMemo[Int](v => freed += v)
    var builds = 0
    def build(v: Int): Int = { builds += 1; v }
    assert(memo.getOrBuild(spark, Seq("k1"))(build(1)) == 1)
    assert(memo.getOrBuild(spark, Seq("k1"))(build(99)) == 1,
      "second call with the same key must return the memoized value")
    assert(builds == 1, "the hit must not re-run the build")
    assert(memo.getOrBuild(spark, Seq("k2"))(build(2)) == 2)
    assert(freed.toSeq == Seq(1), "eviction frees the displaced value")
    assert(memo.isOccupied)
    memo.release()
    assert(freed.toSeq == Seq(1, 2))
    assert(!memo.isOccupied)
    memo.release() // idempotent on empty
    assert(freed.toSeq == Seq(1, 2))
  }

  test("a throwing free hook is swallowed; the slot still advances") {
    val memo = PlanMemo[Int](_ => throw new IllegalStateException("gone"))
    assert(memo.getOrBuild(spark, Seq("a"))(1) == 1)
    assert(memo.getOrBuild(spark, Seq("b"))(2) == 2,
      "evict of a dead value must not propagate its unpersist failure")
    memo.release()
    assert(!memo.isOccupied)
  }

  test("distinct evict/release hooks: NB keeps lazy views alive on " +
      "evict but frees on explicit release") {
    val evicted = ListBuffer[Int]()
    val released = ListBuffer[Int]()
    val memo = new PlanMemo[Int](evicted += _, released += _)
    memo.getOrBuild(spark, Seq(1))(10)
    memo.getOrBuild(spark, Seq(2))(20)
    assert(evicted.toSeq == Seq(10) && released.isEmpty)
    memo.release()
    assert(released.toSeq == Seq(20))
  }

  test("a failed build leaves the previous slot intact") {
    val memo = PlanMemo[Int](_ => ())
    memo.getOrBuild(spark, Seq("x"))(7)
    intercept[RuntimeException] {
      memo.getOrBuild(spark, Seq("y"))(throw new RuntimeException("boom"))
    }
    assert(memo.getOrBuild(spark, Seq("x"))(8) == 7,
      "the old value must survive a failed replacement build")
  }
}
