package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.FixLog

/** Fixed-point log2/exp2 pair: exact powers of two, inverse round
  * trips within quantization, monotonicity, the constant ladder's
  * integer-sqrt derivation, and negative-exponent saturation.
  */
class FixLogSpec extends AnyFunSuite {

  test("log2q is exact on powers of two; exp2q is exact back") {
    for (e <- 0 to 40) {
      assert(FixLog.log2q(1L << e) == e.toLong * 65536L)
      assert(FixLog.exp2q(e.toLong * 65536L) == (1L << 20) << e)
    }
  }

  test("exp2 constant ladder: c_k = floor(2^(2^-(k+1)) * 2^20), " +
      "strictly decreasing to 2^20") {
    // spot-check against independently known values
    assert(FixLog.Exp2C(0) == 1482910L) // floor(sqrt(2) * 2^20)
    assert(FixLog.Exp2C(1) == 1246973L) // floor(2^0.25 * 2^20)
    assert(FixLog.Exp2C.length == 16)
    for (k <- 0 until 15) assert(FixLog.Exp2C(k) > FixLog.Exp2C(k + 1))
    assert(FixLog.Exp2C.last > (1L << 20))
    // each is the integer sqrt of the previous (scaled)
    for (k <- 0 until 15) {
      val c = FixLog.Exp2C(k + 1)
      assert(c * c <= (FixLog.Exp2C(k) << 20) &&
        (c + 1) * (c + 1) > (FixLog.Exp2C(k) << 20))
    }
  }

  test("round trip: exp2q(log2q(x)) ~ x * 2^20 within quantization") {
    for (x <- Seq(3L, 7L, 100L, 12345L, 999999937L)) {
      val back = FixLog.exp2q(FixLog.log2q(x))
      val target = x.toDouble * (1L << 20).toDouble
      val rel = math.abs(back - target) / target
      assert(rel < 1e-4, s"x=$x back=$back rel=$rel")
    }
  }

  test("exp2q tracks math.pow within a few ulp at 2^20 scale") {
    for (q <- Seq(-200000L, -65536L, -1L, 0L, 1L, 32768L, 100000L,
        500000L)) {
      val got = FixLog.exp2q(q)
      val want = math.pow(2.0, q.toDouble / 65536.0) * (1L << 20)
      assert(math.abs(got - want) <= math.max(4.0, want * 5e-5),
        s"q=$q got=$got want=$want")
    }
  }

  test("exp2q is monotone nondecreasing and saturates to 0 far negative") {
    val qs = (-60L to 60L).map(_ * 13337L)
    val vs = qs.map(FixLog.exp2q)
    for (w <- vs.sliding(2)) assert(w(0) <= w(1), vs.toString)
    assert(FixLog.exp2q(-62L * 65536L) == 0L)
  }
}
