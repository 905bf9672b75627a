package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Events

/** Event analytics: funnel strict ordering, cohort retention arithmetic,
  * gap-filled resampling, and SCD2 interval semantics on hand fixtures.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def usOf(s: String): Long = ts(s).getTime * 1000L

  test("funnel: strict order, missed steps stay NULL from there on") {
    val ev = Seq(
      // u1 completes all three in order
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 00:01:00"),
      (1L, "purchase", "2024-01-01 00:02:00"),
      // u2: purchase BEFORE click — funnel stops after click
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-01 00:00:30"),
      (2L, "click", "2024-01-01 00:01:00"),
      // u3: click exactly AT signup time — strict > means not advanced
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-01 00:00:00"),
      // u4 never signs up — not in the funnel at all
      (4L, "click", "2024-01-01 00:00:00")
    ).map { case (u, t, w) => (u, t, ts(w)) }.toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val byU = out.map(r => r._1 -> r).toMap
    assert(byU(1L)._5 === 3L)
    assert(byU(1L)._3 === Some(usOf("2024-01-01 00:01:00")))
    assert(byU(2L)._5 === 2L) // click reached (after signup), purchase not
    assert(byU(2L)._4 === None)
    assert(byU(3L)._5 === 1L) // simultaneous click does not advance
    assert(byU(3L)._3 === None)
  }

  test("retention counts each user once per active period") {
    val day = 86400000000L
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 12:00:00"), // day 0 twice
      (1L, "2024-01-03 00:00:00"), // day 2
      (2L, "2024-01-02 00:00:00"), (2L, "2024-01-03 00:00:00")
    ).map { case (u, w) => (u, ts(w)) }.toDF("user_id", "ts")
    val out = Events.retention(ev, "user_id", "ts", day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d0 = usOf("2024-01-01 00:00:00") / day
    val d1 = usOf("2024-01-02 00:00:00") / day
    // u1 cohort d0 active offsets {0, 2}; u2 cohort d1 offsets {0, 1}
    assert(out === Map((d0, 0L) -> 1L, (d0, 2L) -> 1L,
      (d1, 0L) -> 1L, (d1, 1L) -> 1L))
  }

  test("resampleFill: dense grid, zero gaps, forward-filled sums") {
    val day = 86400000000L
    val ev = Seq(
      (1L, "2024-01-01 06:00:00", 2.0), (1L, "2024-01-01 18:00:00", 3.0),
      (1L, "2024-01-04 00:00:00", 10.0) // days 1-2 are gaps
    ).map { case (u, w, v) => (u, ts(w), v) }.toDF("user_id", "ts", "value")
    val out = Events.resampleFill(ev, "user_id", "ts", "value", day)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1) - usOf("2024-01-01 00:00:00") / day,
        r.getLong(2), Option(r.get(3)), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 2L, Some(5.0), 5.0),
      (1L, 0L, None, 5.0),
      (2L, 0L, None, 5.0),
      (3L, 1L, Some(10.0), 10.0)))
  }

  test("scd2 collapses repeats and closes intervals at the next change") {
    val ev = Seq(
      (1L, 10L, "a", "2024-01-01 00:00:00"),
      (1L, 11L, "a", "2024-01-01 01:00:00"), // repeat — collapses
      (1L, 12L, "b", "2024-01-01 02:00:00"),
      (1L, 13L, "a", "2024-01-01 03:00:00"), // back to a: NEW interval
      (2L, 20L, "x", "2024-01-01 00:00:00")
    ).map { case (u, i, st, w) => (u, i, st, ts(w)) }
      .toDF("user_id", "event_id", "state", "ts")
    val out = Events.scd2(ev, "user_id", "state", "ts", "event_id")
      .orderBy("user_id", "valid_from_us")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
    def u(s: String) = usOf(s)
    assert(out.toSeq === Seq(
      (1L, "a", u("2024-01-01 00:00:00"), Some(u("2024-01-01 02:00:00")), false),
      (1L, "b", u("2024-01-01 02:00:00"), Some(u("2024-01-01 03:00:00")), false),
      (1L, "a", u("2024-01-01 03:00:00"), None, true),
      (2L, "x", u("2024-01-01 00:00:00"), None, true)))
  }

  test("markovTransitions: per-user adjacency, exact row-normalized p") {
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"),
      (1L, 2L, "b", "2024-01-01 00:01:00"),
      (1L, 3L, "a", "2024-01-01 00:02:00"),
      (2L, 4L, "a", "2024-01-01 00:00:00"),
      (2L, 5L, "b", "2024-01-01 00:01:00"),
      (3L, 6L, "a", "2024-01-01 00:00:00"),
      (3L, 7L, "a", "2024-01-01 00:01:00"))
      .map { case (u, id, t, w) => (u, id, t, ts(w)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Events.markovTransitions(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from a: (a->b) x2, (a->a) x1; from b: (b->a) x1
    assert(got(("a", "b")) == ((2L, 666667L)))
    assert(got(("a", "a")) == ((1L, 333333L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    // no cross-user pair: (b from u2) never chains into u3's events
    assert(got.size == 3)
  }

  test("kaplanMeier: censoring shrinks the risk set without deaths; " +
      "total extinction pins survival to zero") {
    def ev(rows: (Long, String)*) =
      rows.map { case (u, day) => (u, "e", ts(s"$day 12:00:00")) }
        .toDF("user_id", "event_type", "ts")
    // u1 dies at T=0; u2,u3 die at T=2; u4 (T=8), u5 (T=9) end on the
    // last observed day -> censored. S(0) = 4/5, S(2) = 4/5 * 2/4.
    val e = ev((1L, "2024-01-01"),
      (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-01"), (3L, "2024-01-03"),
      (4L, "2024-01-02"), (4L, "2024-01-10"),
      (5L, "2024-01-01"), (5L, "2024-01-10"))
    val got = Events.kaplanMeier(e, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(0L, 2L))   // death times only
    assert(got(0L)._1 == 5L && got(0L)._2 == 1L)
    assert(got(2L)._1 == 4L && got(2L)._2 == 2L)
    // q16 log/exp chain lands within ~100 ppm of the exact rational
    assert(math.abs(got(0L)._3 - 800000L) <= 100L, got(0L))
    assert(math.abs(got(2L)._3 - 400000L) <= 100L, got(2L))
    // all at-risk users dying at one step -> exact 0 from there on
    val ext = ev((1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-03"))
    val z = Events.kaplanMeier(ext, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(z == Map(1L -> ((2L, 2L, 0L))))
  }

  test("entropyRate: deterministic chain = 0, fair alternative = 1 bit") {
    // user 1: a->b->a->b (deterministic successor per state) -> H = 0
    val det = Seq((1L, 1L, "a", "2024-01-01 00:00:00"),
      (1L, 2L, "b", "2024-01-01 00:01:00"),
      (1L, 3L, "a", "2024-01-01 00:02:00"),
      (1L, 4L, "b", "2024-01-01 00:03:00"))
      .map { case (u, id, t, w) => (u, id, t, ts(w)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val d = Events.entropyRate(det, "user_id", "event_type", "ts",
      "event_id").collect()(0)
    assert(d.getLong(0) == 3L && d.getLong(2) == 0L
      && d.getDouble(3) == 0.0)
    // from 'a' the successor is b or c with equal counts -> exactly
    // 1 bit per transition (log2q is exact on powers of two)
    val fair = Seq((1L, 1L, "a", "2024-01-01 00:00:00"),
      (1L, 2L, "b", "2024-01-01 00:01:00"),
      (2L, 3L, "a", "2024-01-01 00:00:00"),
      (2L, 4L, "c", "2024-01-01 00:01:00"))
      .map { case (u, id, t, w) => (u, id, t, ts(w)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val f = Events.entropyRate(fair, "user_id", "event_type", "ts",
      "event_id").collect()(0)
    assert(f.getLong(0) == 2L && f.getDouble(3) == 1.0)
  }

  test("seqPatterns: distinct-user support, in-order grams, top-k order") {
    val ev = Seq(
      (1L, 1L, "x", "2024-01-01 00:00:00"),
      (1L, 2L, "y", "2024-01-01 00:01:00"),
      (1L, 3L, "z", "2024-01-01 00:02:00"),
      (1L, 4L, "x", "2024-01-01 00:03:00"),
      (1L, 5L, "y", "2024-01-01 00:04:00"),
      (2L, 6L, "x", "2024-01-01 00:00:00"),
      (2L, 7L, "y", "2024-01-01 00:01:00"),
      (2L, 8L, "z", "2024-01-01 00:02:00"))
      .map { case (u, id, t, w) => (u, id, t, ts(w)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Events.seqPatterns(ev, "user_id", "event_type", "ts",
        "event_id", k = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // x->y->z seen by both users; support-1 ties break by pattern asc
    assert(got.toSeq == Seq(("x->y->z", 2L, 2L), ("y->z->x", 1L, 1L)))
    // a second occurrence within ONE user raises occurrences, not
    // support
    val dup = ev.unionByName(Seq((1L, 9L, "z", ts("2024-01-01 00:05:00")))
      .toDF("user_id", "event_id", "event_type", "ts"))
    val d = Events.seqPatterns(dup, "user_id", "event_type", "ts",
        "event_id", k = 3, topK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(d.toSeq == Seq(("x->y->z", 2L, 3L)))
  }

  test("logRank: hand-computed hypergeometric terms with censoring") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // u1(arm1) lives [0,2] dies t=2; u2(arm1) [0,4] censored (corpus max);
    // u3(arm0) [0,2] dies 2; u4(arm0) [0,3] dies 3; u5(arm0) [0,4] censored
    val rows = Seq(
      (1L, 1L, day(0)), (1L, 1L, day(2)),
      (2L, 1L, day(0)), (2L, 1L, day(4)),
      (3L, 0L, day(0)), (3L, 0L, day(2)),
      (4L, 0L, day(0)), (4L, 0L, day(3)),
      (5L, 0L, day(0)), (5L, 0L, day(4)))
      .toDF("user_id", "arm", "ts")
    val r = Events.logRank(rows, "user_id", "arm", "ts").collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_deaths_a") == 1L)
    assert(r.getAs[Long]("n_deaths_b") == 2L)
    // t=2: e1 = ppm(2*2/5) = 800000, v = ppm(36/100) = 360000
    // t=3: e1 = ppm(1/3) = 333333, v = ppm(4/18) = 222222
    assert(r.getAs[Long]("o_minus_e_ppm") == 1000000L - 1133333L)
    assert(r.getAs[Long]("var_ppm") == 582222L)
    assert(r.getAs[Long]("z2_ppm") == 30534L)
  }

  test("logRank: identical arms give near-zero statistic") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // two identical cohorts: every per-time O-E term cancels exactly
    val rows = (0 until 6).flatMap { i =>
      val arm = (i % 2).toLong // same lifetime pattern in both arms
      val life = 1 + (i / 2)
      Seq((i.toLong, arm, day(0)), (i.toLong, arm, day(life)))
    } :+ ((100L, 0L, day(5))) :+ ((101L, 1L, day(5))) // censored pair
    val df = rows.toDF("user_id", "arm", "ts")
    val r = Events.logRank(df, "user_id", "arm", "ts").collect()(0)
    assert(math.abs(r.getAs[Long]("o_minus_e_ppm")) <= 2L) // ppm rounding
  }
}
