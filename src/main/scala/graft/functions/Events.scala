package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over a (user, timestamp, type, value)
  * stream: ordered-step funnels, cohort retention, gap-filled
  * resampling, and SCD Type-2 intervalization — the product-analytics /
  * warehouse layer next to sessionization ([[q_sessionize]]'s
  * gaps-and-islands) and the as-of/band/interval joins.
  *
  * Time is microsecond longs end to end (`unix_micros` here,
  * `epoch_us` in the oracle — the q_sessionize convention); bucket
  * arithmetic is exact integral division (`div`), never a double
  * quotient. Every per-user window partitions on the user key with
  * per-user event counts as the bound — the sessionize contract — and
  * everything else is filtered equi-joins plus partial-aggregable
  * aggregates: linear at any corpus size.
  */
object Events {

  private def us(tsCol: String): Column = unix_micros(col(tsCol))

  /** Ordered-step funnel: for each user, the earliest strictly-ordered
    * completion times of `steps` — t1 = first step-1 event, t_i = first
    * step-i event AFTER t_{i-1} (strict: a simultaneous event does not
    * advance the funnel). One filtered equi-join + partial-min aggregate
    * per step; users keep NULL from their first missed step on.
    * Output: (userCol, t_1..t_k as microsecond longs, steps_completed).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val e = events.select(col(userCol), col(typeCol),
      us(tsCol).as("__us"))
    val stages: Seq[DataFrame] = steps.zipWithIndex.tail.scanLeft {
      e.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col("__us")).as("t_1"))
    } { case (prev, (step, i)) =>
      val tPrev = s"t_$i"
      val keep = (1 to i).map(j => col(s"t_$j"))
      e.filter(col(typeCol) === step)
        .join(prev, Seq(userCol))
        .filter(col("__us") > col(tPrev))
        .groupBy((col(userCol) +: keep): _*)
        .agg(min(col("__us")).as(s"t_${i + 1}"))
    }
    val out = stages.zipWithIndex.tail.foldLeft(stages.head) {
      case (acc, (st, i)) =>
        acc.join(st, userCol +: (1 to i).map(j => s"t_$j"), "left")
    }
    val completed = (2 to steps.size).map(i =>
      when(col(s"t_$i").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    out.withColumn("steps_completed", completed)
  }

  /** Cohort retention: users bucketed by their FIRST event's period
    * (`cohort` = first-us div bucketUs), counted once per (cohort,
    * period offset) they were active in. Two partial-aggregable
    * groupBys around one equi-join; the distinct is per (cohort,
    * offset, user) — shuffle-bounded by active-user-period mass.
    * Output: (cohort, period_offset, n_users).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0, got $bucketUs")
    val e = events.select(col(userCol), us(tsCol).as("__us"))
    val first = e.groupBy(col(userCol))
      .agg(min(col("__us")).as("__first"))
      .select(col(userCol), expr(s"__first div $bucketUs").as("cohort"))
    e.join(first, Seq(userCol))
      .select(col(userCol), col("cohort"),
        (expr(s"__us div $bucketUs") - col("cohort")).as("period_offset"))
      .distinct()
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gap-filled resampling: per (user, bucket) event count and value
    * sum on a DENSE per-user bucket grid (sequence from the user's
    * first to last active bucket), missing buckets carrying 0 events
    * and the last seen sum forward-filled (`filled_sum`; NULL only
    * before a user's first value — there is none by construction since
    * the grid starts at an active bucket). Value sums go through
    * decimal(18,2) then double — the money-math parity rule.
    * Output: (userCol, bucket, n_events, sum_value, filled_sum).
    */
  def resampleFill(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0, got $bucketUs")
    val e = events.select(col(userCol),
      expr(s"unix_micros($tsCol) div $bucketUs").as("bucket"),
      col(valueCol))
    val per = e.groupBy(col(userCol), col("bucket"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
    val grid = per.groupBy(col(userCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(userCol),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(per, Seq(userCol, "bucket"), "left")
      .withColumn("n_events", coalesce(col("__n"), lit(0L)))
      .withColumn("filled_sum", last(col("sum_value"), ignoreNulls = true)
        .over(w))
      .select(col(userCol), col("bucket"), col("n_events"),
        col("sum_value"), col("filled_sum"))
  }

  /** SCD Type-2 intervalization of a change stream: consecutive repeats
    * of `stateCol` per key collapse away (lag over the raw stream), and
    * each surviving change carries [valid_from, valid_to) with NULL
    * valid_to marking the current row (lead over the collapsed stream).
    * `ordCol` breaks timestamp ties deterministically. Output:
    * (keyCol, stateCol, valid_from_us, valid_to_us, is_current).
    */
  def scd2(changelog: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, ordCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us").asc, col(ordCol).asc)
    val collapsed = changelog
      .select(col(keyCol), col(stateCol), us(tsCol).as("__us"), col(ordCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
    collapsed
      .withColumn("valid_from_us", col("__us"))
      .withColumn("valid_to_us", lead(col("__us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from_us"),
        col("valid_to_us"), col("is_current"))
  }

  /** First-order Markov transition table over each user's event-type
    * sequence — the behavioral-model card (what follows what): counts
    * of adjacent (from, to) type pairs in timestamp order (event-id
    * tie-break) and the row-normalized transition probability in exact
    * ppm. Per-user lag windows ride the sessionize contract (partition
    * by user, per-user event counts as the bound); the transition
    * table itself is types²-sized. Output:
    * (from_type, to_type, n, p_ppm).
    */
  def markovTransitions(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(us(tsCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__t"))
    pairs.join(broadcast(fromTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        Stats.fixedPointExact(col("n"), col("__t")).as("p_ppm"))
  }

  /** SEQUENTIAL PATTERN mining (the length-k PrefixSpan core): the
    * top event-type k-grams by USER SUPPORT — "what do sessions
    * actually do, in order", the behavioral companion of
    * [[markovTransitions]]' one-step matrix (a 3-gram catches
    * browse→add→buy where the Markov chain only sees its two halves).
    * Per-user event streams in (ts, id) order yield contiguous
    * k-grams via lead; support counts DISTINCT users (the standard
    * anti-spam convention — one hyperactive user can't promote a
    * pattern), occurrences counted beside. Top `topK` by (support
    * desc, pattern asc) — a deterministic total order.
    *
    * Scale shape: user-partitioned windows (bounded by per-user
    * activity, never corpus-wide), one partial-aggregable distinct
    * count over the |types|^k-bounded pattern domain, and a top-k
    * over that domain.
    */
  def seqPatterns(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, k: Int = 3,
      topK: Int = 10): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.partitionBy(col(userCol))
      .orderBy(us(tsCol).asc, col(idCol).asc)
    val withNext = (1 until k).foldLeft(events.toDF()) { (df, i) =>
      df.withColumn(s"__n$i", lead(col(typeCol), i).over(w))
    }
    val parts = col(typeCol) +: (1 until k).map(i => col(s"__n$i"))
    withNext
      .filter(parts.drop(1).map(_.isNotNull).reduce(_ && _))
      .select(concat_ws("->", parts: _*).as("pattern"), col(userCol))
      .groupBy(col("pattern"))
      .agg(countDistinct(col(userCol)).as("support"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("support").desc, col("pattern").asc)
      .limit(topK)
  }

  /** ENTROPY RATE of the per-user event stream — how many BITS the
    * next event carries given the current one, the compressibility /
    * predictability ceiling of the behavior [[markovTransitions]]
    * tabulates: H(next|cur) = Σ_ij p_ij·log2(c_i/c_ij) computed as
    * the exact integer h2_q = Σ_ij c_ij·(log2q(c_i) − log2q(c_ij))
    * over the [[graft.plans.FixLog.log2q]] ladder; rate in bits =
    * h2_q/(N·2^16). 0 means the stream is deterministic (every state
    * has one successor); log2(|types|) means memoryless-uniform.
    * One row: (n_transitions, n_states, h2_q, h_bits).
    *
    * Scale shape: the transition counts are [[markovTransitions]]'
    * one partial-aggregable pass; the term table is |types|²-bounded.
    */
  def entropyRate(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(us(tsCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("__from"), col("__next").as("__to"))
      .agg(count(lit(1)).as("__c"))
    val fromTot = pairs.groupBy(col("__from"))
      .agg(sum(col("__c")).as("__ci"))
    pairs.join(broadcast(fromTot), Seq("__from"))
      .select(col("__c"),
        (col("__c") * (graft.plans.FixLog.log2qCol(col("__ci")) -
          graft.plans.FixLog.log2qCol(col("__c")))).as("__t"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_transitions"),
        sum(col("__t")).as("h2_q"))
      .crossJoin(broadcast(fromTot.agg(count(lit(1)).as("n_states"))))
      .select(col("n_transitions"), col("n_states"), col("h2_q"),
        when(col("n_transitions") === 0L, lit(null).cast("double"))
          .otherwise(round(col("h2_q").cast("double") /
            (col("n_transitions").cast("double") * 65536.0), 6))
          .as("h_bits"))
  }

  /** Kaplan-Meier survival over user lifetimes with RIGHT-CENSORING —
    * the principled form of "how long do users stay": lifetime = days
    * between a user's first and last event; users still active on the
    * corpus's last observed day are censored (their lifetime is a
    * lower bound, so they leave the risk set without counting as a
    * death — the correction naive retention curves get wrong).
    * S(t) = prod_{death times t_i <= t} (1 - d_i / n_i), computed in
    * the engine's log domain: per-step loss log2q(n) - log2q(n-d)
    * summed over the bounded lifetime-day domain, exponentiated once
    * through the fixed-point exp2 ladder — both FixLog chains replay
    * bit-for-bit in the oracle. A step where every at-risk user dies
    * pins S to exactly 0 from there on. Output, one row per DEATH
    * time: (t_days, n_at_risk, n_events, surv_ppm).
    *
    * Scale: one per-user min/max aggregate, day-domain-sized tables,
    * cumulative windows over the bounded day domain only.
    */
  def kaplanMeier(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import graft.plans.FixLog
    val perUser = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .groupBy(col("__u"))
      .agg(min(col("__d")).as("__f"), max(col("__d")).as("__l"))
    val mx = broadcast(perUser.agg(max(col("__l")).as("__mx")))
    val byT = perUser.crossJoin(mx)
      .select(datediff(col("__l"), col("__f")).cast("long").as("t_days"),
        when(col("__l") === col("__mx"), 0L).otherwise(1L).as("__dead"))
      .groupBy(col("t_days"))
      .agg(count(lit(1)).as("__all"), sum(col("__dead")).as("__d"))
    val tot = broadcast(byT.agg(sum(col("__all")).as("__n")))
    val wBefore = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(tot)
      .withColumn("__before",
        coalesce(sum(col("__all")).over(wBefore), lit(0L)))
      .withColumn("n_at_risk", col("__n") - col("__before"))
      .filter(col("__d") > 0)
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk
      .withColumn("__loss",
        when(col("__d") === col("n_at_risk"), lit(0L))
          .otherwise(FixLog.log2qCol(col("n_at_risk")) -
            FixLog.log2qCol(col("n_at_risk") - col("__d"))))
      .withColumn("__zero", max(when(col("__d") === col("n_at_risk"), 1L)
        .otherwise(0L)).over(wCum))
      .withColumn("__cum", sum(col("__loss")).over(wCum))
      .select(col("t_days"), col("n_at_risk"), col("__d").as("n_events"),
        when(col("__zero") === 1L, 0L)
          .otherwise(Stats.fixedPointExact(lit(1048576L),
            FixLog.exp2qCol(col("__cum")))).as("surv_ppm"))
  }

  /** LOG-RANK TEST between two survival arms (Mantel 1966; Peto &
    * Peto 1972) — does arm A churn at the same hazard as arm B, the
    * inference companion of [[kaplanMeier]] (same lifetime model:
    * first→last observed day per user, users last seen on the corpus's
    * final day censored). At each death time the observed arm-A deaths
    * are compared with the hypergeometric expectation d·n₁/n, and
    * z² = (Σ(O₁−E₁))² / ΣV with the standard per-time variance
    * d·n₁·n₀·(n−d) / (n²·(n−1)). Each per-time term is one exact
    * rational rendered in ppm before summing (the house quantization
    * contract: ≤ 1 ppm per death time, day-domain-bounded), so both
    * engines compose identical integers. `armCol` must be 0/1 and
    * constant per user. One row: (n_a, n_b, n_deaths_a, n_deaths_b,
    * o_minus_e_ppm, var_ppm, z2_ppm) — arm A is armCol = 1; z2_ppm
    * NULL when the variance is zero (no comparable death times).
    *
    * Scale: [[kaplanMeier]]'s exact shape — one per-user aggregate,
    * then day-domain-sized tables and one bounded-domain cumulative
    * window.
    */
  def logRank(events: DataFrame, userCol: String, armCol: String,
      tsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = events
      .select(col(userCol).as("__u"), col(armCol).cast("long").as("__a"),
        to_date(col(tsCol)).as("__d"))
      .groupBy(col("__u"))
      .agg(max(col("__a")).as("__a"), min(col("__d")).as("__f"),
        max(col("__d")).as("__l"))
    val mx = broadcast(perUser.agg(max(col("__l")).as("__mx")))
    val byT = perUser.crossJoin(mx)
      .select(datediff(col("__l"), col("__f")).cast("long").as("t_days"),
        col("__a"),
        when(col("__l") === col("__mx"), 0L).otherwise(1L).as("__dead"))
      .groupBy(col("t_days"))
      .agg(sum(when(col("__a") === 1L, 1L).otherwise(0L)).as("__all1"),
        sum(when(col("__a") === 0L, 1L).otherwise(0L)).as("__all0"),
        sum(when(col("__a") === 1L, col("__dead")).otherwise(0L))
          .as("__d1"),
        sum(when(col("__a") === 0L, col("__dead")).otherwise(0L))
          .as("__d0"))
    val tot = broadcast(byT.agg(sum(col("__all1")).as("__n1t"),
      sum(col("__all0")).as("__n0t")))
    val wBefore = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(tot)
      .withColumn("__b1", coalesce(sum(col("__all1")).over(wBefore),
        lit(0L)))
      .withColumn("__b0", coalesce(sum(col("__all0")).over(wBefore),
        lit(0L)))
      .withColumn("__n1", col("__n1t") - col("__b1"))
      .withColumn("__n0", col("__n0t") - col("__b0"))
      .withColumn("__dd", col("__d1") + col("__d0"))
      .withColumn("__nn", col("__n1") + col("__n0"))
      .filter(col("__dd") > 0)
    val terms = risk.select(col("__d1"), col("__d0"),
      Stats.fixedPointExact(col("__dd") * col("__n1"), col("__nn"))
        .as("__e1"),
      when(col("__nn") > 1, Stats.fixedPointExact(
        (col("__dd").cast(dec) * col("__n1") * col("__n0") *
          (col("__nn") - col("__dd"))).cast(dec),
        (col("__nn").cast(dec) * col("__nn") * (col("__nn") - 1))
          .cast(dec)))
        .otherwise(lit(0L)).as("__v"))
    terms
      .agg(coalesce(sum(col("__d1")), lit(0L)).as("__o1"),
        coalesce(sum(col("__d0")), lit(0L)).as("__o0"),
        coalesce(sum(col("__e1")), lit(0L)).as("__e1s"),
        coalesce(sum(col("__v")), lit(0L)).as("__vs"))
      .crossJoin(tot)
      .select(col("__n1t").as("n_a"), col("__n0t").as("n_b"),
        col("__o1").as("n_deaths_a"), col("__o0").as("n_deaths_b"),
        (lit(1000000L) * col("__o1") - col("__e1s")).as("o_minus_e_ppm"),
        col("__vs").as("var_ppm"),
        when(col("__vs") > 0, Stats.fixedPointExact(
          ((lit(1000000L) * col("__o1") - col("__e1s")).cast(dec) *
            (lit(1000000L) * col("__o1") - col("__e1s")).cast(dec))
            .cast(dec),
          (lit(1000000L).cast(dec) * col("__vs")).cast(dec)))
          .as("z2_ppm"))
  }
}
