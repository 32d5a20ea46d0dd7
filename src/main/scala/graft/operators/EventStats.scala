package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream statistics beyond sessionization ([[Sessionize]]): the
  * monitoring-flavored aggregations an ingest pipeline runs over its own
  * event volumes.
  */
object EventStats {

  /** Hourly volume anomalies per event type: bucket events by hour,
    * z-score each (type, hour) count against that type's own hourly
    * distribution, keep |z| ≥ `zThreshold` — the classic volume-spike /
    * outage detector over ingest telemetry.
    *
    * Engine parity: hourly counts are exact integers; the per-type mean
    * and sample stddev are ROUNDED before the z division (identical
    * doubles in, so the division is identical — the single-division
    * doctrine), and z is rounded again before the threshold compare, so
    * accumulation-order ulps can never flip a flag. Types observed in
    * only one hour (stddev undefined) or with constant volume
    * (stddev 0) score z = 0: no variation, no anomaly.
    *
    * Scale shape: one shuffle to the (type, hour) grain — the q43
    * windowed-aggregation key — then per-type stats re-aggregate the
    * HOURLY table (bounded: types × hours), broadcast back. Nothing
    * after the first aggregation is corpus-sized.
    */
  /** Strict-order k-step funnel: step i counts users whose earliest
    * step-i event falls strictly AFTER their earliest qualifying
    * step-(i−1) event — the standard conversion funnel (view → click →
    * purchase), generalized to any step list. Returns one row per step:
    * (step, event_type, n_users), n_users non-increasing by
    * construction.
    *
    * Dataflow: each step is one user-keyed join against the previous
    * step's (user, first-ts) frame + one min-aggregation — k sequential
    * user-keyed shuffles, never a window over the event stream. The k
    * output counts re-derive shared prefixes per branch; AQE's
    * ReusedExchange dedups them (the q100 count-table precedent), and k
    * is funnel-length small. Timestamps compare at Spark's native
    * microsecond precision; the oracle compares epoch_us(...) — the q19
    * precedent, so sub-µs noise in a nanosecond source can never split
    * the engines.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur: DataFrame = null
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      val evs = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
      cur =
        if (i == 0) evs.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        else evs
          .join(cur.select(col(userCol), col("__t").as("__prev")),
            Seq(userCol))
          .filter(col(tsCol) > col("__prev"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    perStep.reduce(_ unionByName _)
  }

  /** Time-constrained k-step funnel — [[funnel]] with a conversion
    * window: step i counts users whose earliest qualifying `steps(i)`
    * event falls STRICTLY after their step-(i−1) time AND within
    * `maxGapMicros` of it. The product form of the funnel question
    * ("signed up, viewed within a day, bought within a day of that"),
    * where [[funnel]]'s unconstrained form answers the lifetime one.
    * Gap arithmetic is exact epoch-microsecond integers
    * (unix_micros — the stream-join precedent: never interval math).
    * Same scale shape as [[funnel]]: one bounded join+agg per step,
    * user-keyed.
    *
    * SEMANTIC (deliberate, r12-advisor-reviewed): the anchor is
    * GREEDY-EARLIEST — each step's clock starts at the user's earliest
    * QUALIFYING event for that step, so a user whose step-i event is
    * in-window only relative to a LATER step-(i−1) occurrence does NOT
    * convert here. This is the strict "first journey" reading; the
    * common any-anchor reading ("ANY step-(i−1) occurrence may open the
    * window") is [[windowedFunnelAnyAnchor]] — pick by question, the
    * two legitimately disagree (spec-pinned divergence case).
    */
  def windowedFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapMicros: Long): DataFrame = {
    require(steps.nonEmpty, "windowedFunnel needs at least one step")
    require(maxGapMicros >= 1, s"maxGapMicros must be positive, got $maxGapMicros")
    var cur: DataFrame = null
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      val evs = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
      cur =
        if (i == 0) evs.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        else evs
          .join(cur.select(col(userCol), col("__t").as("__prev")),
            Seq(userCol))
          .filter(col(tsCol) > col("__prev") &&
            unix_micros(col(tsCol)) <=
              unix_micros(col("__prev")) + maxGapMicros)
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    perStep.reduce(_ unionByName _)
  }

  /** Any-anchor variant of [[windowedFunnel]] — the other standard
    * funnel reading: step i counts users with a `steps(i)` event
    * strictly after and within `maxGapMicros` of ANY qualifying
    * step-(i−1) event, not just the earliest one. A user who misses
    * the window from their first journey but converts on a retry
    * counts here and not there — the two semantics legitimately
    * disagree (spec-pinned divergence case).
    *
    * Per-step state is the SET of qualifying times per user (distinct
    * (user, ts) pairs), bounded by the user's own per-step event count
    * — the sessionize argument: user streams are bounded, the corpus
    * is not. Each step is still ONE user-keyed join + distinct; the
    * per-user qualifying×candidate product never crosses users, so the
    * shuffle stays keyed and skew-bounded at 100 TB.
    */
  def windowedFunnelAnyAnchor(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      maxGapMicros: Long): DataFrame = {
    require(steps.nonEmpty, "windowedFunnelAnyAnchor needs at least one step")
    require(maxGapMicros >= 1,
      s"maxGapMicros must be positive, got $maxGapMicros")
    var cur: DataFrame = null
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      val evs = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
      cur =
        if (i == 0) evs.select(col(userCol), col(tsCol).as("__t")).distinct()
        else evs
          .join(cur.select(col(userCol), col("__t").as("__prev")),
            Seq(userCol))
          .filter(col(tsCol) > col("__prev") &&
            unix_micros(col(tsCol)) <=
              unix_micros(col("__prev")) + maxGapMicros)
          .select(col(userCol), col(tsCol).as("__t")).distinct()
      cur.agg(countDistinct(col(userCol)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    perStep.reduce(_ unionByName _)
  }

  /** Behavioral-prefix duplicate detection — the bot/script screen: two
    * accounts whose first-k event-type sequences are IDENTICAL are
    * behaving like the same automation. Fingerprint = the raw ordered
    * type prefix itself (readable, engine-recomputable — no hash
    * needed); groups with ≥ `minUsers` members emit with the smallest
    * member as canonical. Users with fewer than k events fingerprint
    * their full stream (a short bot script still groups). The
    * dedup-family move applied to EVENTS instead of text.
    *
    * Order needs a unique tie-break (`tieCol`) under equal timestamps —
    * the house total-order rule. Prefix assembly uses the
    * collect-skips-nulls ≡ ordered string_agg parity (round-6
    * convention). Scale shape: one user-keyed rank window cut at k
    * (the q19 sessionize class), then a prefix-keyed count.
    */
  def behaviorPrefixGroups(events: DataFrame, userCol: String,
      tsCol: String, tieCol: String, typeCol: String, k: Int = 5,
      minUsers: Int = 2): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minUsers >= 2, s"minUsers must be >= 2, got $minUsers")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val seq = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(userCol))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("__rn"), col(typeCol).as("t")))),
        x => x.getField("t")), "|").as("prefix"))
    seq.groupBy("prefix")
      .agg(count(lit(1)).as("n_users"),
        min(col(userCol)).as("canonical_user"))
      .filter(col("n_users") >= minUsers)
      .orderBy(desc("n_users"), col("prefix"))
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first
    * `cohortEvent`; a user counts at offset k if ANY of their events
    * falls in the week k weeks after their cohort week. Returns
    * (cohort, offset, n_users, cohort_size) — the classic retention
    * triangle, with the cohort size alongside so callers derive rates
    * as single exact-integer divisions (the q120 doctrine).
    *
    * All time math is exact integers: week-truncated MICROsecond epochs
    * divided by 604800000000 with integer DIV, pre-cohort activity
    * filtered out BEFORE the division so truncate-vs-floor semantics on
    * negatives can never matter. Dataflow: two user-keyed aggregations
    * + one user-keyed join; the per-(cohort, offset) grid is bounded by
    * weeks², and cohort sizes broadcast back onto it.
    *
    * REQUIRES a UTC (or other fixed-offset, DST-free) session timezone:
    * the exact-multiple property of week-truncated epoch differences
    * holds only when no DST transition can make two week starts sit
    * 7d·k ± 1h apart — in a DST zone the DIV would truncate a k−1h gap
    * to offset k−1, and Spark's TZ-aware `date_trunc` would also diverge
    * from a naive-timestamp SQL oracle. Every session this library
    * builds sets `spark.sql.session.timeZone=UTC`; set it before reusing
    * this operator elsewhere.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, cohortEvent: String = "signup"): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortEvent)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__first"))
      .select(col(userCol), date_trunc("week", col("__first")).as("__cohort"))
    val sizes = cohorts.groupBy("__cohort")
      .agg(count(lit(1)).as("cohort_size"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__w"))
      .distinct()
    activity.join(cohorts, Seq(userCol))
      .filter(col("__w") >= col("__cohort"))
      .withColumn("offset",
        expr("(unix_micros(__w) - unix_micros(__cohort)) DIV 604800000000"))
      .groupBy(col("__cohort"), col("offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .join(broadcast(sizes), Seq("__cohort"))
      .select(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort"),
        col("offset"), col("n_users"), col("cohort_size"))
  }

  /** Engagement stickiness: per active day, DAU / rolling-window WAU
    * (users active in the `window` days ENDING that day) — the classic
    * DAU/WAU engagement ratio, the day-grain companion of
    * [[cohortRetention]]'s week triangle. Stickiness → 1 means every
    * weekly user shows up daily; → 1/window means users touch once a
    * window.
    *
    * Rolling distinct counts don't exist as window functions, so the
    * window is a FAN-OUT: each distinct (user, day) activity row emits
    * the `window` target days it keeps the user "weekly-active" for,
    * then one count-distinct per target day — exact, shuffle-bounded by
    * window × |active (user, day)| (the q103 interval-bucket shape).
    * Days are exact epoch-day integers (datediff — no timezone
    * arithmetic); DAU/WAU is ONE division of exact integers (the q120
    * doctrine). Only days with ≥ 1 event emit (the activity calendar).
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    val ud = events.select(col(userCol).as("__u"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
          .as("__d"))
      .distinct()
    val dau = ud.groupBy("__d").agg(count(lit(1)).as("dau"))
    val wau = ud.select(col("__u"),
        explode(sequence(col("__d"), col("__d") + (window - 1))).as("__t"))
      .groupBy("__t").agg(countDistinct(col("__u")).as("wau"))
    dau.join(wau, col("__d") === col("__t"))
      .select(
        date_format(date_add(to_date(lit("1970-01-01")),
          col("__d").cast("int")), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        (col("dau") / col("wau")).as("stickiness"))
      .orderBy("day")
  }

  def hourlyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold > 0.0, s"zThreshold must be positive, got $zThreshold")
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(round(avg("n") + lit(1e-9), 6).as("__mean"),
        round(coalesce(stddev_samp(col("n")), lit(0.0)) + lit(1e-9), 6)
          .as("__std"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", when(col("__std") === 0.0, lit(0.0))
        .otherwise(round((col("n") - col("__mean")) / col("__std")
          + lit(1e-9), 6)))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH").as("hour"),
        col("n"), col("z"))
  }

  /** Time-to-convert distribution of [[windowedFunnel]]'s
    * greedy-earliest chain: for every user who completes ALL steps,
    * latency = final-step qualifying time − step-1 anchor time (exact
    * integer µs), reported as an exact histogram
    * (latency DIV `bucketMicros`, per-bucket count + min/max) — the
    * scale-sane distribution shape: one user-keyed chain + ONE
    * bucket-grain aggregation. (An exact global median would need a
    * corpus-wide rank — the window anti-pattern; a reader takes the
    * median from the bucket counts to bucket precision instead.) All
    * integer math, zero rounding (the q120 doctrine).
    *
    * Output: (bucket, n_users, lo_us, hi_us), ordered by bucket.
    */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxGapMicros: Long,
      bucketMicros: Long): DataFrame = {
    require(steps.length >= 2,
      "funnelLatency needs at least an anchor and a final step")
    require(maxGapMicros >= 1, s"maxGapMicros must be positive, got $maxGapMicros")
    require(bucketMicros >= 1, s"bucketMicros must be positive, got $bucketMicros")
    // the windowedFunnel chain, carrying the step-1 anchor through:
    // anchor = the user's earliest first-step event, each later step the
    // earliest qualifying occurrence after (and within the gap of) the
    // previous step's time
    var cur: DataFrame = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .withColumn("__anchor", col("__t"))
    steps.tail.foreach { st =>
      cur = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
        .join(cur.select(col(userCol), col("__t").as("__prev"),
          col("__anchor")), Seq(userCol))
        .filter(col(tsCol) > col("__prev") &&
          unix_micros(col(tsCol)) <=
            unix_micros(col("__prev")) + maxGapMicros)
        .groupBy(col(userCol), col("__anchor"))
        .agg(min(col(tsCol)).as("__t"))
    }
    cur.select((unix_micros(col("__t")) - unix_micros(col("__anchor")))
        .as("__lat"))
      .withColumn("bucket", expr(s"__lat DIV $bucketMicros"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        min("__lat").as("lo_us"), max("__lat").as("hi_us"))
      .orderBy("bucket")
  }

  /** [[funnelLatency]]'s 2-step histogram recovered from a QUALIFYING
    * PAIR table — the streaming reformulation (r14 verdict item 5, the
    * q205→q204 push-joins-before-aggregation doctrine): the stream pays
    * only the windowed step-A⋈step-B join (every (a, b) with
    * b ∈ (a, a+gap] — stateful, watermark-evicted, ZERO aggregations),
    * and this batch post-math runs on the sink. `anchors` (each user's
    * earliest step-A time) derives BATCH-side from the static events
    * frame — the PSI twin's static-reference pattern — because the
    * anchor is a min over ALL step-A events, including those with no
    * qualifying step-B, which the pair table by construction lacks.
    * Pairs at the anchor are exactly the chain's qualifying step-B
    * candidates, so min(t_b) per user replays the greedy-earliest pick
    * and the histogram equals the batch [[funnelLatency]] row for row
    * (the q329/q330 gates pin it on one oracle).
    *
    * `pairs`: (userCol, t_a, t_b) exact epoch-µs; `anchors`:
    * (userCol, anchor_us). Output: (bucket, n_users, lo_us, hi_us).
    */
  def funnelLatencyFromPairs(pairs: DataFrame, anchors: DataFrame,
      userCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be positive, got $bucketMicros")
    // user-keyed join, NOT a broadcast: anchors are user-grain (one row
    // per step-A user — corpus-scaled), pairs are conversion-grain
    pairs
      .join(anchors, Seq(userCol))
      .filter(col("t_a") === col("anchor_us"))
      .groupBy(col(userCol), col("anchor_us"))
      .agg(min(col("t_b")).as("__t2"))
      .select((col("__t2") - col("anchor_us")).as("__lat"))
      .withColumn("bucket", expr(s"__lat DIV $bucketMicros"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        min("__lat").as("lo_us"), max("__lat").as("hi_us"))
      .orderBy("bucket")
  }

  /** Exponentially time-decayed event counts per group — the
    * freshness-weighted popularity counter (trending topics, decaying
    * source reputation): each event weighs 2^(−age/halfLife), computed
    * as exp(−λ·age_µs) with λ = ln 2 / halfLife_µs. ONE map-side-
    * combinable aggregation over the events — the shape that runs
    * unchanged on a stream (the twin anchors on the same `asOfMicros`).
    *
    * Determinism: `asOfMicros` is a CALLER-supplied anchor (derive it
    * from the data's max or a fixed clock — never the wall clock, which
    * no oracle can replay); ages are exact integer µs; the halfLife
    * denominator is exact in double (days·86400·1e6 < 2^53), so λ
    * differs across engines by at most the one ulp of ln 2 — absorbed
    * by the rounded weight SUM (+1e-9, 6), the q148 exp-sum parity
    * class. An oracle must recompute λ with the same op order:
    * ln(2.0) / ((days · 86400.0) · 1000000.0).
    *
    * Output: (grp, n, decayed), ordered.
    */
  def decayedCounts(events: DataFrame, groupCol: String, tsCol: String,
      asOfMicros: Long, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0.0,
      s"halfLifeDays must be positive, got $halfLifeDays")
    val lambda = math.log(2.0) / ((halfLifeDays * 86400.0) * 1000000.0)
    events.select(col(groupCol).as("grp"),
        unix_micros(col(tsCol)).as("__t"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        round(sum(exp(lit(-lambda) *
          (lit(asOfMicros) - col("__t")).cast("double"))) + lit(1e-9), 6)
          .as("decayed"))
      .orderBy("grp")
  }
}
