package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hour: Int, min: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$min%02d:00")

  test("a spiking hour flags; constant and single-hour types never do") {
    // "click": 1,1,1,1,6 events per hour -> hour 4 spikes (z ~ 1.79)
    val clicks = (0 to 3).map(h => (ts(h), "click")) ++
      (0 until 6).map(m => (ts(4, m), "click"))
    // "steady": identical volume every hour -> stddev 0 -> z 0 everywhere
    val steady = (0 to 4).flatMap(h => Seq((ts(h), "steady"), (ts(h, 30), "steady")))
    // "once": a single hour -> stddev undefined -> z 0
    val once = Seq((ts(2), "once"))
    val df = (clicks ++ steady ++ once).toDF("ts", "event_type")
    val got = EventStats.hourlyAnomalies(df, "ts", "event_type", zThreshold = 1.5)
      .select("event_type", "hour", "n", "z")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("click", "2026-01-01 04", 6L)))
    // z = (6 - 2) / stddev_samp(1,1,1,1,6) rounded at each hand-off
    val mean = BigDecimal(2.0 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val std = BigDecimal(math.sqrt(20.0 / 4) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = BigDecimal((6 - mean) / std + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._4 == z)
    intercept[IllegalArgumentException] {
      EventStats.hourlyAnomalies(df, "ts", "event_type", zThreshold = 0.0)
    }
  }

  test("funnel: strict ordering per user, non-increasing step counts") {
    // u1 completes the funnel in order; u2 clicks BEFORE viewing (the
    // click must not count) then never purchases; u3 views only;
    // u4's purchase lands at the exact click timestamp (strictly-after
    // excludes it)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "click", ts(0)), (2L, "view", ts(1)),
      (3L, "view", ts(0)),
      (4L, "view", ts(0)), (4L, "click", ts(1)), (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = EventStats.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
    intercept[IllegalArgumentException] {
      EventStats.funnel(ev, "user_id", "ts", "event_type", Seq.empty)
    }
  }

  test("cohortRetention: offsets count whole weeks, pre-signup activity drops") {
    def day(d: Int, t: String = "12:00:00") =
      Timestamp.valueOf(f"2026-01-$d%02d $t") // 2026-01-05 is a Monday
    val ev = Seq(
      // u1 signs up week of Jan 5, active weeks 0 and 2
      (1L, "signup", day(6)), (1L, "click", day(7)), (1L, "view", day(20)),
      // u2 signs up same week, has PRE-signup activity (must not count
      // at a negative offset) and week-1 activity
      (2L, "view", day(2)), (2L, "signup", day(8)), (2L, "click", day(13)),
      // u3 never signs up -> excluded entirely
      (3L, "view", day(6))
    ).toDF("user_id", "event_type", "ts")
    val got = EventStats.cohortRetention(ev, "user_id", "ts", "event_type")
      .orderBy("cohort", "offset")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2026-01-05", 0L, 2L, 2L),   // both signup-week active
      ("2026-01-05", 1L, 1L, 2L),   // u2 clicks in week 1
      ("2026-01-05", 2L, 1L, 2L)))  // u1 views in week 2
  }

  test("a volume collapse (negative z) flags symmetrically") {
    val ev = ((0 to 3).flatMap(h => (0 until 5).map(m => (ts(h, m), "api"))) :+
      ((ts(4), "api"))).toDF("ts", "event_type")
    val got = EventStats.hourlyAnomalies(ev, "ts", "event_type", zThreshold = 1.5)
      .select("hour", "z").as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("2026-01-01 04"))
    assert(got.head._2 < 0, "a collapse must flag with negative z")
  }

  test("stickiness: hand-computed DAU/rolling-WAU, window membership, " +
      "only active days emit") {
    def day(d: Int, h: Int = 9) =
      Timestamp.valueOf(f"2026-01-${d + 1}%02d $h%02d:00:00")
    // u1: days 0,1; u2: day 0 (twice — distinct must dedup); u3: day 7
    val ev = Seq(
      (1L, day(0)), (1L, day(1)),
      (2L, day(0)), (2L, day(0, 15)),
      (3L, day(7))
    ).toDF("user_id", "ts")
    val got = EventStats.stickiness(ev, "user_id", "ts", window = 7)
      .as[(String, Long, Long, Double)].collect().toSeq
    // day0: DAU {u1,u2}; WAU[-6..0] {u1,u2} → 1.0
    // day1: DAU {u1}; WAU[-5..1] {u1,u2} → 0.5
    // day7: DAU {u3}; WAU[1..7] {u1(day1), u3} → 0.5
    assert(got == Seq(
      ("2026-01-01", 2L, 2L, 1.0),
      ("2026-01-02", 1L, 2L, 0.5),
      ("2026-01-08", 1L, 2L, 0.5)),
      s"got $got")
    // a day-8 reading would drop u1's day-1 activity out of the window —
    // no event on day 8, so no row (the activity-calendar contract)
    assert(!got.exists(_._1 == "2026-01-09"))
  }

  test("windowedFunnel: in-window conversions count, late and equal-time " +
      "ones don't, order is strict") {
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val gap = 10L * 60L * 1000000L // 10 minutes in micros
    val ev = Seq(
      // u1: signup 10:00 → view 10:05 → purchase 10:10 — all in window
      (1L, t(0), "signup"), (1L, t(5), "view"), (1L, t(10), "purchase"),
      // u2: view 11 min after signup — too late for step 2
      (2L, t(0), "signup"), (2L, t(11), "view"),
      // u3: view at the SAME ts as signup — strict > excludes it
      (3L, t(0), "signup"), (3L, t(0), "view"),
      // u4: purchase BEFORE view — order matters
      (4L, t(0), "signup"), (4L, t(2), "purchase"), (4L, t(4), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = EventStats.windowedFunnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), maxGapMicros = gap)
      .orderBy("step")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "signup", 4L), (2L, "view", 2L),
      (3L, "purchase", 1L)), s"got $got")
  }

  test("windowedFunnelAnyAnchor: a retry-opened window converts here and " +
      "not under greedy-earliest — the pinned divergence case") {
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val gap = 10L * 60L * 1000000L // 10 minutes in micros
    val ev = Seq(
      // u1: signups at 10:00 and 10:20; view at 10:25. Greedy-earliest
      // anchors the view window at the 10:00 signup (misses, 25 > 10);
      // any-anchor admits it via the 10:20 signup (5 min gap).
      (1L, t(0), "signup"), (1L, t(20), "signup"), (1L, t(25), "view"),
      // u2: in-window relative to the earliest too — counts under both
      (2L, t(0), "signup"), (2L, t(5), "view"),
      // u3: late relative to EVERY signup — counts under neither
      (3L, t(0), "signup"), (3L, t(11), "view")
    ).toDF("user_id", "ts", "event_type")
    val any = EventStats.windowedFunnelAnyAnchor(ev, "user_id", "ts",
        "event_type", Seq("signup", "view"), maxGapMicros = gap)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    val greedy = EventStats.windowedFunnel(ev, "user_id", "ts",
        "event_type", Seq("signup", "view"), maxGapMicros = gap)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(any == Seq((1L, "signup", 3L), (2L, "view", 2L)), s"got $any")
    assert(greedy == Seq((1L, "signup", 3L), (2L, "view", 1L)),
      s"got $greedy")
  }

  test("windowedFunnelAnyAnchor: strict >, window boundary inclusive, " +
      "chained steps each re-anchor on any qualifying time") {
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val gap = 10L * 60L * 1000000L
    val ev = Seq(
      // u1: equal-time view excluded (strict >); 10-min gap is inclusive
      (1L, t(0), "signup"), (1L, t(0), "view"), (1L, t(10), "view"),
      // ... and the purchase window re-anchors on the 10:10 view
      (1L, t(20), "purchase"),
      // u2: purchase in-window only from the EARLIER of two views —
      // the set semantics keep both anchors alive
      (2L, t(0), "signup"), (2L, t(1), "view"), (2L, t(9), "view"),
      (2L, t(8), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventStats.windowedFunnelAnyAnchor(ev, "user_id", "ts",
        "event_type", Seq("signup", "view", "purchase"),
        maxGapMicros = gap)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "signup", 2L), (2L, "view", 2L),
      (3L, "purchase", 2L)), s"got $got")
  }

  test("behaviorPrefixGroups: identical prefixes group, tie-break orders " +
      "equal timestamps, short streams fingerprint whole") {
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val ev = Seq(
      // bots 1 and 2: identical signup|view|click prefix (then diverge)
      (1L, t(0), 10L, "signup"), (1L, t(1), 11L, "view"),
      (1L, t(2), 12L, "click"), (1L, t(3), 13L, "purchase"),
      (2L, t(0), 20L, "signup"), (2L, t(1), 21L, "view"),
      (2L, t(2), 22L, "click"), (2L, t(3), 23L, "error"),
      // user 3: same types but equal timestamps — event_id decides the
      // order (view before click because 31 < 32)
      (3L, t(0), 30L, "signup"), (3L, t(1), 31L, "view"),
      (3L, t(1), 32L, "click"),
      // users 4 and 5: short two-event streams, identical → group
      (4L, t(0), 40L, "error"), (4L, t(1), 41L, "error"),
      (5L, t(0), 50L, "error"), (5L, t(1), 51L, "error")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventStats.behaviorPrefixGroups(ev, "user_id", "ts",
        "event_id", "event_type", k = 3, minUsers = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("signup|view|click", 3L, 1L), ("error|error", 2L, 4L)),
      s"got $got")
  }

  test("decayedCounts halves per half-life; funnelLatency buckets by exact DIV") {
    val base = 1700000000000000L // anchor, epoch microseconds
    val day = 86400000000L
    val ev = Seq(
      ("a", base),            // age 0 -> weight 1
      ("a", base - 7 * day),  // age = one half-life -> 0.5
      ("b", base - 14 * day)  // two half-lives -> 0.25
    ).toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventStats.decayedCounts(ev, "event_type", "ts", base,
        halfLifeDays = 7.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // the 2-ulp lambda round-trip lands exactly back on the dyadic
    // weights after the 6-decimal output rounding
    assert(got("a") == (("a", 2L, 1.5)), s"got ${got("a")}")
    assert(got("b") == (("b", 1L, 0.25)), s"got ${got("b")}")

    // funnel latency: u1 converts exactly ON a day boundary -> DIV puts
    // it in bucket 1; u2 one microsecond earlier -> bucket 0; u3 never
    // completes the chain (purchase outside the gap) -> absent
    val t0 = base
    val fun = Seq(
      (1L, t0, "signup"), (1L, t0 + day / 2, "view"),
      (1L, t0 + day, "purchase"),
      (2L, t0, "signup"), (2L, t0 + day / 2, "view"),
      (2L, t0 + day - 1L, "purchase"),
      (3L, t0, "signup"), (3L, t0 + day / 2, "view"),
      (3L, t0 + 9 * day, "purchase")
    ).toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val lat = EventStats.funnelLatency(fun, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"),
        maxGapMicros = 7 * day, bucketMicros = day)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(lat == Seq((0L, 1L, day - 1L, day - 1L), (1L, 1L, day, day)),
      s"got $lat")
  }
}
