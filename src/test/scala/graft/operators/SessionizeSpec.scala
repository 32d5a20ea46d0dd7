package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("assignSessions splits at gaps > threshold, per user") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-01 00:02:00")),  // same session (2 min)
      (1L, 12L, ts("2024-01-01 00:10:00")),  // new session (8 min gap)
      (2L, 20L, ts("2024-01-01 00:00:00"))   // other user independent
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize
      .assignSessions(events, "user_id", "ts", "event_id", gapSeconds = 300)
      .select($"user_id", $"event_id", $"session_no")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L), (2L, 20L, 1L)))
  }

  test("sessionSummary aggregates counts and durations") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-01 00:02:30")),
      (1L, 12L, ts("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val rows = Sessionize
      .sessionSummary(events, "user_id", "ts", "event_id", gapSeconds = 300)
      .orderBy("session_no")
      .as[(Long, Long, Long, String, Double)].collect()
    assert(rows(0) == ((1L, 1L, 2L, "2024-01-01 00:00:00", 150.0)))
    assert(rows(1) == ((1L, 2L, 1L, "2024-01-01 01:00:00", 0.0)))
  }

  test("chunked sessionize stitches a hot user's boundary-crossing sessions") {
    // one "bot" user, events every 100s for 5 hours → a single session that
    // crosses every hour-chunk boundary; a second user with a session that
    // STARTS exactly at a chunk boundary and another that ends just before
    // one — the stitch rule (start − prev_end ≤ gap merges) must cover all
    val bot = (0 until 180).map(i => (9L, i.toLong,
      new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 100000L)))
    val edgy = Seq(
      (2L, 500L, ts("2024-01-01 00:59:58")),
      (2L, 501L, ts("2024-01-01 01:00:00")), // boundary, 2s gap → same session
      (2L, 502L, ts("2024-01-01 02:00:00")), // > 300s → new session at boundary
      (2L, 503L, ts("2024-01-01 02:04:59")))
    val events = (bot ++ edgy).toDF("user_id", "event_id", "ts")

    def collect(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("user_id", "session_no")
      .as[(Long, Long, Long, String, Double)].collect().toSeq

    val single = collect(Sessionize
      .sessionSummary(events, "user_id", "ts", "event_id", gapSeconds = 300))
    val chunked = collect(Sessionize
      .sessionSummaryChunked(events, "user_id", "ts", "event_id",
        gapSeconds = 300, chunkSeconds = 3600))
    assert(chunked == single,
      s"two-phase sessions diverge:\n$chunked\nvs\n$single")
    // sanity: the bot really is one merged session spanning the 5 hours
    assert(single.count(_._1 == 9L) == 1)
    assert(single.find(_._1 == 9L).get._3 == 180L)
  }

  test("chunked sessionize equals single-window on the real events table") {
    val events = graft.Tables.events(spark, graft.TestSpark.sf)
    val single = Sessionize
      .sessionSummary(events, "user_id", "ts", "event_id", gapSeconds = 300)
    val chunked = Sessionize
      .sessionSummaryChunked(events, "user_id", "ts", "event_id",
        gapSeconds = 300, chunkSeconds = 3600)
    assert(chunked.exceptAll(single).isEmpty && single.exceptAll(chunked).isEmpty,
      "two-phase sessionization diverges from the single-window formulation")
  }
}
