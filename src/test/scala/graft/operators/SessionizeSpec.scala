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
}
