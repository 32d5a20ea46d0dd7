package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Sessionize

class StatefulSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming stateful sessionization matches batch (closed sessions)") {
    val streamed = StatefulSessions
      .run(spark, TestSpark.sf, gapSeconds = 300, "spec_sessions")
      .collect()
      .map(s => (s.user_id, s.session_no, s.n_events)).toSet

    // batch sessions, minus each user's final (still-open) session — Append
    // mode with NoTimeout only emits sessions closed by a later event
    val batch = Sessionize
      .assignSessions(graft.Tables.events(spark, TestSpark.sf),
        "user_id", "ts", "event_id", gapSeconds = 300)
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"))
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_no").as("session_no"))
    val closed = batch.join(lastPerUser, Seq("user_id", "session_no"), "left_anti")
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }

  test("pure sessionize function: gap logic and state carry-over") {
    val gapUs = 300L * 1000000L
    val evs = Iterator(
      StatefulSessions.Event(7L, 0L),
      StatefulSessions.Event(7L, 100L * 1000000L),
      StatefulSessions.Event(7L, 1000L * 1000000L))
    val (closed, st, _) = StatefulSessions.sessionize(
      evs, gapUs, StatefulSessions.SessionState(0L, 0L, 0L, 0L))
    assert(closed.map(s => (s.session_no, s.n_events)) == Seq((1L, 2L)))
    assert(st == StatefulSessions.SessionState(2L, 1000000000L, 1000000000L, 1L))
  }
}
