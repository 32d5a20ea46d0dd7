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

  test("watermarked sessionization emits timed-out sessions and evicts state") {
    val streamed = StatefulSessions
      .runWatermarked(spark, TestSpark.sf, gapSeconds = 300,
        delaySeconds = 60, "spec_sessions_wm")
      .collect()
      .map(s => (s.user_id, s.session_no, s.n_events)).toSet

    // with event-time timeouts sessions emit two ways: gap-closed ones
    // immediately, and each user's final session when the watermark (max
    // event time − delay) passes its end + gap. A final session whose
    // timeout lies BEYOND the final watermark is still legitimately open
    // when the bounded replay ends — exactly the sessions a live stream
    // would emit later — so the expected output is the full batch session
    // set minus those.
    val events = graft.Tables.events(spark, TestSpark.sf)
    val sessions = Sessionize
      .assignSessions(events, "user_id", "ts", "event_id", gapSeconds = 300)
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select("user_id", "session_no", "n_events", "last_us")
      .as[(Long, Long, Long, Long)].collect()
    val maxUs = sessions.map(_._4).max
    val finalWatermarkUs = maxUs - 60L * 1000000L
    val lastPerUser = sessions.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = sessions.filter { case (u, s, _, lastUs) =>
      lastPerUser(u) != s || lastUs + 300L * 1000000L < finalWatermarkUs
    }.map(t => (t._1, t._2, t._3)).toSet

    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    assert(streamed.nonEmpty)
    // and the still-open tail really is tiny (bounded by user count)
    val all = sessions.map(t => (t._1, t._2, t._3)).toSet
    assert((all -- streamed).size <= lastPerUser.size)
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

  test("sessionize folds a large out-of-order group through a bounded buffer") {
    val gapUs = 300L * 1000000L
    val zero = StatefulSessions.SessionState(0L, 0L, 0L, 0L)
    // 100k events, 10 sessions (gap every 10k events), locally shuffled in
    // reversed blocks of 64 — a disorder window the 128-entry buffer covers
    def ts(i: Int): Long = // 1s cadence + an extra 400s jump per session
      i.toLong * 1000000L + (i / 10000).toLong * 400L * 1000000L
    val ordered = (0 until 100000).map(i => StatefulSessions.Event(3L, ts(i)))
    val disordered = ordered.grouped(64).flatMap(_.reverse)
    val (closedD, stD, _) = StatefulSessions.sessionize(
      disordered, gapUs, zero, maxBuffer = 128)
    val (closedO, stO, _) = StatefulSessions.sessionize(
      ordered.iterator, gapUs, zero, maxBuffer = 128)
    assert(stD == stO)
    assert(closedD == closedO)
    assert(closedD.size == 9, s"expected 9 closed sessions, got ${closedD.size}")
    assert(closedD.forall(_.n_events == 10000L))
  }

  test("sessionize fails loud when disorder exceeds the buffer") {
    val gapUs = 300L * 1000000L
    val zero = StatefulSessions.SessionState(0L, 0L, 0L, 0L)
    // an event 12 positions late with a buffer of 2 → must throw, not
    // silently mis-sessionize
    val evs = (1 to 12).map(i =>
      StatefulSessions.Event(3L, (100L + i) * 1000000L)) :+
      StatefulSessions.Event(3L, 50L * 1000000L)
    val ex = intercept[IllegalStateException] {
      StatefulSessions.sessionize(evs.iterator, gapUs, zero, maxBuffer = 2)
    }
    assert(ex.getMessage.contains("out of order"))
  }
}
