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

  /** Model of [[StatefulSessions.runWatermarked]] on a bounded replay:
    * only events at or below the FINAL watermark fold; a user's last
    * folded session emits only if the user holds no post-watermark events
    * and the watermark cleared its gap deadline.
    */
  private def expectedWatermarked(events: Seq[(Long, Long)], gapUs: Long,
      delayUs: Long): Set[(Long, Long, Long)] = {
    val wm = events.map(_._2).max - delayUs
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val folded = evs.map(_._2).filter(_ <= wm).sorted
      val held = evs.exists(_._2 > wm)
      if (folded.isEmpty) Nil
      else {
        // gap-sessionize the folded prefix
        val sessions = folded.tail.foldLeft(List(List(folded.head))) {
          case (acc, ts) =>
            if (ts - acc.head.head > gapUs) List(ts) :: acc
            else (ts :: acc.head) :: acc.tail
        }.reverse.map(_.reverse)
        val emitted = sessions.zipWithIndex.filter { case (s, i) =>
          i < sessions.size - 1 || (!held && wm > s.last + gapUs)
        }
        emitted.map { case (s, i) => (u, (i + 1).toLong, s.size.toLong) }
      }
    }.toSet
  }

  test("watermarked sessionization emits exactly the watermark-final sessions") {
    val streamed = StatefulSessions
      .runWatermarked(spark, TestSpark.sf, gapSeconds = 300,
        delaySeconds = 60, "spec_sessions_wm")
      .collect()
      .map(s => (s.user_id, s.session_no, s.n_events)).toSet

    val events = graft.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toSeq
    val expected = expectedWatermarked(events,
      gapUs = 300L * 1000000L, delayUs = 60L * 1000000L)

    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    assert(streamed.nonEmpty)
  }

  test("watermarked sessionization survives cross-batch in-watermark disorder") {
    // three files → three micro-batches (maxFilesPerTrigger=1), with file 2
    // carrying events OLDER than file 1's max but inside the watermark
    // delay — the crash case for a fold that finalizes each batch eagerly
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "us")
        .select(col("user_id"), (col("us") * 1000).as("ts"), // µs → ns-as-long
          col("us").cast("string").as("event_id"))
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: user 1 at t=1000s..1010s; batch 2: t=960s (40s late, within
    // the 300s delay) + t=1400s (new session trigger); batch 3: t=2500s
    val S = 1000000L
    write("b1.parquet", Seq((1L, 1000L * S), (1L, 1010L * S)))
    write("b2.parquet", Seq((1L, 960L * S), (1L, 1400L * S)))
    write("b3.parquet", Seq((1L, 2500L * S)))
    // move the inner part-files up so the glob sees three single files
    val fs = java.nio.file.Paths.get(dir)
    java.nio.file.Files.list(fs).forEach { sub =>
      if (java.nio.file.Files.isDirectory(sub)) {
        val part = java.nio.file.Files.list(sub)
          .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        java.nio.file.Files.move(part,
          fs.resolve(sub.getFileName.toString.stripSuffix(".parquet") + "_f.parquet"))
      }
    }

    val streamed = StatefulSessions
      .runWatermarked(spark, dir, gapSeconds = 300, delaySeconds = 300,
        "spec_sessions_wm_mb", maxFilesPerTrigger = Some(1),
        glob = "*_f.parquet")
      .collect()
      .map(s => (s.user_id, s.session_no, s.n_events)).toSet

    val all = Seq((1L, 960L * S), (1L, 1000L * S), (1L, 1010L * S),
      (1L, 1400L * S), (1L, 2500L * S))
    val expected = expectedWatermarked(all,
      gapUs = 300L * 1000000L, delayUs = 300L * 1000000L)
    assert(streamed == expected,
      s"got $streamed, want $expected")
    // the late-but-in-watermark event must have folded into session 1
    assert(streamed.contains((1L, 1L, 3L)),
      "the 40s-late event was dropped or crashed the fold")
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
