package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state path Structured Streaming offers when windowed aggregation
  * can't express the semantics (variable-length, gap-defined sessions).
  *
  * State per user is O(1) (last-seen timestamp + open-session accumulator);
  * with event-time timeouts the state store evicts idle users, so state size
  * tracks *active* users, not history — the property that keeps this viable
  * on an unbounded stream.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_us: Long)
  case class SessionState(sessionNo: Long, startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, session_no: Long, n_events: Long,
      start_us: Long, duration_sec: Double)

  def sessionize(events: Iterator[Event], gapUs: Long,
      st: SessionState): (Seq[Session], SessionState, Long) = {
    var state = st
    val out = scala.collection.mutable.ArrayBuffer[Session]()
    var uid = -1L
    events.toSeq.sortBy(_.ts_us).foreach { e =>
      uid = e.user_id
      state =
        if (state.n == 0L) SessionState(1L, e.ts_us, e.ts_us, 1L)
        else if (e.ts_us - state.lastUs > gapUs) {
          out += Session(e.user_id, state.sessionNo, state.n, state.startUs,
            (state.lastUs - state.startUs) / 1e6)
          SessionState(state.sessionNo + 1, e.ts_us, e.ts_us, 1L)
        } else state.copy(lastUs = e.ts_us, n = state.n + 1)
    }
    (out.toSeq, state, uid)
  }

  /** Bounded-stream demo: sessionize a parquet-backed event stream and
    * return closed + final open sessions. On an unbounded stream the same
    * code runs with `GroupStateTimeout.EventTimeTimeout` closing sessions at
    * watermark passage instead of end-of-data.
    */
  def run(spark: SparkSession, sfDir: String, gapSeconds: Long,
      queryName: String): Dataset[Session] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"))
      .as[Event]

    val gapUs = gapSeconds * 1000000L
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(0L, 0L, 0L, 0L))
          val (closed, next, _) = sessionize(it, gapUs, st)
          state.update(next)
          closed.iterator
      }

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName).as[Session]
  }
}
