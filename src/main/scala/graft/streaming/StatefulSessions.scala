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

  /** Fold a user's events into sessions with BOUNDED memory: instead of
    * materializing + sorting the whole group (a hot user — bot traffic — is
    * an executor OOM on a real stream), events pass through a min-heap
    * reorder buffer of at most `maxBuffer` entries. Once the buffer is
    * full, the earliest buffered event is folded into the session state —
    * correct as long as no event arrives more than `maxBuffer` positions
    * out of order. If one does (its ts precedes an already-folded event),
    * the fold fails LOUD rather than silently mis-sessionizing: on an
    * unbounded stream that is the signal to raise the buffer or tighten the
    * upstream watermark.
    */
  def sessionize(events: Iterator[Event], gapUs: Long,
      st: SessionState, maxBuffer: Int = 1 << 20): (Seq[Session], SessionState, Long) = {
    var state = st
    val out = scala.collection.mutable.ArrayBuffer[Session]()
    var uid = -1L
    def fold(e: Event): Unit = {
      uid = e.user_id
      if (state.n != 0L && e.ts_us < state.lastUs)
        throw new IllegalStateException(
          s"sessionize: event at ts=${e.ts_us} for user ${e.user_id} arrived " +
            s"more than maxBuffer=$maxBuffer positions out of order " +
            s"(already folded up to ts=${state.lastUs}); raise maxBuffer")
      state =
        if (state.n == 0L) SessionState(1L, e.ts_us, e.ts_us, 1L)
        else if (e.ts_us - state.lastUs > gapUs) {
          out += Session(e.user_id, state.sessionNo, state.n, state.startUs,
            (state.lastUs - state.startUs) / 1e6)
          SessionState(state.sessionNo + 1, e.ts_us, e.ts_us, 1L)
        } else state.copy(lastUs = e.ts_us, n = state.n + 1)
    }
    // min-heap on ts_us; same-ts pop order is arbitrary, which cannot change
    // the result (the fold only looks at ts deltas)
    val heap = scala.collection.mutable.PriorityQueue.empty[Event](
      Ordering.by[Event, Long](e => -e.ts_us))
    events.foreach { e =>
      heap.enqueue(e)
      if (heap.size > maxBuffer) fold(heap.dequeue())
    }
    while (heap.nonEmpty) fold(heap.dequeue())
    (out.toSeq, state, uid)
  }

  /** Per-user state for [[runWatermarked]]: the session being built from
    * FINALIZED (≤ watermark) events, plus the pending buffer of events the
    * watermark hasn't passed yet. Pending is what makes cross-micro-batch
    * disorder safe: an event may only fold into the session once no earlier
    * event can still arrive (the watermark contract), so nothing ever folds
    * out of order and nothing crashes on a late-but-in-watermark arrival.
    * Pending size is bounded by one user's traffic inside the watermark
    * delay window.
    */
  case class WmState(sess: SessionState, pending: Seq[Event])

  /** Unbounded-stream form: event-time watermark + `EventTimeTimeout`.
    * Each invocation folds exactly the events the watermark has passed
    * (from the pending buffer + this batch); newer events wait in state.
    * Sessions close two ways — a later folded event beyond the gap
    * (emitted immediately), or the watermark passing `last_event + gap`
    * for an idle user (timeout fires, the final session emits, and the
    * user's state is EVICTED) — so state size tracks *active* users on a
    * stream that never ends. Events arriving later than the watermark
    * allows (ts below an already-folded point) are dropped, the standard
    * late-data contract. After an eviction a returning user's session
    * numbering restarts (state cannot count forever on an unbounded
    * stream); `start_us` is the stable session key across evictions.
    * [[run]]'s NoTimeout variant folds eagerly and only ever emits
    * gap-closed sessions.
    */
  def runWatermarked(spark: SparkSession, sfDir: String, gapSeconds: Long,
      delaySeconds: Long, queryName: String,
      maxFilesPerTrigger: Option[Int] = None,
      glob: String = "events.parquet"): Dataset[Session] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read
      .option("pathGlobFilter", glob).parquet(sfDir).schema

    val reader = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val events = graft.Tables.normalizeTs(reader.parquet(sfDir))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .withWatermark("ts", s"$delaySeconds seconds")
      .as[(Long, Long, java.sql.Timestamp)]

    val gapUs = gapSeconds * 1000000L
    val sessions = events
      .groupByKey(_._1)
      .flatMapGroupsWithState[WmState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[WmState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            WmState(SessionState(0L, 0L, 0L, 0L), Nil))
          val arrived = it.map(e => Event(e._1, e._2)).toSeq
          // fold only what the watermark has passed; hold the rest. Events
          // below the already-folded frontier are late data — dropped.
          val (ripe, hold) = (prev.pending ++ arrived).partition(_.ts_us <= wmUs)
          val onTime = ripe.filter(e => prev.sess.n == 0L || e.ts_us >= prev.sess.lastUs)
          val (closed, folded, _) = sessionize(onTime.iterator, gapUs, prev.sess)
          // gap-close by TIME, not only by a successor event: if the
          // watermark has moved a full gap past the folded frontier and
          // nothing is pending before that point, the open session is final
          val idleClosed =
            if (folded.n > 0L && hold.isEmpty && wmUs > folded.lastUs + gapUs)
              Seq(Session(uid, folded.sessionNo, folded.n, folded.startUs,
                (folded.lastUs - folded.startUs) / 1e6))
            else Nil
          val nextSess =
            if (idleClosed.nonEmpty) SessionState(folded.sessionNo + 1, 0L, 0L, 0L)
            else folded
          if (hold.isEmpty && nextSess.n == 0L) {
            state.remove() // fully idle user: evict
          } else {
            state.update(WmState(nextSess, hold))
            // wake when the watermark can next change this user's outcome:
            // the earliest held event, or the open session's gap deadline
            val wakeUs = (hold.map(_.ts_us) ++
              (if (nextSess.n > 0L) Seq(nextSess.lastUs + gapUs) else Nil)).min
            state.setTimeoutTimestamp(
              math.max(wakeUs / 1000L, state.getCurrentWatermarkMs() + 1L))
          }
          (closed ++ idleClosed).iterator
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

    val events = graft.Tables.normalizeTs(spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
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
