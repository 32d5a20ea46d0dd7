package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions at
  * idle gaps > `gap`. The batch implementation is the classic two-window
  * dataflow — lag to detect gap starts, running sum to number sessions —
  * with both windows over the same (user) partitioning, so Spark plans ONE
  * shuffle on user_id and evaluates both windows in a single sort pass.
  * (The streaming equivalent lives in
  * [[graft.streaming.StatefulSessions]] via flatMapGroupsWithState.)
  */
object Sessionize {

  /** Adds `session_no` (1-based per user) to an event frame. */
  def assignSessions(df: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val gapMicros = gapSeconds * 1000000L
    df
      .withColumn("__prev_us",
        lag(unix_micros(col(tsCol)), 1).over(byUser))
      .withColumn("__new_sess",
        when(col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("__new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_us", "__new_sess")
  }

  /** Per-session summary: event count, start, duration. */
  def sessionSummary(df: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapSeconds: Long): DataFrame =
    assignSessions(df, userCol, tsCol, orderCol, gapSeconds)
      .groupBy(col(userCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        round((unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          / lit(1000000.0), 3).as("duration_sec"))

  /** Skew-hardened [[sessionSummary]]: identical output, hot-user-safe plan.
    *
    * The single-window formulation sorts EVERY event of a user on one
    * reducer — a bot with 10⁸ events serializes a partition. Here the
    * per-event work is partitioned by (user, time-chunk): phase 1 runs the
    * gap rule within each chunk (a chunk never exceeds `chunkSeconds` of one
    * user's traffic) and collapses each local run to ONE summary row; phase
    * 2 re-runs the same gap rule over those summaries — sessions that
    * straddle a chunk boundary have `start − lag(end) ≤ gap` and merge, and
    * since local sessions are time-disjoint, ordering by start is total.
    * The phase-2 window sees per-(user, chunk) session counts, not event
    * counts — for the pathological bot (one endless session) that is one
    * row per chunk.
    *
    * Correctness does not depend on the chunk size (a session wholly inside
    * a chunk is found in phase 1; one that crosses k boundaries is stitched
    * from its k+1 local runs in phase 2) — `chunkSeconds` only tunes the
    * skew-vs-merge-volume trade.
    */
  def sessionSummaryChunked(df: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapSeconds: Long,
      chunkSeconds: Long = 3600L): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val chunkUs = chunkSeconds * 1000000L
    val us = unix_micros(col(tsCol))

    // phase 1: gap rule within (user, chunk); collapse runs to summaries
    val byChunk = Window.partitionBy(col(userCol), col("__chunk"))
      .orderBy(col(tsCol), col(orderCol))
    val locals = df
      .withColumn("__us", us)
      .withColumn("__chunk", floor(col("__us") / lit(chunkUs)))
      .withColumn("__prev_us", lag(col("__us"), 1).over(byChunk))
      .withColumn("__new_sess",
        when(col("__prev_us").isNull ||
          col("__us") - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("__lsess",
        sum(col("__new_sess")).over(
          byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__chunk"), col("__lsess"))
      .agg(
        min(col("__us")).as("__s_us"),
        max(col("__us")).as("__e_us"),
        min(col(tsCol)).as("__s_ts"),
        count(lit(1)).as("__n"))

    // phase 2: same gap rule over the (small) local-session summaries
    val byUser = Window.partitionBy(col(userCol)).orderBy(col("__s_us"))
    locals
      .withColumn("__prev_e", lag(col("__e_us"), 1).over(byUser))
      .withColumn("__new_sess",
        when(col("__prev_e").isNull ||
          col("__s_us") - col("__prev_e") > gapUs, 1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("__new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_no"))
      .agg(
        sum(col("__n")).as("n_events"),
        date_format(min(col("__s_ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        round((max(col("__e_us")) - min(col("__s_us")))
          / lit(1000000.0), 3).as("duration_sec"))
  }
}
