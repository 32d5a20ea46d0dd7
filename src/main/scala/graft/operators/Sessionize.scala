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
}
