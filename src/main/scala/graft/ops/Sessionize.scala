package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization over an event log: a new session starts
  * when the gap to the user's previous event exceeds `gapUs`
  * (microsecond-exact — `unix_micros`, no float epoch). The classic
  * lag -> boundary flag -> running sum pattern: two window passes over
  * one per-user shuffle, then the per-session rollup reuses the same
  * partitioning (no second exchange for the groupBy on (user, session)).
  * Ties are impossible under the (ts, eventCol) order because event ids
  * are unique, and the frame is pinned to ROWS so the plan never falls
  * into RANGE-mode tie semantics.
  */
object Sessionize {

  /** Per-event session ids: input columns plus `session_id` (1-based). */
  def byGap(events: DataFrame, userCol: String, tsCol: String,
            eventCol: String, gapUs: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(eventCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ-safe: the session is pinned UTC, so ntz -> instant is identity
    val tUs = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("prev_us", lag(tUs, 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || tUs - col("prev_us") > lit(gapUs), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(running))
      .drop("prev_us", "new_session")
  }

  /** Per-user session stats: n_sessions, n_events, max_session_events. */
  def userStats(events: DataFrame, userCol: String, tsCol: String,
                eventCol: String, gapUs: Long): DataFrame =
    byGap(events, userCol, tsCol, eventCol, gapUs)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(userCol)
      .agg(max(col("session_id")).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
}
