package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: a user's events belong to one session
  * while consecutive gaps stay ≤ `gapSec`; a larger gap opens the next
  * session. The batch twin of the streaming
  * [[graft.streaming.Stateful]] sessionizer (same session definition,
  * replayable over history).
  *
  * Shape: one hash shuffle on the user key, then per-user lag + running
  * sum of break flags — all windows are PARTITIONED (no global order),
  * so the plan scales with users×cores; a mega-user bounds its own task
  * like any per-key aggregation. Gap math runs on exact epoch
  * MICROSECOND integers ([[Times.micros]] — NTZ-tolerant), not float
  * seconds. */
object Sessionize {

  /** Adds `session_idx` (per-user, 1-based, in time order) to every
    * event. `tieCol` breaks equal timestamps deterministically. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val us = Times.micros(col(tsCol))
    val break = when(
      lag(us, 1).over(w).isNull ||
        us - lag(us, 1).over(w) > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(break).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Session-level rollup: (user, session_idx) → event count and the
    * session's [start, end] in epoch micros. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(Times.micros(col(tsCol))).as("start_us"),
        max(Times.micros(col(tsCol))).as("end_us"))
}
