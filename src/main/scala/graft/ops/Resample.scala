package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization: per-key daily resampling with gap fill.
  *
  * Event logs are irregular — a key that goes quiet for a week simply has
  * no rows — but downstream consumers (rolling features, charting,
  * change-point detection) want one row per key per day with the last
  * known value carried forward. This materializes the missing days and
  * forward-fills them, flagging which rows are synthetic.
  *
  * Scale shape: the daily pre-aggregate is map-side combined (shuffle
  * bounded by |key×day groups|, not events); the calendar grid is
  * generated per key from its own [min_day, max_day] span (never a
  * global calendar cross join); the fill is one window PARTITIONED BY
  * KEY — keys independent, a long-lived key costs one task, the same
  * bound as any per-key aggregation. Grid size is Σ per-key span days,
  * which is the OUTPUT size — no blow-up beyond what the caller asked
  * for.
  */
object Resample {

  /** One row per (key, day) over each key's active span: `day_sum` =
    * that day's exact DECIMAL sum of `valueCol` (null on quiet days),
    * `filled` = last known day_sum carried forward, `is_gap` = true on
    * synthesized days. The first day of each span is by construction a
    * real observation, so `filled` is never null. */
  def dailyForwardFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("uid"), col(tsCol).cast("date").as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(20, 2))).as("day_sum"))
    val grid = daily.groupBy("uid")
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("uid"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val w = Window.partitionBy("uid").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("uid", "day"), "left")
      .withColumn("filled", last(col("day_sum"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("day_sum").isNull)
  }
}
