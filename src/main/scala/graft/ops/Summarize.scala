package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship aggregation: per-game, per-day summary.
  *
  * Reproduces `summarizer.py:76-100` — a tumbling 1-day event-time window
  * grouped with the game keys, six aggregates, and the output projection
  * (`window.end AS time`, `summarizer.py:93`).
  *
  * Spark-native notes (100 TB design point):
  *   - `groupBy(window(...), keys).agg(...)` plans to partial+final
  *     `HashAggregateExec` with a single hash-partition Exchange on
  *     (window, app_id, app_name) — map-side combine bounds shuffle volume
  *     by |groups|, not |rows|.
  *   - Identical code path batch and streaming: in streaming mode the same
  *     plan picks up StateStoreRestore/Save around the final aggregate.
  *   - All expressions are built-in (codegen'd); no UDFs.
  */
object Summarize {

  /** Daily summary over a normalized review frame (see [[Transforms.normalize]]).
    * Input columns: timestamp_created (timestamp), app_id, app_name,
    * author_playtime_at_review (hours), sentiment, recommended (bool),
    * is_positive, is_negative.
    */
  def dailySummary(df: DataFrame): DataFrame = df
    .groupBy(window(col("timestamp_created"), "1 day"),
      col("app_id"), col("app_name"))
    .agg(
      avg("author_playtime_at_review").as("A_playtime"),
      avg("sentiment").as("A_sentiment"),
      count("recommended").as("T_reviews"),
      sum(col("recommended").cast("int")).as("T_recommendations"),
      sum(col("is_positive").cast("int")).as("T_pos_reviews"),
      sum(col("is_negative").cast("int")).as("T_neg_reviews"))
    .select(
      col("app_id"), col("app_name"),
      col("window.end").as("time"),
      col("A_playtime"), col("A_sentiment"), col("T_reviews"),
      col("T_recommendations"), col("T_pos_reviews"), col("T_neg_reviews"))
}
