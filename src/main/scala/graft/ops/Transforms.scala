package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed normalization of the raw review stream.
  *
  * Reproduces the reference's withColumn chain (`summarizer.py:66-72`):
  *   - epoch-seconds → event-time timestamp (`summarizer.py:66`)
  *   - playtime minutes → hours (`summarizer.py:67`)
  *   - `recommended` string → boolean with `otherwise(false)` for junk/null
  *     (`summarizer.py:68-70`)
  *   - sentiment sign thresholds → `is_positive` / `is_negative`
  *     (`summarizer.py:71-72`; exactly 0.0 is neither)
  *
  * Pure `DataFrame => DataFrame`: identical code path in batch and
  * streaming (the reference proves the split works — its transforms are
  * source-agnostic). All expressions are built-in and stay inside
  * whole-stage codegen; no UDFs.
  */
object Transforms {

  def normalize(df: DataFrame): DataFrame = df
    .withColumn("timestamp_created",
      timestamp_seconds(col("timestamp_created")))
    .withColumn("author_playtime_at_review",
      col("author_playtime_at_review") / lit(60))
    .withColumn("recommended",
      when(col("recommended") === "true", true)
        .when(col("recommended") === "false", false)
        .otherwise(false))
    .withColumn("is_positive", coalesce(col("sentiment") > lit(0.0f), lit(false)))
    .withColumn("is_negative", coalesce(col("sentiment") < lit(0.0f), lit(false)))
}
