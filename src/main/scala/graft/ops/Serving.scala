package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving-tier interactive queries over the materialized summary view.
  *
  * The reference keeps an in-memory pandas view keyed by
  * `(app_id, time_year, time_month, time_day)` (`visualizer.py:30-44`) and
  * runs three query shapes over it:
  *   - per-game monthly time-series rollup (`visualizer.py:193-221`),
  *   - per-time-slice ranking (`visualizer.py:232-274`),
  *   - distinct dimension values for the dropdown (`visualizer.py:278-283`).
  *
  * Parity semantics: metrics named `A_*` re-aggregate with an UNWEIGHTED
  * mean over daily summary rows (mean-of-means, `visualizer.py:197-200`);
  * `T_*` metrics re-aggregate with sum. [[timeSeriesWeighted]] is the
  * corrected opt-in variant (`sum(A*n)/sum(n)`).
  *
  * All of these are single filter→groupBy→agg→sort chains: at scale they
  * run over a pre-aggregated view that is orders of magnitude smaller than
  * the raw stream (the reference's materialized-rollup design, preserved).
  */
object Serving {

  /** Decompose the summary `time` timestamp into the serving view's
    * (year, month, day) integer dimensions (`visualizer.py:85-88`). */
  def decomposeTime(summary: DataFrame): DataFrame = summary
    .withColumn("time_year", year(col("time")))
    .withColumn("time_month", month(col("time")))
    .withColumn("time_day", dayofmonth(col("time")))
    .drop("time")

  private def aggFor(metric: String): Column =
    if (metric.startsWith("A_")) avg(col(metric)).as(metric)
    else sum(col(metric)).as(metric)

  /** Query path A: one game's monthly time-series of a metric
    * (`visualizer.py:193-221`). Mean-of-means for A_* metrics (parity).
    * Adds the 'YYYY/M' display label (`visualizer.py:208`). */
  def timeSeries(view: DataFrame, game: String, metric: String): DataFrame = view
    .filter(col("app_name") === game)
    .select(col("app_name"), col("time_year"), col("time_month"), col(metric))
    .groupBy(col("app_name"), col("time_year"), col("time_month"))
    .agg(aggFor(metric))
    .orderBy(col("time_year"), col("time_month"))
    .withColumn("month_label",
      concat(col("time_year").cast("string"), lit("/"),
        col("time_month").cast("string")))

  /** Weighted variant: true average over underlying reviews,
    * `sum(A_x * weight) / sum(weight)` (opt-in correction); `weightCol` is
    * the per-row count the daily average was computed over (e.g.
    * `T_reviews` on the reference view, `T_events` on the fixture view). */
  def timeSeriesWeighted(view: DataFrame, game: String, metric: String,
      weightCol: String = "T_reviews"): DataFrame = view
    .filter(col("app_name") === game)
    .groupBy(col("app_name"), col("time_year"), col("time_month"))
    .agg((sum(col(metric) * col(weightCol)) / sum(col(weightCol))).as(metric))
    .orderBy(col("time_year"), col("time_month"))

  /** Query path B: rank games by a metric within a time slice
    * (`visualizer.py:232-274`). Granularity cascade: all-time → year →
    * year+month → year+month+day (the reference's evident intent; its
    * `if not selected_year` bug at `visualizer.py:241-246` is NOT
    * reproduced — see SURVEY §2.12). */
  def ranking(view: DataFrame, metric: String,
      year: Option[Int] = None, month: Option[Int] = None,
      day: Option[Int] = None): DataFrame = {
    val sliced = Seq(
        year.map(col("time_year") === _),
        month.map(col("time_month") === _),
        day.map(col("time_day") === _)
      ).flatten
      .foldLeft(view)((df, p) => df.filter(p))
    sliced
      .groupBy(col("app_name"))
      .agg(aggFor(metric))
      .orderBy(col(metric).desc, col("app_name"))
  }

  /** Query path C: distinct dimension values for the dropdown
    * (`visualizer.py:81-82,114-117,278-283`). */
  def distinctGames(view: DataFrame): DataFrame =
    view.select(col("app_name")).distinct().orderBy(col("app_name"))

  /** F13: metric-name prettify for display labels
    * (`visualizer.py:210,264`): `A_*` → "Average *", `T_*` → "Total *". */
  def prettyMetric(metric: String): String =
    metric.replace("A_", "Average ").replace("T_", "Total ")
}
