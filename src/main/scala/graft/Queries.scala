package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Serving, Upsert}

/** One registered query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the DuckDB oracle that must hash-match it.
  *
  * Column-name discipline: the driver's compare sorts columns by NAME
  * before hashing, so every computed column is aliased identically on both
  * sides. Floating aggregates are rounded to 4 decimals on both sides
  * (summation order differs between engines; last-ulp drift must not flip
  * the hash), and integer aggregates are CAST to BIGINT in the oracle
  * (DuckDB widens sum(int) to HUGEINT, Spark to LONG).
  */
final case class QueryCase(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The query inventory: every operator from SURVEY.md §2 re-expressed over
  * the driver fixtures, plus the 100-TB-scale extension operators (dedup,
  * similarity search, text analysis, multimodal) over documents/embeddings.
  *
  * Fixture mapping (FIXTURES.md §B): `events` stands in for the review
  * stream — `ts` is the event time, `event_type` the grouping dimension
  * (app_name analog), `value` the scored measure (sentiment analog),
  * `props` a JSON payload exercising `from_json`-style parsing.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Cross-engine-deterministic 4-decimal rounding: `floor(x*1e4+0.5)/1e4`.
    * Every step is a plain IEEE double op, so identical input bits give
    * identical output bits in Spark and DuckDB. Spark's `round(x, 4)` (Java
    * BigDecimal HALF_UP on the double's shortest decimal repr) and DuckDB's
    * `round` (rounds the binary value) disagree on ties like `38.37875` —
    * observed on the sf0.001 fixture. The oracle SQL uses the same formula.
    */
  private def round4(c: Column): Column =
    floor(c * lit(10000) + lit(0.5)) / lit(10000)

  // ---------------------------------------------------------------------
  // Core parity: the reference's streaming aggregation, run as the
  // equivalent batch plan over `events` (SURVEY §7.4.2: update-mode output
  // is verified as final-state batch equivalence; the incremental emission
  // trail is covered by streaming tests).
  // ---------------------------------------------------------------------

  /** Normalization (Transforms analog on the fixture): JSON field parse
    * (F2), rescale (F4), when/otherwise flags (F5/F6). */
  private def normalizedEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("value_hours", col("value") / lit(60))
      .withColumn("is_high", coalesce(col("value") > lit(5.0), lit(false)))
      .withColumn("is_low", coalesce(col("value") < lit(1.0), lit(false)))

  /** A1/A2/P3: tumbling 1-day window × event_type, six aggregates.
    *
    * Float-compare discipline: `value` is exactly 2-decimal in the fixture,
    * so summing as DECIMAL(20,2) is EXACT and order-independent; casting
    * that one exact sum to double and doing identical double arithmetic on
    * both sides makes the rounded averages bit-reproducible across engines
    * (plain `round(avg(double),4)` flips on ties like `.37875` when Spark
    * and DuckDB sum in different orders — observed at sf0.001).
    */
  private def dailyEventSummary(s: SparkSession, dir: String): DataFrame =
    normalizedEvents(s, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_v"),
        count(lit(1)).as("t_events"),
        sum(col("is_high").cast("int")).as("t_high"),
        sum(col("is_low").cast("int")).as("t_low"),
        sum("k").as("t_k"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        round4(col("sum_v") / col("t_events")).as("a_value"),
        round4(col("sum_v") / col("t_events") / lit(60)).as("a_value_hours"),
        col("t_events"), col("t_high"), col("t_low"), col("t_k"))

  private val dailySummarySql: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS a_value,
      | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*) / 60 * 10000 + 0.5) / 10000 AS a_value_hours,
      | CAST(count(*) AS BIGINT) AS t_events,
      | CAST(count_if(value > 5.0) AS BIGINT) AS t_high,
      | CAST(count_if(value < 1.0) AS BIGINT) AS t_low,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS t_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** The serving view: daily summary decomposed to (year, month, day) ints
    * (A3 input shape, `visualizer.py:85-88`). */
  private def servingView(s: SparkSession, dir: String): DataFrame =
    Serving.decomposeTime(
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg((sum(col("value").cast(DecimalType(20, 2))).cast("double") /
            count(lit(1))).as("A_value"),
          count(lit(1)).as("T_events"))
        .select(col("event_type").as("app_name"),
          col("window.start").cast("timestamp").as("time"),
          col("A_value"), col("T_events")))

  private val servingViewSql: String =
    """SELECT event_type AS app_name,
      | CAST(EXTRACT(year FROM d) AS INTEGER) AS time_year,
      | CAST(EXTRACT(month FROM d) AS INTEGER) AS time_month,
      | CAST(EXTRACT(day FROM d) AS INTEGER) AS time_day,
      | A_value, T_events
      |FROM (SELECT date_trunc('day', ts) AS d, event_type,
      |        CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*) AS A_value,
      |        count(*) AS T_events
      |      FROM events GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------------
  // The registry.
  // ---------------------------------------------------------------------

  val all: Seq[QueryCase] = Seq(

    QueryCase("q_daily_summary", dailyEventSummary, Some(dailySummarySql)),

    // K2: keyed upsert as keep-latest-per-key (row_number window).
    QueryCase("q_upsert_latest",
      (s, dir) => {
        val withDay = t(s, dir, "events")
          .withColumn("day", col("ts").cast("date"))
        Upsert.keepLatestPerKey(withDay,
            keys = Seq("user_id", "day"),
            orderCols = Seq("ts", "event_id"))
          .select(col("user_id"), col("day"), col("event_type"), col("value"),
            col("event_id"))
      },
      Some("""SELECT user_id, day, event_type, value, event_id FROM (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         event_type, value, event_id,
        |         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin)),

    // A3 + F12: per-dimension monthly time-series, PARITY mean-of-means.
    QueryCase("q_serving_timeseries",
      (s, dir) => Serving.timeSeries(servingView(s, dir), "click", "A_value")
        .withColumn("A_value", round4(col("A_value"))),
      Some(s"""SELECT app_name, time_year, time_month,
        | floor(avg(A_value) * 10000 + 0.5) / 10000 AS A_value,
        | concat(CAST(time_year AS VARCHAR), '/', CAST(time_month AS VARCHAR)) AS month_label
        |FROM ($servingViewSql)
        |WHERE app_name = 'click'
        |GROUP BY app_name, time_year, time_month""".stripMargin)),

    // A3 weighted variant: true average over underlying rows.
    QueryCase("q_serving_timeseries_weighted",
      (s, dir) => Serving.timeSeriesWeighted(servingView(s, dir), "click", "A_value",
          weightCol = "T_events")
        .withColumn("A_value", round4(col("A_value"))),
      Some(s"""SELECT app_name, time_year, time_month,
        | floor(sum(A_value * T_events) / sum(T_events) * 10000 + 0.5) / 10000 AS A_value
        |FROM ($servingViewSql)
        |WHERE app_name = 'click'
        |GROUP BY app_name, time_year, time_month""".stripMargin)),

    // A4 + P6 + O2: time-slice ranking (year+month granularity).
    QueryCase("q_serving_ranking",
      (s, dir) => Serving.ranking(servingView(s, dir), "T_events",
          year = Some(2024), month = Some(1))
        .select(col("app_name"), col("T_events").cast("long").as("T_events")),
      Some(s"""SELECT app_name, CAST(sum(T_events) AS BIGINT) AS T_events
        |FROM ($servingViewSql)
        |WHERE time_year = 2024 AND time_month = 1
        |GROUP BY app_name""".stripMargin)),

    // A4 mean branch: ranking by an A_* metric (mean-of-means parity).
    QueryCase("q_serving_ranking_avg",
      (s, dir) => Serving.ranking(servingView(s, dir), "A_value",
          year = Some(2024))
        .withColumn("A_value", round4(col("A_value"))),
      Some(s"""SELECT app_name, floor(avg(A_value) * 10000 + 0.5) / 10000 AS A_value
        |FROM ($servingViewSql)
        |WHERE time_year = 2024
        |GROUP BY app_name""".stripMargin)),

    // A5: distinct dimension values (dropdown).
    QueryCase("q_distinct_dims",
      (s, dir) => Serving.distinctGames(
        t(s, dir, "events").withColumnRenamed("event_type", "app_name")),
      Some("SELECT DISTINCT event_type AS app_name FROM events")),

    // Skew-safe two-phase salted aggregation — must be EXACTLY equivalent
    // to the plain groupBy (oracle computes the unsalted form). Sums go
    // through exact DECIMAL so the salt-dependent partial order can't
    // perturb a double sum.
    QueryCase("q_skew_salted_agg",
      (s, dir) => graft.ops.Skew.saltedAggregate(
          t(s, dir, "events"), Seq("event_type"), saltBuckets = 32,
          partials = Seq(
            (count(lit(1)), "p_cnt"),
            (sum(col("value").cast(DecimalType(20, 2))), "p_sum")),
          merges = Seq(
            (sum(col("p_cnt")), "n_events"),
            (sum(col("p_sum")), "d_sum")))
        .select(col("event_type"), col("n_events"),
          round4(col("d_sum").cast("double")).as("sum_value"),
          round4(col("d_sum").cast("double") / col("n_events")).as("avg_value")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000
        |   AS sum_value,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
        |   AS avg_value
        |FROM events GROUP BY event_type""".stripMargin)),

    // P5/P6/F11: raw filter + projection pushed to the parquet scan.
    QueryCase("q_filter_project",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value") > lit(8.0))
        .select(col("event_id"), col("user_id"), col("value"),
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d")),
      Some("""SELECT event_id, user_id, value,
        | CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
        | CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
        | CAST(EXTRACT(day FROM ts) AS INTEGER) AS d
        |FROM events WHERE event_type = 'purchase' AND value > 8.0""".stripMargin))
  )

  private def registry: Seq[QueryCase] =
    all ++ QueriesExt.all ++ QueriesJoins.all ++ QueriesAnalytics.all ++
      QueriesRelational.all ++ QueriesWarc.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
