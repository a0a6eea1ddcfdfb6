package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytic-window and multi-level aggregation queries over `events` —
  * the §2.6/§2.8-adjacent surface the reference never needed (its
  * dashboards precompute one granularity at a time) but any serving layer
  * on this engine reaches for first:
  *
  *   - ROLLUP: one shuffle produces every (type, day) / (type) / ()
  *     subtotal level — vs the reference's one-query-per-granularity
  *     cascade (§2.5 P6), this is the same answer set in a single pass.
  *   - moving window: partitioned frame-bounded means + lag deltas — the
  *     time-series smoothing the reference's Dash layer does client-side,
  *     pushed into the engine where it parallelizes per key.
  *
  * Float discipline as everywhere: exact DECIMAL sums, one cast to
  * double, identical formula in the oracle ([[Queries]] scaladoc).
  */
object QueriesAnalytics {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables(s, dir, name)

  private def round4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000) + lit(0.5)) / lit(10000)

  val all: Seq[QueryCase] = Seq(

    // Multi-level subtotals in ONE aggregation: ROLLUP(event_type, day).
    // grouping_id disambiguates subtotal levels (DuckDB: GROUPING(...)).
    QueryCase("q_rollup_daily",
      (s, dir) => t(s, dir, "events")
        .withColumn("day", col("ts").cast("date"))
        .rollup(col("event_type"), col("day"))
        .agg(
          sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_v"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl"))
        .select(col("event_type"), col("day"),
          round4(col("sum_v")).as("sum_v"), col("n"), col("lvl")),
      Some("""SELECT event_type, CAST(ts AS DATE) AS day,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_v,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS lvl
        |FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))""".stripMargin)),

    // The full subtotal lattice: CUBE(event_type, day) adds the per-day
    // across-types slice that ROLLUP omits — all four grouping levels in
    // one aggregation (Spark plans a single Expand + hash agg, not four
    // scans; same map-side-combine bound as any groupBy).
    QueryCase("q_cube_daily",
      (s, dir) => t(s, dir, "events")
        .withColumn("day", col("ts").cast("date"))
        .cube(col("event_type"), col("day"))
        .agg(
          sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_v"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl"))
        .select(col("event_type"), col("day"),
          round4(col("sum_v")).as("sum_v"), col("n"), col("lvl")),
      Some("""SELECT event_type, CAST(ts AS DATE) AS day,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_v,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS lvl
        |FROM events GROUP BY CUBE(event_type, CAST(ts AS DATE))""".stripMargin)),

    // Frame-bounded moving analytics per event_type: 7-day-window moving
    // mean over the daily series + day-over-day delta via lag.
    // The moving mean is EXACT-DECIMAL summed inside the frame (windowed
    // double avg is summation-order-dependent and the two engines frame
    // differently — segment trees vs sliding sums), with ONE double
    // division at the end; lag deltas subtract identical doubles.
    QueryCase("q_window_moving",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .withColumn("day", col("ts").cast("date"))
          .groupBy("event_type", "day")
          .agg(sum(col("value").cast(DecimalType(20, 2))).as("day_dec"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val frame = w.rowsBetween(-6, 0)
        daily
          .withColumn("day_v", col("day_dec").cast("double"))
          .withColumn("ma7",
            sum(col("day_dec")).over(frame).cast("double") /
              count(lit(1)).over(frame))
          .withColumn("delta",
            col("day_v") - lag(col("day_v"), 1).over(w))
          .select(col("event_type"), col("day"),
            round4(col("day_v")).as("day_v"),
            round4(col("ma7")).as("ma7"),
            round4(coalesce(col("delta"), lit(0.0))).as("delta"))
      },
      Some("""SELECT event_type, day,
        | floor(CAST(day_dec AS DOUBLE) * 10000 + 0.5) / 10000 AS day_v,
        | floor(CAST(sum(day_dec) OVER w AS DOUBLE) / count(*) OVER w
        |    * 10000 + 0.5) / 10000 AS ma7,
        | floor(coalesce(CAST(day_dec AS DOUBLE)
        |    - lag(CAST(day_dec AS DOUBLE), 1) OVER (PARTITION BY event_type
        |      ORDER BY day), 0.0) * 10000 + 0.5) / 10000 AS delta
        |FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |        sum(CAST(value AS DECIMAL(20,2))) AS day_dec
        |      FROM events GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`: both sort and linearly interpolate, and the 2-
    // decimal fixture values make the interpolation arithmetic identical).
    // The approximate-sketch variant for 100 TB is approx_percentile /
    // approx_count_distinct — demonstrated in AnalyticsSpec, not oracle-
    // comparable across engines by construction.
    QueryCase("q_percentiles",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .select(col("event_type"), round4(col("p50")).as("p50"),
          round4(col("p90")).as("p90"), col("n")),
      Some("""SELECT event_type,
        | floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS p50,
        | floor(quantile_cont(value, 0.9) * 10000 + 0.5) / 10000 AS p90,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin)),

    // ORDERED funnel (view → click → purchase): step i counts only
    // strictly after the user's step i−1 first match. |steps| keyed
    // conditional aggregations over a shrinking matched set — no per-user
    // event sort (ops/EventAnalytics).
    QueryCase("q_funnel",
      (s, dir) => graft.ops.EventAnalytics.funnel(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        |  GROUP BY e.user_id)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase""".stripMargin)),

    // Cohort retention: first-active-day cohorts × day offset → distinct
    // active users. Two keyed aggregations + one user-key join
    // (ops/EventAnalytics).
    QueryCase("q_cohort_retention",
      (s, dir) => graft.ops.EventAnalytics.cohortRetention(
        t(s, dir, "events"), "user_id", "ts"),
      Some("""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(d.day - c.cohort_day AS INTEGER) AS day_offset,
        |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY c.cohort_day, d.day - c.cohort_day""".stripMargin))
  )
}
