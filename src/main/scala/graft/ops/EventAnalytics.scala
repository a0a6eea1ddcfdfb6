package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the (user, ts, type) shape: ordered funnel
  * conversion and cohort retention — the two dashboard queries every
  * event pipeline grows after the per-day rollups.
  *
  * Both are chains of per-user aggregations and equi-joins on the user
  * key: hash-partitioned end to end, no windows over a global order, so
  * they scale with users×cores like any keyed aggregation. */
object EventAnalytics {

  /** ORDERED funnel: per user, step i matches only strictly after the
    * user's step i−1 match (first-touch semantics: each step takes the
    * EARLIEST qualifying event). Returns one row per user with `t_<i>`
    * micros for each reached step (null once the chain breaks).
    *
    * Each stage is one conditional min-aggregate joined back on the user
    * key — at 100 TB that is |steps| hash aggregations over a shrinking
    * matched set, never a per-user event sort. */
  def funnelUsers(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).as("user"),
      Times.micros(col(tsCol)).as("us"), col(typeCol).as("et"))
    val first = base.groupBy("user")
      .agg(min(when(col("et") === steps.head, col("us"))).as("t_1"))
      .filter(col("t_1").isNotNull)
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      // carry t_1..t_i (constant per user) + compute t_{i+1}
      val aggs = (1 to i).map(j => max(col(s"t_$j")).as(s"t_$j")) :+
        min(when(col("et") === step && col("us") > col(s"t_$i"),
          col("us"))).as(s"t_${i + 1}")
      base.join(prev, Seq("user"))
        .groupBy("user")
        .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Funnel conversion counts: one row, `n_<step>` = users whose chain
    * reached that step. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val counts = steps.indices.map(i =>
      count(col(s"t_${i + 1}")).as(s"n_${steps(i)}"))
    funnelUsers(events, userCol, tsCol, typeCol, steps)
      .agg(counts.head, counts.tail: _*)
  }

  /** Cohort retention: users grouped by their FIRST active day; cell
    * (cohort_day, day_offset) counts the cohort's distinct users active
    * that many days later. Two keyed aggregations + one user-key join. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val days = events.select(col(userCol).as("user"),
      to_date(col(tsCol)).as("day"))
    val cohorts = days.groupBy("user").agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user")).as("n_users"))
  }

  /** SCD2-style validity intervals: one row per event carrying the
    * half-open [valid_from, valid_to) window (epoch micros) during which
    * it was the key's latest state; `valid_to` is null on the current
    * row. This is the change-history view a slowly-changing-dimension
    * table serves — "what was this user's state at time T" becomes a
    * range probe instead of a scan-and-argmax.
    *
    * One window partitioned BY KEY (ordered by micros with a unique
    * tie-break): keys are independent, so parallelism is #keys-wide and
    * a hot key costs one task — the same bound as any per-key agg. */
  def validityIntervals(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(Times.micros(col(tsCol)), col(tieCol))
    events
      .withColumn("valid_from", Times.micros(col(tsCol)))
      .withColumn("valid_to", lead(Times.micros(col(tsCol)), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
