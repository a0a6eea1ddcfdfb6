package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A plain `groupBy(hotKey)` sends every row of a hot key to ONE reduce
  * task — at 100 TB a single "popular game" key can be 10% of the corpus
  * and the stage runs at the speed of that one task. Salting splits each
  * key into `saltBuckets` sub-groups (phase 1: `groupBy(key, salt)` —
  * parallelism × saltBuckets, map-side combine still applies), then merges
  * the per-salt partials (phase 2: `groupBy(key)` over ≤ saltBuckets rows
  * per key — trivially small).
  *
  * Only ALGEBRAIC aggregates decompose this way (sum/count/min/max, and
  * avg as sum÷count). The helper takes phase-1 partial definitions and
  * phase-2 merge definitions explicitly, so the decomposition is visible
  * and testable rather than magical.
  *
  * Note Spark's AQE skew-join handling (`spark.sql.adaptive.skewJoin.*`)
  * covers JOIN skew at runtime; aggregation skew over a low-cardinality
  * key set is what this helper is for — AQE cannot split a single group.
  */
object Skew {

  /** `saltedAggregate(df, Seq("k"), 32, partials, merges)`:
    * phase-1 partials are (aggExpr, alias) over the salted groups; phase-2
    * merges are (aggExpr-over-partial-alias, final alias). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[(Column, String)],
      merges: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, a) => c.as(a) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._1.as(merges.head._2),
        merges.tail.map { case (c, a) => c.as(a) }: _*)
  }

  /** Skew-safe equi-join: salt the big (skewed) side, replicate the small
    * side once per salt bucket, join on (keys, salt).
    *
    * Exactly equivalent to `big.join(small, keys)` (inner): every big row
    * carries ONE salt value and the small side carries ALL of them, so each
    * matching (big, small) pair meets in exactly one bucket. The hot key's
    * rows now spread across `saltBuckets` reduce tasks instead of one.
    *
    * When to reach for this instead of the built-ins, in order:
    *  1. `broadcast(small)` — if the small side fits an executor, skew is
    *     moot; always prefer it.
    *  2. AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`) — splits
    *     oversized SORT-MERGE partitions at runtime; covers most cases.
    *  3. This helper — when the join must shuffle (small side too big to
    *     broadcast) AND the downstream plan re-uses the join's partitioning
    *     (AQE skew-split is disabled when the output partitioning is
    *     required by a parent, e.g. a following groupBy on the same key),
    *     or on engines/configs without AQE. Cost: |small| × saltBuckets
    *     replication — size saltBuckets accordingly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int = 32): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** The common case pre-packaged: per-key count, sum and avg of
    * `valueCol` — avg decomposed as Σsum/Σcount (exact, not
    * mean-of-means). */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 32): DataFrame =
    saltedAggregate(df, keys, saltBuckets,
      partials = Seq(
        (count(lit(1)), "p_cnt"),
        (sum(col(valueCol)), "p_sum"),
        (min(col(valueCol)), "p_min"),
        (max(col(valueCol)), "p_max")),
      merges = Seq(
        (sum(col("p_cnt")), "n"),
        (sum(col("p_sum")), "sum"),
        (min(col("p_min")), "min"),
        (max(col("p_max")), "max")))
      .withColumn("avg", col("sum") / col("n"))
}
