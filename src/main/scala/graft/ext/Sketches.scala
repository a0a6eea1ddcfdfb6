package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * At 100 TB, `count_distinct` is the aggregate that does NOT scale: it
  * plans an Expand + exact shuffle of every distinct value. The sketch
  * path ships a fixed-size binary register set per group instead, and —
  * the property this module exists for — sketches are MERGEABLE: the
  * sketch of yesterday's partition unioned with today's equals the
  * sketch of the whole, so long-lived per-source/per-day distinct-user
  * rollups maintain incrementally like the summable partials in
  * [[graft.ops.Maintenance.mergePartialAggregates]], never rescanning
  * history. Estimates are deterministic for a given input set (the hash
  * is fixed), but NOT reproducible by another engine's hash family —
  * the registry query therefore carries structural checks (error bound
  * vs exact, merge == whole) instead of a DuckDB oracle.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (binary, mergeable), lgK=12
    * (≈1.6% relative standard error, 4 KB registers max). */
  def distinctSketch(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(12)).as("sketch"))

  /** Merge partial sketch frames (e.g. one per ingest day) into the
    * per-group sketch of their union — the incremental-maintenance path:
    * the union reads |groups|-bounded frames, never the raw history. */
  def mergeSketches(parts: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeSketches needs at least one part")
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
  }

  /** Replace the binary sketch with its cardinality estimate. */
  def estimate(df: DataFrame): DataFrame =
    df.withColumn("approx_distinct", hll_sketch_estimate(col("sketch")))
      .drop("sketch")
}
