package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — repartition
  * the corpus and the sample changes, and no external engine can reproduce
  * it. These operators decide membership from a HASH OF THE ROW KEY alone:
  * the sample is a pure row-wise filter (scan-fused, no shuffle, no RNG
  * state), stable under any partitioning/ordering, reproducible in any
  * md5-capable engine (the DuckDB oracle recomputes it), and consistent
  * across tables — joining two hash-samples of the same key space keeps
  * matching rows together, which row-RNG sampling cannot do.
  */
object Sampling {

  /** Keep-probability threshold: row survives iff
    * hex32(key || "#" || salt) < rate · 2³². hex32 is uniform on [0, 2³²)
    * (md5 avalanche), so the kept fraction converges to `rate`. */
  private def keep(key: Column, rate: Column, salt: String): Column =
    Dedup.hex32(concat(key.cast("string"), lit("#" + salt))) <
      (rate * lit(4294967296.0)).cast("long")

  /** Deterministic Bernoulli(rate) sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "s1"): DataFrame =
    df.filter(keep(col(keyCol), lit(rate), salt))

  /** Stratified deterministic sample: per-stratum keep rates (domain
    * mixing — e.g. downweight Common-Crawl-ish sources, keep all of a
    * curated set), `defaultRate` for unlisted strata. Single scan-fused
    * filter; the rate lookup is a literal CASE chain, not a join. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "s1"): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((stratum, r), alt) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(alt)
    }
    df.filter(keep(col(keyCol), rate, salt))
  }
}
