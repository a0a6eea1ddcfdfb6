package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the "shuffle the training data"
  * step of an LLM data pipeline, as a reproducible TOTAL ORDER rather than
  * an RNG pass: position = rank of md5(seed | row key). Same hash-not-RNG
  * rationale as [[Sampling.hashSample]]: stable under repartitioning and
  * retries, reproducible in any md5-capable engine, and re-keyable per
  * epoch by changing `seed`.
  *
  * The global rank is [[Census.prefix]]'s distributed two-phase shape
  * (range-repartition → per-range census → intra-range rank + broadcast
  * offsets), not a single-partition `row_number() OVER (ORDER BY …)`.
  */
object Shuffling {

  /** Shuffle position for every row: (input columns) + `pos` ∈ [0, n),
    * the rank of md5(seed | id) with id as tie-break. `idCol` must be
    * unique for a true permutation (positions are still deterministic
    * otherwise). */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("__k",
      md5(concat_ws("|", lit(seed), col(idCol).cast("string"))))
    Census.prefix(keyed, Seq(col("__k").asc, col(idCol).asc), lit(1L),
        partitions)
      .withColumn("pos", col("__off") + col("__run") - 1)
      .drop("__k", "__off", "__run", "__n")
  }

  /** Curriculum order: training position ascending by `stageCol`
    * (easy → hard), deterministically shuffled WITHIN each stage — the
    * standard curriculum-learning data order, where stage boundaries
    * are strict but intra-stage order must still look random. Same
    * distributed-rank machinery as [[deterministicShuffle]] with the
    * stage prepended to the order key; re-keyable per epoch via `seed`.
    * Output adds `pos` ∈ [0, n). */
  def curriculumOrder(df: DataFrame, stageCol: org.apache.spark.sql.Column,
      idCol: String, seed: String, partitions: Int): DataFrame = {
    require(!df.columns.contains("stage") && !df.columns.contains("pos"),
      "curriculumOrder adds `stage` and `pos`; input already has one")
    val keyed = df.withColumn("__stage", stageCol)
      .withColumn("__k",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string"))))
    Census.prefix(keyed,
        Seq(col("__stage").asc, col("__k").asc, col(idCol).asc), lit(1L),
        partitions)
      .withColumn("pos", col("__off") + col("__run") - 1)
      .withColumnRenamed("__stage", "stage")
      .drop("__k", "__off", "__run", "__n")
  }

  /** Source-interleaved order: global position by (per-source shuffle
    * rank, source) — position 0..k-1 is one row from each of the k
    * sources, then the next row of each, round-robin until a source
    * exhausts. Training batches drawn from a prefix of this order are
    * maximally source-diverse (a plain global shuffle only gives
    * diversity in expectation; a clumped batch is a gradient-bias
    * sample). Plan: one source-partitioned window for the per-source
    * rank, then the census distributed rank over (rank, source) — no
    * single-partition global window. Output adds `pos` ∈ [0, n). */
  def interleaveBySource(df: DataFrame, idCol: String, sourceCol: String,
      seed: String, partitions: Int): DataFrame = {
    require(!df.columns.contains("pos"),
      "interleaveBySource adds `pos`; input already has it")
    val w = org.apache.spark.sql.expressions.Window
    val ranked = df
      .withColumn("__k",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .withColumn("__r", row_number().over(
        w.partitionBy(sourceCol).orderBy(col("__k"), col(idCol))))
    Census.prefix(ranked,
        Seq(col("__r").asc, col(sourceCol).asc, col(idCol).asc), lit(1L),
        partitions)
      .withColumn("pos", col("__off") + col("__run") - 1)
      .drop("__k", "__r", "__off", "__run", "__n")
  }
}
