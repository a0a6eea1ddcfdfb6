package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the "shuffle the training data"
  * step of an LLM data pipeline, as a reproducible TOTAL ORDER rather than
  * an RNG pass: position = rank of md5(seed | row key). Same hash-not-RNG
  * rationale as [[Sampling.hashSample]]: stable under repartitioning and
  * retries, reproducible in any md5-capable engine, and re-keyable per
  * epoch by changing `seed`.
  *
  * `row_number() OVER (ORDER BY ...)` — the obvious encoding — plans to a
  * SINGLE-partition window: the whole corpus through one task. This
  * implementation gets the identical answer with bounded parallelism:
  *
  *   1. range-repartition by the shuffle key (`partitions` ranges);
  *   2. census: one count per range (a `partitions`-row aggregate), cumsum
  *      to per-range offsets with a window over those few rows;
  *   3. intra-range rank (window partitioned by range id) + broadcast-join
  *      the offsets: pos = offset + intra_rank − 1.
  *
  * The input is persisted after step 1 because the range partitioner
  * SAMPLES its boundaries — the census and the rank pass must see the same
  * physical partitioning (pinned by the persist), even though the final
  * positions are boundary-independent.
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
    val parted = keyed
      .repartitionByRange(partitions, col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val offsets = parted.groupBy("__pid").count()
      .withColumn("__off",
        coalesce(sum("count").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val ranked = parted.withColumn("__r",
      row_number().over(Window.partitionBy("__pid")
        .orderBy(col("__k"), col(idCol))))
    ranked.join(broadcast(offsets), Seq("__pid"))
      .withColumn("pos", col("__off") + col("__r") - 1)
      .drop("__k", "__pid", "__r", "__off")
  }
}
