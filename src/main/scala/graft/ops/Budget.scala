package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: order the corpus by a preference key
  * (quality score, curriculum stage, …) and keep rows while the running
  * token total stays within `budget` — "give me the best N-token corpus",
  * the selection step between scoring and training.
  *
  * The running total is a GLOBAL ordered prefix sum, which the naive
  * window encoding (`sum() OVER (ORDER BY …)`) executes on a single
  * partition. Same distributed two-phase shape as
  * [[Shuffling.deterministicShuffle]]:
  *
  *   1. range-repartition by the preference order;
  *   2. census: per-range token SUBTOTALS (one row per range), cumsum to
  *      exclusive per-range offsets over those few rows;
  *   3. intra-range running sum (window per range id) + broadcast
  *      offsets: cum = offset + intra-range running sum.
  *
  * Ranges whose offset already exceeds the budget are dropped by the
  * final filter without their rows contributing further work downstream
  * (predicate on the joined offset — at 100 TB most of the corpus short-
  * circuits on the broadcast offset before any window evaluation).
  */
object Budget {

  /** Keep rows while the inclusive running `tokenCol` total (ordered by
    * `prefOrder` then `idCol` as tie-break) is ≤ `budget`. Output adds
    * `cum_tokens`, the inclusive prefix sum. `idCol` must be unique for a
    * deterministic selection. */
  def selectByBudget(df: DataFrame, tokenCol: String, prefOrder: Column,
      idCol: String, budget: Long, partitions: Int): DataFrame = {
    val order = Seq(prefOrder, col(idCol).asc)
    val parted = df
      .repartitionByRange(partitions, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // census + rank pass must see one physical partitioning
    val offsets = parted.groupBy("__pid")
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .withColumn("__off",
        coalesce(sum("__t").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    parted
      .join(broadcast(offsets), Seq("__pid"))
      .filter(col("__off") < budget) // whole-range short-circuit
      .withColumn("cum_tokens",
        col("__off") + sum(col(tokenCol).cast("long")).over(
          Window.partitionBy("__pid").orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__off")
  }
}
