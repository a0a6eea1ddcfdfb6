package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: order the corpus by a preference key
  * (quality score, curriculum stage, …) and keep rows while the running
  * token total stays within `budget` — "give me the best N-token corpus",
  * the selection step between scoring and training.
  *
  * The running total is [[Census.prefix]]'s distributed two-phase prefix
  * sum, not a single-partition `sum() OVER (ORDER BY …)`. The census gate
  * drops every range whose broadcast offset already exceeds the budget
  * BEFORE any per-row window work — at 100 TB most of the corpus
  * short-circuits on the `partitions`-row census.
  */
object Budget {

  /** Keep rows while the inclusive running `tokenCol` total (ordered by
    * `prefOrder` then `idCol` as tie-break) is ≤ `budget`. Output adds
    * `cum_tokens`, the inclusive prefix sum. `idCol` must be unique for a
    * deterministic selection. */
  def selectByBudget(df: DataFrame, tokenCol: String, prefOrder: Column,
      idCol: String, budget: Long, partitions: Int): DataFrame =
    Census.prefix(df, Seq(prefOrder, col(idCol).asc),
        col(tokenCol).cast("long"), partitions,
        // `<=`, not `<`: a range whose exclusive offset equals the budget
        // exactly can still contribute zero-token rows (cum == budget)
        gate = off => off <= budget)
      .withColumn("cum_tokens", col("__off") + col("__run"))
      .filter(col("cum_tokens") <= budget)
      .drop("__off", "__run", "__n")
}
