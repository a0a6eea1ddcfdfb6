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
  /** PER-GROUP budget selection (e.g. "best 1M tokens from EACH source"
    * — the mixture-balancing step): keep rows while the group's running
    * token total stays ≤ `budget`. Unlike the global selection below,
    * groups are independent, so the plain partitioned window IS the
    * scale-correct plan — one hash shuffle on `groupCol`, each group's
    * prefix sum local to its partition; the census machinery would only
    * add overhead. (Skewed mega-groups bound the tail: one task per
    * group worst-case, same bound as any per-group aggregation.) */
  def selectByBudgetPerGroup(df: DataFrame, tokenCol: String,
      prefOrder: Column, idCol: String, groupCol: String,
      budget: Long): DataFrame = df
    .withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
        .orderBy(prefOrder, col(idCol).asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    .filter(col("cum_tokens") <= budget)

  /** Per-group top-p ("nucleus") mass selection: keep each group's
    * highest-preference rows until they cover fraction `p` of the
    * group's TOTAL `massCol` — "the docs carrying 60 % of each source's
    * token mass". The boundary row that crosses p is KEPT (nucleus
    * convention: exclusive running mass < p·total), so every non-empty
    * group selects at least one row. Mass sums are exact longs; the
    * threshold floor(p·total) is a single deterministic double multiply,
    * so the selection is bit-reproducible cross-engine. Groups are
    * independent → the partitioned window is the scale-correct plan
    * (same rationale as [[selectByBudgetPerGroup]]). Output adds
    * `cum_mass`, the inclusive per-group prefix. */
  def selectTopPPerGroup(df: DataFrame, massCol: String, prefOrder: Column,
      idCol: String, groupCol: String, p: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val m = col(massCol).cast("long")
    df.withColumn("cum_mass", sum(m).over(
        w.partitionBy(groupCol).orderBy(prefOrder, col(idCol).asc)
          .rowsBetween(w.unboundedPreceding, 0)))
      .withColumn("__tot", sum(m).over(w.partitionBy(groupCol)))
      .filter(col("cum_mass") - m <
        floor(lit(p) * col("__tot")).cast("long"))
      .drop("__tot")
  }

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
