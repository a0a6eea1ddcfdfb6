package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training bins.
  *
  * Streaming pack in a deterministic order: bin = ⌊exclusive-cumsum /
  * budget⌋ — a document lands in the bin where its first token falls, so
  * a bin overflows by at most its last document (the standard corpus-scale
  * approximation; exact first-fit bin packing is inherently sequential).
  * One window cumulative sum, exact integer arithmetic → deterministic and
  * SQL-reproducible.
  *
  * Scale: the window is PARTITIONED BY `shardCol` (source, date, path
  * prefix …) so packing parallelizes per shard — a global unsharded order
  * would serialize the cumsum into one task at 100 TB. Bins are therefore
  * per-shard; `(shard, bin)` is the training-file key.
  */
object Packing {

  def packByOrder(df: DataFrame, tokenCol: String, orderCol: String,
      shardCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("bin", floor(col("__cum") / lit(budget)))
      .withColumn("bin_offset", col("__cum") - col("bin") * lit(budget))
      .drop("__cum")
  }
}
