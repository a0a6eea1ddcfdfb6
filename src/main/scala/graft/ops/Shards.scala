package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export: the write side of the curation pipeline. Given
  * a corpus with a global position (`pos` from
  * [[Shuffling.deterministicShuffle]]), assign contiguous position
  * blocks to numbered shards and write one sorted parquet file per shard
  * — the layout a data loader streams sequentially with deterministic,
  * resumable order.
  *
  * Shape: shard id is a pure projection (`pos DIV docsPerShard` —
  * integer DIV, see the Tables ±1 µs lesson on `/`), the write
  * repartitions BY the shard column (one file's rows meet in one task)
  * and sorts within partitions by position, then `partitionBy(shard)`
  * lays out one directory per shard. One shuffle total; shard count =
  * ⌈n/docsPerShard⌉ keeps tasks uniform because positions are a dense
  * permutation — no salting needed, the shuffle key is already
  * perfectly balanced. */
object Shards {

  /** Adds `shard` = pos DIV `docsPerShard` (requires a dense 0-based
    * `posCol` for equal-size shards; the last shard may be short). */
  def assign(df: DataFrame, posCol: String, docsPerShard: Long): DataFrame =
    df.withColumn("shard", expr(s"$posCol DIV $docsPerShard"))

  /** Write `df` as one sorted parquet directory per shard under `path`.
    * Returns the shard count. */
  def write(df: DataFrame, posCol: String, docsPerShard: Long,
      path: String): Long = {
    val sharded = assign(df, posCol, docsPerShard)
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(posCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    sharded.select(col("shard")).distinct().count()
  }
}
