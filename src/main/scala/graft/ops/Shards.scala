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

  /** Per-shard integrity MANIFEST: (shard, n_docs, n_chars, fp) — the
    * artifact a training loader verifies before scheduling a shard.
    * `fp` is an ORDER-INDEPENDENT content fingerprint: bit_xor of a
    * 60-bit md5-derived integer over `id|text` per row, so any dropped,
    * duplicated, or altered row flips it, while row order (which the
    * loader may not preserve) does not. The md5 path keeps it
    * cross-engine reproducible (same family as the portable dedup
    * twins); one map-side-combined aggregation, shuffle = |shards|. */
  def manifest(sharded: DataFrame, idCol: String,
      textCol: String): DataFrame =
    sharded.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol))).as("n_chars"),
      bit_xor(conv(substring(
          md5(concat(col(idCol).cast("string"), lit("|"), col(textCol))),
          1, 15), 16, 10).cast("long")).as("fp"))
}
