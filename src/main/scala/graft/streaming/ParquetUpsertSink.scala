package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.Upsert

/** Durable keyed upsert materialization of a stream into parquet, via
  * `foreachBatch` — the plain-parquet stand-in for a Delta/Iceberg
  * `MERGE INTO` (same contract, swappable later; the query surface above
  * is unchanged).
  *
  * Layout: `baseDir/v=<batchId>/` holds the FULL keep-latest snapshot as
  * of that micro-batch. Each batch merges `previous snapshot ∪ batch`
  * with [[Upsert.keepLatestPerKey]] and overwrites its own version dir.
  *
  * Exactly-once without transactions: after a crash, Structured Streaming
  * re-delivers the last uncommitted batchId. The merge re-reads the
  * newest snapshot with id < batchId — a half-written `v=<batchId>` from
  * the crashed attempt is never a read source (no `_SUCCESS`) and is
  * simply overwritten. Same batch + same predecessor → byte-identical
  * snapshot: idempotent by construction, matching the at-least-once →
  * effectively-once recipe of [[ServingView]] but durable across JVMs.
  *
  * Scale: the snapshot is the KEYED VIEW (|keys| rows), not the stream —
  * rewriting it per micro-batch is O(view), the same write amplification
  * a copy-on-write lakehouse MERGE pays. Right for dashboard-scale views
  * (the reference's serving store is a few hundred keys). For views too
  * large to rewrite per batch, [[ShardedUpsertSink]] is the same
  * contract with shard-partitioned snapshots and a per-version manifest:
  * each merge rewrites only the shards the batch touches.
  */
object ParquetUpsertSink {

  /** Retained snapshot versions (current + rollback safety). */
  private val KeepVersions = 2

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed snapshot versions under `baseDir`, ascending. */
  def versions(spark: SparkSession, baseDir: String): Seq[Long] = {
    val f = fs(spark, baseDir)
    val root = new Path(baseDir)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** The current materialized view; None before the first commit. */
  def currentView(spark: SparkSession, baseDir: String): Option[DataFrame] =
    versions(spark, baseDir).lastOption.map(v =>
      spark.read.parquet(s"$baseDir/v=$v"))

  /** The foreachBatch merge body (public for direct testing — replaying a
    * batchId must be a no-op change to the committed chain). */
  def mergeBatch(spark: SparkSession, baseDir: String, keys: Seq[String],
      orderCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val prev = versions(spark, baseDir).filter(_ < batchId).lastOption
    val tagged = batch.withColumn("__batch", lit(batchId))
    val unioned = prev match {
      case Some(v) => spark.read.parquet(s"$baseDir/v=$v")
        .unionByName(tagged)
      case None => tagged
    }
    Upsert.keepLatestPerKey(unioned, keys, orderCols :+ "__batch")
      .write.mode("overwrite").parquet(s"$baseDir/v=$batchId")
    // prune old versions, never the read chain for in-flight replays
    val f = fs(spark, baseDir)
    versions(spark, baseDir).filter(_ < batchId).dropRight(KeepVersions - 1)
      .foreach(v => f.delete(new Path(s"$baseDir/v=$v"), true))
  }

  /** Attach the sink to a streaming DataFrame and start it. */
  def start(stream: DataFrame, baseDir: String, checkpointDir: String,
      keys: Seq[String], orderCols: Seq[String]): StreamingQuery = {
    val spark = stream.sparkSession
    val writer: DataStreamWriter[org.apache.spark.sql.Row] = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch(spark, baseDir, keys, orderCols) _)
    writer.start()
  }
}
