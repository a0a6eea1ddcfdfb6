package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared persistent-registry core for the streaming admission family
  * ([[NearDupAdmission]] = MinHash buckets, [[SpanAdmission]] = span
  * hashes, and any future registry-gated admission). One contract, three
  * guarantees:
  *
  *   1. **Replay-safe appends.** Each micro-batch's rows land in their own
  *      `batch=<id>` subdirectory with OVERWRITE semantics, so a replayed
  *      batch rewrites its own append instead of duplicating it — and,
  *      critically, [[history]] EXCLUDES the current batch's directory.
  *      Without the exclusion, a batch that crashed between registry
  *      append and sink commit would, on replay, find its own keys in
  *      history and self-reject every doc it had admitted — silently
  *      dropping them from the output forever. With it, replay recomputes
  *      the exact same admission decisions (admit is deterministic given
  *      (batch, history)) and the sink sees the same admitted rows.
  *   2. **Fail-closed reads.** Only a genuinely absent registry (first
  *      batch ever) yields empty history, via an explicit filesystem
  *      existence check. Real read errors — corrupt files, transient IO —
  *      PROPAGATE so the micro-batch retries, rather than admitting the
  *      batch as if history were empty and letting near-dups land
  *      permanently.
  *   3. **Compactable.** Micro-batch appends are the small-files disease
  *      at 100 TB/day ingest; [[compact]] folds all batch directories at
  *      or below a watermark into one, preserving the `batch=` layout so
  *      exclusion semantics survive. Contract: only compact batches whose
  *      sink writes are durably committed (i.e. strictly below the
  *      stream's last committed batch) — a replay can then never target a
  *      compacted batch.
  *
  * Registry rows are payload-only (fixed-width hash/bucket longs); the
  * batch id lives in the directory name, Hive-partition style, so a flat
  * `spark.read.parquet(stateDir)` still sees every row (with an inferred
  * `batch` column) for audits. */
final class AdmissionRegistry(stateDir: String, schema: StructType)
    extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(stateDir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Leaf `batch=<id>` directories currently present, with their ids. */
  private def batchDirs(spark: SparkSession): Seq[(Long, Path)] = {
    val f = fs(spark)
    val root = new Path(stateDir)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath))
  }

  /** All registered rows EXCEPT batch `excludeBatchId`'s own append.
    * Empty (with the registry's schema) iff no other batch has ever
    * appended; read failures on existing data propagate (fail closed). */
  def history(spark: SparkSession, excludeBatchId: Long): DataFrame = {
    val dirs = batchDirs(spark).collect {
      case (id, p) if id != excludeBatchId => p.toString
    }
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Idempotent per-batch append: overwrites `batch=<batchId>`, so a
    * replayed batch replaces its earlier (possibly partial) append. */
  def append(rows: DataFrame, batchId: Long): Unit =
    rows.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")

  /** Scheduled compaction driven by the stream's committed watermark:
    * call at the START of processing batch `batchId` (before this
    * batch's history read/append). When foreachBatch hands the sink
    * batch N, the engine has already durably committed batch N−1 — a
    * failure can only ever replay N itself — so every directory
    * ≤ N−1 is compactable per [[compact]]'s contract, and folding them
    * into `batch=N-1` leaves the replayed batch's own-dir exclusion
    * semantics intact. No-ops unless `every > 0` and `batchId` is a
    * multiple of it, and is idempotent on replay (a second call finds a
    * single folded directory and returns early). */
  def maybeCompact(spark: SparkSession, batchId: Long, every: Int): Unit =
    if (every > 0 && batchId > 0 && batchId % every == 0)
      compact(spark, batchId - 1)

  /** Fold every `batch=` directory with id ≤ `uptoBatchId` into the
    * single directory `batch=<uptoBatchId>` (distinct rows — registry
    * reads are semi-joins, so multiplicity is irrelevant). Returns the
    * number of directories folded. Only call with a durably-committed
    * watermark (see class doc). */
  def compact(spark: SparkSession, uptoBatchId: Long,
      targetFileBytes: Long = 128L << 20): Int = {
    val olds = batchDirs(spark).filter(_._1 <= uptoBatchId)
    if (olds.size <= 1) return olds.size
    val f = fs(spark)
    val bytes = olds.map { case (_, p) =>
      f.listStatus(p).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }.sum
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val merged = spark.read.schema(schema)
      .parquet(olds.map(_._2.toString): _*).distinct()
    val tmp = new Path(s"$stateDir/.compact_tmp")
    merged.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    olds.foreach { case (_, p) => f.delete(p, true) }
    f.rename(tmp, new Path(s"$stateDir/batch=$uptoBatchId"))
    olds.size
  }
}
