package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-versioned snapshot store — the minimal in-repo analog of the
  * Delta/Iceberg versioned-table swap named in [[ServingView]]'s docs:
  * write the new version as its own directory, commit it, retire the
  * superseded ones. Survives JVM death: a restarted process lists the
  * store and resumes from the newest COMMITTED version.
  *
  * Commit protocol: a version is the directory `v=<n>`, and it is
  * committed iff Spark's `_SUCCESS` marker exists inside it (written
  * last, at job-commit time). A writer that dies mid-write leaves a
  * marker-less directory that every reader ignores and the next write
  * overwrites — no separate pointer file, so there is no pointer-swap
  * window to make atomic. Version discovery is a driver-side listing
  * (|versions| entries, metadata-only).
  *
  * Concurrency: single writer (the streaming merge), in-JVM readers
  * coordinated by the caller's read/write lock — [[ServingView]] deletes
  * superseded versions only under its write lock, so a live reader's
  * scan never loses its files. Cross-process readers should pin a
  * version ([[readVersion]]) rather than re-resolving current. */
final class SnapshotStore(root: String) extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionDirs(spark: SparkSession): Seq[(Long, Path)] = {
    val f = fs(spark)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Nil
    else f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong, s.getPath))
  }

  /** Newest committed version, if any. */
  def currentVersion(spark: SparkSession): Option[Long] = {
    val f = fs(spark)
    versionDirs(spark)
      .filter { case (_, p) => f.exists(new Path(p, "_SUCCESS")) }
      .map(_._1).sorted.lastOption
  }

  /** The frame of a specific committed version. */
  def readVersion(spark: SparkSession, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** The newest committed snapshot, if any — restart recovery reads
    * this. */
  def read(spark: SparkSession): Option[DataFrame] =
    currentVersion(spark).map(readVersion(spark, _))

  /** Persist `df` as the next version (overwrite semantics, so a retry
    * after a mid-write crash is idempotent). Returns the new version.
    * Does NOT delete superseded versions — the caller retires them via
    * [[deleteBelow]] once no reader can hold them. */
  def write(df: DataFrame): Long = {
    val next = currentVersion(df.sparkSession).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    next
  }

  /** Delete every version directory strictly below `version` (committed
    * or not). Returns how many were removed. */
  def deleteBelow(spark: SparkSession, version: Long): Int = {
    val f = fs(spark)
    val olds = versionDirs(spark).filter(_._1 < version)
    olds.foreach { case (_, p) => f.delete(p, true) }
    olds.size
  }
}
