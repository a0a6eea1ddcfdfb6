package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators. The chronic 100 TB disease is SMALL FILES:
  * streaming micro-batches and fine-grained partitions leave millions of
  * KB-scale parquet files, and every downstream scan pays a task + footer
  * read per file. Compaction rewrites a dataset at a target file size —
  * run it on cold partitions on a schedule. */
object Maintenance {

  /** Total on-disk bytes of the parquet files under `dir` (driver-side FS
    * listing — metadata-only, same cost class as
    * [[graft.sources.ParquetMeta]]). */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (fs.getFileStatus(root).isFile) fs.getFileStatus(root).getLen
    else fs.listStatus(root).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  /** Rewrite `inDir` to `outDir` in ⌈bytes / targetFileBytes⌉ files.
    * Returns the output file count. `repartition` (round-robin) balances
    * rows across writers; pass `sortCols` to instead range-sort the
    * rewrite (repartitionByRange + sortWithinPartitions) so min/max
    * row-group stats turn later range filters into skips.
    *
    * `codec`: "snappy" (default — cheapest CPU, the hot-tier choice) or
    * "zstd" for the cold/archive rewrite — at 100 TB the ~25-40% size
    * reduction on text-heavy columns is petabyte-scale storage, paid for
    * once at compaction time rather than on every query. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, sortCols: Seq[String] = Nil,
      codec: String = "snappy"): Int = {
    val nFiles = math.max(1L,
      (parquetBytes(spark, inDir) + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles,
          sortCols.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    shaped.write.mode("overwrite").option("compression", codec)
      .parquet(outDir)
    nFiles
  }

  /** Snapshot delta keyed on `idCol`: `added` (only in `b`), `removed`
    * (only in `a`), `changed` (content differs) — the ingestion-delta
    * report between two corpus snapshots. Unchanged rows are dropped.
    *
    * Scale: the content comparison ships a 128-bit md5 per row through
    * the full-outer join, never the payload — shuffle volume is
    * ids + hashes regardless of document size. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val ha = a.select(col(idCol),
      md5(col(contentCol).cast("string")).as("__ha"))
    val hb = b.select(col(idCol),
      md5(col(contentCol).cast("string")).as("__hb"))
    ha.join(hb, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** Incremental rollup maintenance: merge partial-aggregate frames into
    * the same result a full recompute would give. The 100 TB posture for
    * a long-lived rollup is to aggregate each new ingest batch alone and
    * MERGE it with the stored partials — re-scanning three years of
    * history per day is the anti-pattern. Works for any algebraic
    * aggregate carried as a summable partial (sum, count; avg as
    * sum÷count at read time; min/max via their own merge — pass them
    * through `mergeExprs` if needed).
    *
    * Scale shape: the union reads only aggregate frames (bounded by
    * |groups| per part, not rows), and the merge groupBy is map-side
    * combined over those frames. */
  def mergePartialAggregates(parts: Seq[DataFrame], keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergePartialAggregates needs at least one part")
    require(sumCols.nonEmpty, "mergePartialAggregates needs sum columns")
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
