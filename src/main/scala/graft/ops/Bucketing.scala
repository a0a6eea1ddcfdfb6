package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout: pay a fact table's shuffle ONCE at write time,
  * then every key-equi join / aggregation on the bucket key plans with NO
  * Exchange on that side — the storage-level co-location story a 100 TB
  * warehouse runs on (nightly facts land bucketed; every downstream join
  * against them starts from co-partitioned files).
  *
  * Mechanics: `bucketBy(n, key)` routes rows to files by the SAME
  * Murmur3-hash partitioning Catalyst plans for shuffles, so the reader
  * reports `HashPartitioning(key, n)` and the join/agg requirement is
  * already met. The pre-`repartition(n, key)` makes each task hold
  * exactly one bucket ⇒ ONE file per bucket; with `sortBy(key)` that also
  * hands the reader a valid per-bucket sort order, letting sort-merge
  * join skip its Sort as well (Spark discards sortedness when a bucket
  * has multiple files). Bucket metadata only flows through the table
  * catalog — `spark.table`, never raw `read.parquet`.
  *
  * Sizing at 100 TB: pick buckets so one bucket of the LARGER table fits
  * an executor core's working set (≈ rows·rowWidth/buckets ≤ a few
  * hundred MB); both join sides must use the same bucket count (Spark
  * only elides the shuffle on equal counts, or one-side multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`). */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted parquet table (one
    * file per bucket — see object doc). Overwrites any prior table,
    * including a stale warehouse directory left by an earlier JVM (the
    * in-memory catalog forgets the table but `saveAsTable` refuses the
    * existing managed location). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.repartition(buckets, col(keyCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  private val built = scala.collection.concurrent.TrieMap[String, Unit]()

  /** Idempotent per-JVM ensure-then-read: builds the bucketed table once
    * per JVM (overwriting stale copies from earlier runs), then reads it
    * back through the catalog so the bucketing metadata reaches the
    * planner.
    *
    * `table` IS the cache key: it must uniquely identify the source data
    * (derive it from the full sanitized input path, never a truncated
    * hash — colliding names would silently serve the first dataset's
    * buckets for the second). The cache also never invalidates within a
    * JVM; if the underlying fixture can change mid-JVM, drop the table
    * first. */
  def ensure(spark: SparkSession, table: String, keyCol: String,
      buckets: Int)(build: => DataFrame): DataFrame = {
    built.getOrElseUpdate(table, writeBucketed(build, table, keyCol, buckets))
    spark.table(table)
  }
}
