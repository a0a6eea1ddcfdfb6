package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Serving, Upsert}

/** The serving tier's keyed materialized view (K2).
  *
  * The reference holds summary rows in a mutable pandas frame keyed by
  * `(app_id, time_year, time_month, time_day)` and overwrites-or-appends
  * per incoming message (`visualizer.py:30-44,61-82`). Here each
  * update-mode micro-batch is merged relationally: union with the current
  * view, keep the latest row per key (`Upsert.keepLatestPerKey` ordered by
  * arrival batch). Replays are harmless — last-write-wins per key makes the
  * merge idempotent, which is exactly the property that turns the
  * at-least-once Kafka feed into an effectively-consistent view
  * (SURVEY §2.10 "exactly-once" row).
  *
  * `localCheckpoint` materializes the merged view and truncates lineage so
  * the plan doesn't grow per batch. The view is small by design — it's the
  * pre-aggregated rollup (games × days), orders of magnitude below the raw
  * stream; at 100 TB-of-input this table is still only |games|×|days| rows.
  * (A cluster deployment would swap this for a Delta/Iceberg MERGE INTO
  * keyed on the same tuple; the query surface above it is unchanged.)
  */
final class ServingView(keys: Seq[String] =
    Seq("app_id", "time_year", "time_month", "time_day")) {

  @volatile private var state: Option[DataFrame] = None
  private var stateRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
  // Readers share the read lock for the DURATION of their Spark job;
  // the merge takes the write lock only for the swap + superseded-storage
  // release. Without this, a merge can unpersist the snapshot a live
  // reader's job is scanning — the executor then fails with
  // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (observed in StreamBench serving
  // mode once merges got fast enough to land mid-read).
  private val rw = new java.util.concurrent.locks.ReentrantReadWriteLock()

  /** Merge one micro-batch of summary rows (schema per
    * `Review.summarySchema`) into the view. The superseded snapshot's
    * checkpoint storage is released on each merge — over an unbounded
    * stream the view holds ONE materialized copy, not one per trigger.
    * The NEW snapshot is materialized OUTSIDE the write lock (readers
    * keep scanning the old one); the lock guards only the swap and the
    * release. The Delta/Iceberg MERGE swap-in at cluster scale versions
    * this properly. */
  def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
    val decomposed = Serving.decomposeTime(batch)
      .withColumn("__batch", lit(batchId))
    val unioned = state match {
      case Some(cur) => cur.unionByName(decomposed)
      case None      => decomposed
    }
    val merged = Upsert.keepLatestPerKey(unioned, keys, Seq("__batch"))
    val (cp, rdds) = graft.ops.Caches.localCheckpointTracked(merged)
    val w = rw.writeLock()
    w.lock()
    try {
      stateRdds.foreach(_.unpersist(false)) // superseded snapshot
      state = Some(cp)
      stateRdds = rdds
    } finally w.unlock()
  }

  /** Run a read against the current view (bookkeeping columns dropped)
    * under the read lock, so a concurrent merge cannot release the
    * snapshot mid-job. All actions on the view (collect/count/write)
    * must happen inside `f`. */
  def read[T](f: DataFrame => T): Option[T] = {
    val r = rw.readLock()
    r.lock()
    try state.map(df => f(df.drop("__batch")))
    finally r.unlock()
  }

  /** The current view (without bookkeeping columns); empty before the
    * first batch. UNSAFE against concurrent merges once the returned
    * frame is acted on outside [[read]] — single-threaded tests only. */
  def current: Option[DataFrame] = state.map(_.drop("__batch"))
}
