package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Two snapshot modes:
  *
  *   - **In-memory (default)**: `localCheckpoint` materializes the merged
  *     view and truncates lineage so the plan doesn't grow per batch.
  *     Fastest; dies with the JVM.
  *   - **Durable (`snapshotDir = Some(dir)`)**: each merge persists the
  *     view as a new parquet version via [[SnapshotStore]] (write new
  *     version → swap the state to the committed files → delete
  *     superseded), and a RESTARTED process recovers the newest committed
  *     version lazily on its first read or merge — kill the JVM
  *     mid-stream, reopen the view on the same dir, reads resume. This is
  *     the in-repo analog of the Delta/Iceberg MERGE + version-swap
  *     deployment; the query surface above it is unchanged.
  *
  * The view is small by design — it's the pre-aggregated rollup
  * (games × days), orders of magnitude below the raw stream; at
  * 100 TB-of-input this table is still only |games|×|days| rows, so the
  * per-merge rewrite stays trivially cheap.
  *
  * Locking (both modes): readers share the read lock for the DURATION of
  * their Spark job; the merge takes the write lock only for the swap +
  * superseded-storage release (unpersist in-memory, version deletion
  * durable). Without this, a merge can invalidate the snapshot a live
  * reader's job is scanning — CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (observed
  * in StreamBench serving mode), or a FileNotFound on a deleted version.
  */
final class ServingView(keys: Seq[String] =
      Seq("app_id", "time_year", "time_month", "time_day"),
    snapshotDir: Option[String] = None) {

  @volatile private var state: Option[DataFrame] = None
  private var stateRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
  private val store = snapshotDir.map(new SnapshotStore(_))
  private val rw = new java.util.concurrent.locks.ReentrantReadWriteLock()

  /** Restart recovery: adopt the newest committed snapshot as state when
    * this (fresh) instance has none. Idempotent; no-op in memory mode.
    * The snapshot carries `__batch`, so last-write-wins ordering spans
    * the restart (checkpointed streams resume batchIds monotonically). */
  private def restore(spark: SparkSession): Unit =
    if (state.isEmpty) store.foreach { st =>
      st.read(spark).foreach { snap =>
        val w = rw.writeLock()
        w.lock()
        try if (state.isEmpty) state = Some(snap)
        finally w.unlock()
      }
    }

  /** Merge one micro-batch of summary rows (schema per
    * `Review.summarySchema`) into the view. The superseded snapshot's
    * storage (checkpoint blocks or parquet version) is released on each
    * merge — over an unbounded stream the view holds ONE materialized
    * copy, not one per trigger. The NEW snapshot is materialized OUTSIDE
    * the write lock (readers keep scanning the old one); the lock guards
    * only the swap and the release. */
  def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
    restore(batch.sparkSession)
    val decomposed = Serving.decomposeTime(batch)
      .withColumn("__batch", lit(batchId))
    val unioned = state match {
      case Some(cur) => cur.unionByName(decomposed)
      case None      => decomposed
    }
    val merged = Upsert.keepLatestPerKey(unioned, keys, Seq("__batch"))
    store match {
      case Some(st) =>
        val spark = batch.sparkSession
        val v = st.write(merged)
        val committed = st.readVersion(spark, v)
        val w = rw.writeLock()
        w.lock()
        try {
          stateRdds.foreach(_.unpersist(false))
          stateRdds = Nil
          state = Some(committed)
          st.deleteBelow(spark, v)
        } finally w.unlock()
      case None =>
        val (cp, rdds) = graft.ops.Caches.localCheckpointTracked(merged)
        val w = rw.writeLock()
        w.lock()
        try {
          stateRdds.foreach(_.unpersist(false)) // superseded snapshot
          state = Some(cp)
          stateRdds = rdds
        } finally w.unlock()
    }
  }

  /** Run a read against the current view (bookkeeping columns dropped)
    * under the read lock, so a concurrent merge cannot release the
    * snapshot mid-job. All actions on the view (collect/count/write)
    * must happen inside `f`. In durable mode a fresh instance restores
    * the persisted snapshot first. */
  def read[T](f: DataFrame => T): Option[T] = {
    if (state.isEmpty)
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .foreach(restore)
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
