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

  /** Merge one micro-batch of summary rows (schema per
    * `Review.summarySchema`) into the view. The superseded snapshot's
    * checkpoint storage is released on each merge — over an unbounded
    * stream the view holds ONE materialized copy, not one per trigger.
    * (A reader that captured `current` before a merge must re-fetch it;
    * the Delta/Iceberg MERGE swap-in at cluster scale versions this
    * properly.) */
  def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
    val decomposed = Serving.decomposeTime(batch)
      .withColumn("__batch", lit(batchId))
    val unioned = state match {
      case Some(cur) => cur.unionByName(decomposed)
      case None      => decomposed
    }
    val merged = Upsert.keepLatestPerKey(unioned, keys, Seq("__batch"))
    val (cp, rdds) = graft.ops.Caches.localCheckpointTracked(merged)
    stateRdds.foreach(_.unpersist(false)) // superseded snapshot
    state = Some(cp)
    stateRdds = rdds
  }

  /** The current view (without bookkeeping columns); empty before the
    * first batch. */
  def current: Option[DataFrame] = state.map(_.drop("__batch"))
}
