package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch point-in-interval (range) join: events with `ts` ∈
  * [start, end) of an intervals table — sessions, campaigns, incident
  * windows, validity periods.
  *
  * Spark plans a bare theta join (`e.ts >= i.s AND e.ts < i.e`) as
  * BroadcastNestedLoopJoin — O(|events| × |intervals|) comparisons, the
  * classic 100 TB cliff. This operator makes the join EQUI by bucketizing
  * time: an event lives in exactly ONE `bucketSec` bucket, an interval
  * explodes to every bucket it overlaps, the join runs hash-partitioned
  * on the bucket key, and the exact predicate filters within bucket
  * matches. Each qualifying (event, interval) pair meets in exactly one
  * bucket — no dedup step.
  *
  * Cost: shuffle |events| + Σ interval spans/bucketSec; pick `bucketSec`
  * near the MEDIAN interval length so most intervals explode to ~2 rows.
  * Long-tail intervals cost span/bucketSec rows each — for heavy-tailed
  * interval sets, split tiers by length and union two bucketized joins. */
object RangeJoin {

  /** Inner point-in-interval join, `[startCol, endCol)` half-open.
    * Column names must not collide between the two inputs (alias first). */
  def intervalJoin(events: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucketSec: Long): DataFrame = {
    val ev = events.withColumn("__b",
      floor(Times.seconds(col(tsCol)) / bucketSec).cast("long"))
    val iv = intervals.withColumn("__b", explode(sequence(
      floor(Times.seconds(col(startCol)) / bucketSec).cast("long"),
      floor(Times.seconds(col(endCol)) / bucketSec).cast("long"))))
    ev.join(iv, Seq("__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__b")
  }

  /** Two-tier variant for HEAVY-TAILED interval lengths: with one bucket
    * size, a tail interval costs span/bucketSec exploded rows (a month-
    * long interval at 1-hour buckets is 720 rows — multiplied by every
    * tail interval). Here intervals with span < `longBucketSec` bucketize
    * at `bucketSec`; the tail bucketizes at `longBucketSec`, so EVERY
    * interval explodes to at most max(longBucketSec/bucketSec,
    * span/longBucketSec) + 1 rows — pick `longBucketSec` near the tail
    * median to bound both. Each interval lives in exactly one tier and
    * each qualifying pair meets in exactly one bucket of that tier, so
    * the union needs no dedup. Cost: events shuffle once per tier; worth
    * it as soon as the tail's explosion dominates (the spec's 1000:1
    * tail shrinks exploded rows ~9× while returning identical pairs).
    * Generalizes to k tiers by chaining; two cover most telemetry
    * (session-length body + campaign/incident tail). */
  def intervalJoinTiered(events: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSec: Long, longBucketSec: Long): DataFrame = {
    require(longBucketSec > bucketSec,
      s"longBucketSec ($longBucketSec) must exceed bucketSec ($bucketSec)")
    val span = Times.seconds(col(endCol)) - Times.seconds(col(startCol))
    intervalJoin(events, tsCol, intervals.filter(span < longBucketSec),
        startCol, endCol, bucketSec)
      .unionByName(intervalJoin(events, tsCol,
        intervals.filter(span >= longBucketSec),
        startCol, endCol, longBucketSec))
  }

  /** Exploded-row count an interval set costs at `bucketSec` — the cost
    * model behind tier sizing (σ of span/bucketSec + 1). */
  def explodedRows(intervals: DataFrame, startCol: String, endCol: String,
      bucketSec: Long): Long = intervals.select(sum(
      floor(Times.seconds(col(endCol)) / bucketSec).cast("long")
        - floor(Times.seconds(col(startCol)) / bucketSec).cast("long")
        + lit(1L))).head.getLong(0)
}
