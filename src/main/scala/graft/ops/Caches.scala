package graft.ops

import org.apache.spark.sql.Dataset

/** Session-lifetime hygiene for library-internal `persist()` calls.
  *
  * Several operators cache an intermediate that feeds multiple branches
  * of one returned plan (MinHash signature tables, LSH vector tables,
  * n-gram posting lists). The cache must outlive the RETURNED DataFrame's
  * first action — which a lazy library function cannot observe — so the
  * operator cannot unpersist it itself. Left untracked, repeated calls
  * (one `deterministicShuffle` per epoch, one dedup pass per snapshot)
  * accumulate cached copies of corpus-sized intermediates until LRU
  * eviction thrashes the executors.
  *
  * Contract: operators persist through [[track]]; callers invoke
  * [[releaseAll]] once the results of a call batch are materialized
  * (written, collected, or counted). The harnesses do this per query
  * (`Verify`/`Bench` clear between queries); long-lived sessions should
  * call it at pipeline-stage boundaries. `releaseAll` is safe while
  * later queries still REFERENCE a released frame — the plan recomputes
  * instead of reading cache — so the worst case of a missing call is
  * wasted work, never wrong results.
  */
object Caches {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val liveRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** `ds.persist()` + register for [[releaseAll]]. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    live.add(ds)
    ds.persist()
  }

  /** Register an ALREADY-persisted Dataset for [[releaseAll]] without
    * re-persisting (operators that manage round-by-round unpersists
    * themselves hand over only the surviving frame). */
  def trackLive(ds: Dataset[_]): Unit = live.add(ds)

  /** Register a checkpoint-backing RDD for [[releaseAll]]. Unlike
    * [[track]]'s Dataset persists, a localCheckpoint's storage lives
    * OUTSIDE the cache manager (`catalog.clearCache()` never drains it)
    * and its lineage is truncated — a frame built on it CANNOT be
    * recomputed after release, so only call this for checkpoints whose
    * consumers are done before the next `releaseAll`. */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = liveRdds.add(rdd)

  /** Eager `localCheckpoint` that also returns the RDDs the checkpoint
    * persisted (captured by diffing the context's persistent-RDD set —
    * call from single-threaded driver control flow only). Iterative
    * algorithms use this to unpersist SUPERSEDED rounds instead of
    * accumulating O(iterations) cached copies. */
  def localCheckpointTracked(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(true)
    val added = sc.getPersistentRDDs.collect {
      case (id, r) if !before.contains(id) => r
    }.toSeq
    (cp, added)
  }

  /** Unpersist (non-blocking) everything tracked since the last call. */
  def releaseAll(): Unit = {
    var ds = live.poll()
    while (ds != null) {
      ds.unpersist(false)
      ds = live.poll()
    }
    var rdd = liveRdds.poll()
    while (rdd != null) {
      rdd.unpersist(false)
      rdd = liveRdds.poll()
    }
  }
}
