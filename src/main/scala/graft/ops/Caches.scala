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

  /** `ds.persist()` + register for [[releaseAll]]. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    live.add(ds)
    ds.persist()
  }

  /** Unpersist (non-blocking) everything tracked since the last call. */
  def releaseAll(): Unit = {
    var ds = live.poll()
    while (ds != null) {
      ds.unpersist(false)
      ds = live.poll()
    }
  }
}
