package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized `spark.read.parquet` for persisted artifact paths.
  *
  * Every `read.parquet(path)` call pays a fresh driver-side file listing
  * plus a schema-inference footer read that Spark runs as a small JOB —
  * and the query registry re-reads the same write-once artifacts (gram
  * index, censuses, sharded label/band/bucket layouts) on every query
  * build and every bench sample. Reusing the analyzed DataFrame
  * (immutable; sharing is safe) keeps ONE InMemoryFileIndex per artifact
  * per session: a pure fixed-cost cut with no change to plan shape — at
  * cluster scale it is the guide §6 listing-cache posture applied to the
  * engine's own artifacts.
  *
  * Staleness contract: artifact WRITERS call [[invalidate]] with the
  * path they (re)wrote — the next read re-lists. Reads of paths that are
  * mutated outside the engine's writers must not go through here.
  */
object Pq {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]())

  def read(spark: SparkSession, path: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        cache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(path, spark.read.parquet(path))
  }

  /** Drop every cached frame at or under `path` (and any cached parent
    * whose listing would now be stale) — called by the engine's artifact
    * writers after a write/append so the next [[read]] re-lists. */
  def invalidate(path: String): Unit = cache.synchronized {
    val it = cache.values().iterator()
    while (it.hasNext) {
      val m = it.next()
      m.keys.foreach { k =>
        if (k == path || k.startsWith(path + "/") ||
            path.startsWith(k + "/")) m.remove(k)
      }
    }
  }
}
