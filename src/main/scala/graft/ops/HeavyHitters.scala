package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Exact heavy-hitter detection without a full-vocabulary shuffle.
  *
  * The naive `GROUP BY token HAVING cnt·d >= N` is correct but shuffles
  * one partial count per distinct token per map task — at web-corpus
  * scale the vocabulary is billions of mostly-singleton tokens, so the
  * shuffle is dominated by items that cannot possibly qualify. The
  * classic two-pass fix (Misra–Gries summaries, then exact recount of
  * the survivors):
  *
  *   pass 1  per-partition Misra–Gries summary with m = d counters —
  *           bounded memory, zero shuffle. MG guarantee: any item with
  *           local frequency > n_p/(m+1) is retained. Pigeonhole: an
  *           item with global count >= N/d has local share >= n_p/d in
  *           at least one partition (else the shares sum below N/d),
  *           and n_p/d > n_p/(d+1), so the UNION of the partition
  *           summaries is a SUPERSET of every global heavy hitter.
  *           Summary volume: #partitions · d tokens — driver-trivial
  *           (1000 executors × d=200 → 200 k strings).
  *   pass 2  exact recount restricted to the candidate set: broadcast
  *           the candidates, scan-fused `isin`-style semi filter, then
  *           an ordinary partial-agg groupBy whose shuffle is bounded by
  *           #partitions · |candidates| rows instead of the vocabulary.
  *
  * The final answer is EXACT (superset candidates + exact integer
  * recount + integer threshold `cnt·d >= N`), which is what lets the
  * registry hash-check it against a plain GROUP BY .. HAVING oracle.
  */
object HeavyHitters {

  /** Misra–Gries summary of one partition: at most `m` surviving keys,
    * plus the partition's total item count (needed for the global N
    * without a third corpus scan). Emitted as (null, n_p) ++
    * (token, 0) rows. */
  private[graft] def misraGries(it: Iterator[String], m: Int)
      : Iterator[(String, Long)] = {
    val c = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { x =>
      n += 1
      c.get(x) match {
        case Some(v) => c(x) = v + 1
        case None if c.size < m => c(x) = 1L
        case None =>
          // classic MG decrement step: all counters -1, drop zeros,
          // the arriving item is not inserted
          val dead = c.iterator.collect { case (k, 1L) => k }.toList
          c.mapValuesInPlace((_, v) => v - 1)
          dead.foreach(c.remove)
      }
    }
    Iterator.single((null: String, n)) ++ c.keysIterator.map((_, 0L))
  }

  /** Tokens of `textCol` whose exact corpus frequency is >= 1/d of all
    * token occurrences. Output: (token, cnt), exact. */
  def heavyTokens(df: DataFrame, textCol: String, d: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(d >= 2, s"support denominator must be >= 2, got $d")
    def toks: Dataset[String] = Dedup.parallelize(df)
      .select(explode(Dedup.tokens(col(textCol))).as("token"))
      .as[String]
    // pass 1: bounded summaries; collect is #partitions·d tokens + one
    // count row per partition, NOT the corpus
    val summary = toks.mapPartitions(misraGries(_, d)).collect()
    val total = summary.collect { case (null, n) => n }.sum
    val candidates = summary.collect { case (t, _) if t != null => t }
      .distinct.toSeq
    // pass 2: exact recount of candidates only
    toks.toDF("token")
      .join(broadcast(candidates.toDF("token")), Seq("token"), "left_semi")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(d.toLong) >= lit(total))
  }
}
