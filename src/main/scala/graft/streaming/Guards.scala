package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time guard operators for a streaming curation tier — the
  * admission-control layer in front of the batch pipeline.
  *
  *   - [[admitQuota]]: per-key admission cap. A crawl's hot domains
  *     flood an ingest stream (one domain can be 30 % of a fetch wave);
  *     capping docs-per-key AT THE STREAM keeps the downstream pipeline
  *     from materializing data it will throw away. State: one counter
  *     per live key.
  *   - [[heavyHitterCandidates]]: streaming Misra–Gries over a FIXED
  *     number of hash buckets — "what's trending in the stream right
  *     now" with state bounded by buckets·m counters REGARDLESS of
  *     vocabulary size. Keying state by raw token would grow state with
  *     the vocab (exactly the unbounded-state failure mode the batch
  *     twin `ops/HeavyHitters` avoids with per-partition summaries);
  *     bucketing by token hash makes the per-bucket stream a partition
  *     in the MG sense, so the batch pigeonhole/superset guarantee
  *     carries over per bucket.
  */
object Guards {

  /** One ingest event: routing key (domain, source, tenant) + doc id. */
  final case class IngestEvent(key: String, doc_id: Long)

  /** Admitted row: `n_admitted` = the key's running admitted count
    * AFTER this row (1-based). */
  final case class Admitted(key: String, doc_id: Long, n_admitted: Long)

  final case class QuotaState(admitted: Long)

  /** Admit at most `quota` rows per key over the stream's lifetime
    * (pass `idleTimeout`, e.g. "30 minutes", to evict idle keys and
    * make the cap per-activity-burst instead). Rows beyond the cap are
    * DROPPED — flatMap's 0..n contract. The admitted COUNT per key is
    * exact and deterministic; WHICH rows of the trigger that crosses
    * the cap are admitted follows the group iterator's order, which
    * Spark does not define — align quota changes to trigger boundaries
    * if row identity matters. */
  def admitQuota(events: Dataset[IngestEvent], quota: Long,
      idleTimeout: Option[String] = None): Dataset[Admitted] = {
    implicit val stateEnc = Encoders.product[QuotaState]
    implicit val outEnc = Encoders.product[Admitted]
    implicit val keyEnc = Encoders.STRING
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, timeoutConf) {
        (key: String, evs: Iterator[IngestEvent], state: GroupState[QuotaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.map(_.admitted).getOrElse(0L)
            val out = evs.takeWhile(_ => n < quota).map { e =>
              n += 1; Admitted(key, e.doc_id, n)
            }.toList // drain while the counter is live
            state.update(QuotaState(n))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Current heavy-hitter candidates of one bucket. `est` is the MG
    * counter (undercounts by ≤ bucket_n/(m+1)); `bucket_n` the bucket's
    * total items so far — callers threshold with est + error bound, or
    * recount candidates exactly in batch (ops/HeavyHitters pass 2). */
  final case class HHCandidate(bucket: Int, token: String, est: Long,
      bucket_n: Long)

  final case class MGState(counters: Map[String, Long], n: Long)

  /** Streaming Misra–Gries candidates: tokens hashed into `buckets`
    * groups, each group folding an m-counter MG summary in state; every
    * trigger re-emits the touched buckets' current candidates (update
    * semantics). Total state: buckets · m counters, vocab-independent. */
  def heavyHitterCandidates(tokens: Dataset[String], buckets: Int,
      m: Int): Dataset[HHCandidate] = {
    implicit val stateEnc = Encoders.product[MGState]
    implicit val outEnc = Encoders.product[HHCandidate]
    implicit val keyEnc = Encoders.scalaInt
    tokens.groupByKey(t => math.floorMod(t.hashCode, buckets))
      .flatMapGroupsWithState[MGState, HHCandidate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, toks: Iterator[String], state: GroupState[MGState]) =>
          val c = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.counters.foreach { case (k, v) => c(k) = v })
          var n = state.getOption.map(_.n).getOrElse(0L)
          toks.foreach { x =>
            n += 1
            c.get(x) match {
              case Some(v) => c(x) = v + 1
              case None if c.size < m => c(x) = 1L
              case None =>
                val dead = c.iterator.collect { case (k, 1L) => k }.toList
                c.mapValuesInPlace((_, v) => v - 1)
                dead.foreach(c.remove)
            }
          }
          state.update(MGState(c.toMap, n))
          c.iterator.map { case (t, est) => HHCandidate(bucket, t, est, n) }
      }
  }
}
