package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Ingest-time curation: the batch quality gate + content dedup, composed
  * UNCHANGED on a streaming DataFrame — [[TextStats.ruleFilter]] is pure
  * per-row projections (streaming-safe by construction) and the dedup is
  * the keyed-state path of [[StreamDedup]]. Batch backfill and streaming
  * ingest therefore agree on what "kept" and "duplicate" mean: same
  * expressions, same fingerprint key.
  *
  * State note: [[curate]] carries unbounded dedup state (reference-
  * faithful); [[curateWithinWatermark]] is the production form — state
  * evicts once the event-time watermark passes, which is mandatory at
  * 100 TB/day ingest. */
object Curation {

  /** Gate on the Gopher rules, then collapse exact-content duplicates.
    * Emits only kept, first-seen documents (curation columns dropped —
    * the stream carries the original schema). */
  def curate(stream: DataFrame, textCol: String): DataFrame =
    StreamDedup.byFingerprint(
      TextStats.ruleFilter(stream, textCol).filter(col("keep"))
        .drop("keep", "reasons"),
      textCol)

  /** [[curate]] with watermark-bounded dedup state. */
  def curateWithinWatermark(stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    TextStats.ruleFilter(stream, textCol).filter(col("keep"))
      .drop("keep", "reasons")
      .withColumn("__fp", md5(graft.ext.Dedup.normalizedText(col(textCol))))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
