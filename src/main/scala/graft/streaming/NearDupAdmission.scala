package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ext.Dedup

/** Streaming NEAR-duplicate admission: the MinHash+LSH arm of the
  * streaming dedup story ([[StreamDedup]] covers exact/fingerprint).
  *
  * A doc's LSH band buckets ([[Dedup.lshBandKeys]] over
  * [[Dedup.minhashSignatures]]) are its near-dup identity: two docs with
  * signature-estimated Jaccard above the S-curve knee share ≥ 1 bucket
  * with high probability. Admission is therefore a BUCKET-SET lookup, and
  * the production shape is micro-batch (`foreachBatch`) against a
  * persistent bucket registry — NOT per-row state-store logic: a doc maps
  * to `bands` buckets, so a single-key `flatMapGroupsWithState` cannot
  * decide admission (the decision spans all of a doc's buckets), while a
  * per-batch join decides every doc in one shuffle.
  *
  * Semantics match the batch family: a doc is REJECTED iff it shares a
  * bucket with an already-admitted doc (history) or with a lower-id doc
  * of the same batch — the same keep-lowest-id, non-transitive convention
  * as `Dedup.minhashDedup` (docs − id_b closure). The registry holds
  * ADMITTED docs' buckets only: you dedup against the corpus you KEPT,
  * so near-dups of a rejected doc that match no admitted doc still land.
  *
  * Scale shape (100 TB/day ingest): registry rows are (band, bucket)
  * longs — |admitted| × bands fixed-width rows, SHARD-PARTITIONED on
  * disk by hash(band, bucket) with a SELF-SIZED shard count (compaction
  * re-shards to constant shard SIZE as the registry grows — see
  * [[AdmissionRegistry]] guarantee 2), so a trigger's history probe
  * reads only the `shard=` directories its own buckets touch and
  * per-trigger bytes PLATEAU at ≈ |batch| × bands × targetShardBytes +
  * the uncompacted tail — constant in corpus lifetime, where any fixed
  * shard count saturates and degrades to the full registry read
  * (measured in AdmissionLatency). The admission join then
  * hash-partitions batch buckets (|batch| × bands rows) against the
  * pruned read. Persistence goes through
  * [[AdmissionRegistry]]: per-batch overwrite appends + own-batch
  * exclusion on the history read make replay exactly-once (a replayed
  * batch recomputes identical admission decisions instead of
  * self-rejecting against its own prior append), registry read
  * failures fail closed, and batch directories compact on a schedule
  * (shard layout preserved through compaction). */
class NearDupAdmission(stateDir: String, textCol: String, idCol: String,
    numHashes: Int = 32, bands: Int = 8,
    compactEvery: Int = 64, shards: Int = 16,
    targetShardBytes: Long = 16L << 20) extends Serializable {

  private val registry = new AdmissionRegistry(stateDir, StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType))),
    shardCols = Seq("band", "bucket"), shards = shards,
    targetShardBytes = targetShardBytes)

  /** (id, band, bucket) for every doc in `batch`. */
  private def buckets(batch: DataFrame): DataFrame =
    Dedup.minhashSignatures(batch, textCol, idCol, numHashes)
      .select(col("id"),
        explode(Dedup.lshBandKeys(col("sig"), numHashes, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))

  /** Admit one micro-batch: returns the admitted rows (original schema)
    * and appends their buckets to the registry under `batchId` (replay
    * of the same batchId recomputes identical decisions — history
    * excludes the batch's own earlier append). */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    // Committed-watermark compaction (every `compactEvery` batches):
    // when this batch is handed to the sink, batch `batchId-1`'s output
    // is durably committed, so folding the directories below it is
    // replay-safe — see [[AdmissionRegistry.maybeCompact]]. Keeps the
    // registry's directory count bounded on an unbounded stream.
    registry.maybeCompact(spark, batchId, compactEvery)
    // bf feeds four consumers (touched-shard job, history probe,
    // in-batch gate, registry append) — cache it for the trigger so the
    // minhash signatures are computed once per batch, not four times.
    val bf = buckets(batch).persist()
    try {
      val tokens = registry.probeTokens(bf)
      val vsHistory = bf.join(
        registry.historyTouched(spark, batchId, tokens),
        Seq("band", "bucket"), "left_semi").select(col("id")).distinct()
      val lowestPerBucket = bf.groupBy("band", "bucket")
        .agg(min(col("id")).as("__keep"))
      val vsBatch = bf.join(lowestPerBucket, Seq("band", "bucket"))
        .filter(col("id") =!= col("__keep"))
        .select(col("id")).distinct()
      // Eagerly materialize the (batch-bounded) rejected-id set into
      // the cache: the returned `admitted` frame is consumed by the
      // caller AFTER bf is unpersisted, and without this the
      // consumption re-ran the whole decision DAG (signatures, history
      // probe, joins) a second time per trigger. persist, not
      // localCheckpoint: lineage survives cache-block loss (an executor
      // decommission mid-trigger recomputes instead of failing the
      // micro-batch — review r13); the ContextCleaner reclaims the
      // blocks once the trigger's plans are unreachable.
      val rejected = vsHistory.union(vsBatch).distinct().persist()
      rejected.count()
      val admitted = batch.join(
        rejected.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      registry.append(
        bf.join(admitted.select(col(idCol).as("id")), Seq("id"), "left_semi")
          .select("band", "bucket"), batchId)
      admitted
    } finally bf.unpersist()
  }

  /** Fold committed batch directories ≤ `uptoBatchId` into one (see
    * [[AdmissionRegistry.compact]] for the replay-safety contract). */
  def compact(spark: org.apache.spark.sql.SparkSession,
      uptoBatchId: Long): Int = registry.compact(spark, uptoBatchId)

  /** `foreachBatch` adapter: admit, then hand the admitted rows to the
    * downstream writer. */
  def step(forward: (DataFrame, Long) => Unit)(
      batch: DataFrame, batchId: Long): Unit =
    forward(admit(batch, batchId), batchId)
}
