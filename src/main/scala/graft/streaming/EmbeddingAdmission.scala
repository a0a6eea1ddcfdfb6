package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.ext.{Dedup, Vectors}

/** Streaming SEMANTIC admission — the embedding arm of streaming
  * curation ([[StreamDedup]] = exact, [[NearDupAdmission]] = MinHash,
  * [[SpanAdmission]] = spans): an incoming vector is REJECTED iff its
  * EXACT COSINE to an already-admitted vector sharing a sign-sketch
  * bucket is ≥ `threshold` (the micro-batch twin of
  * [[Dedup.embeddingDupPairsFromBuckets]]' blocked-verify shape), or to
  * a lower-id vector of the same batch under the same rule — the
  * keep-lowest-id, non-transitive convention of the whole admission
  * family. You dedup against the corpus you KEPT: only admitted
  * vectors register.
  *
  * Registry rows carry (t, bucket, id, embedding): sketch AND vector
  * ride together, so candidate blocking and the exact-cosine verify
  * read ONE registry (a bucket-only registry would reject on sketch
  * collision alone — cheap but precision-lossy; the vector payload is
  * the price of exact-threshold semantics, `tables` × dim floats per
  * admitted doc). Same foreachBatch-against-[[AdmissionRegistry]]
  * shape as the siblings: per-batch overwrite appends + own-batch
  * exclusion make replay exactly-once, reads fail closed, directories
  * compact on the committed-watermark schedule.
  *
  * Scale shape (100 TB/day): the admission join hash-partitions batch
  * buckets against registry buckets — Σ bucket² work per table, the
  * same S-curve economics as the batch family; `planes` must follow
  * the corpus sizing rule (planes ≈ log2(n/32), [[Dedup]] class doc)
  * as the ADMITTED set grows. */
class EmbeddingAdmission(stateDir: String, vecCol: String, idCol: String,
    threshold: Double, planes: Int = 4, tables: Int = 8, dim: Int = 64,
    seed: Long = 42L, compactEvery: Int = 64,
    shards: Int = 16,
    targetShardBytes: Long = 16L << 20) extends Serializable {

  // Sharded by the probe key (t, bucket): a vector contributes ONE
  // bucket per table, so a trigger touches ≤ |batch| × tables shards
  // and the history probe prunes to those — it reads (and pays the
  // vector-payload width of) only the touched slice of the registry,
  // not the whole admitted corpus. Same key discipline as the batch
  // tier's sharded bucket index (Dedup.writeShardedBucketIndex).
  private val registry = new AdmissionRegistry(stateDir, StructType(Seq(
    StructField("t", IntegerType), StructField("bucket", LongType),
    StructField("id", LongType),
    StructField("embedding", ArrayType(FloatType)))),
    shardCols = Seq("t", "bucket"), shards = shards,
    targetShardBytes = targetShardBytes)

  /** (id, t, bucket, embedding) for every vector in `batch`. */
  private def buckets(batch: DataFrame): DataFrame = {
    val vecs = batch.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("embedding"))
    Dedup.embeddingBucketTable(vecs, "embedding", "id", planes, tables,
        dim, seed)
      .join(vecs, Seq("id"))
  }

  /** Admit one micro-batch: returns the admitted rows (original schema)
    * and registers their (bucket, vector) rows under `batchId`. */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    registry.maybeCompact(spark, batchId, compactEvery)
    // bf feeds four consumers (touched-shard job, history probe, the
    // in-batch self-join's two sides, registry append) — cache it.
    val bf = buckets(batch).persist()
    try {
      val cos = (a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =>
        Vectors.cosineNative(spark, a, b)
      val tokens = registry.probeTokens(bf)
      val hist = registry.historyTouched(spark, batchId, tokens)
        .select(col("t"), col("bucket"), col("embedding").as("__he"))
      val vsHistory = bf.join(hist, Seq("t", "bucket"))
        .filter(cos(col("embedding"), col("__he")) >= threshold)
        .select(col("id")).distinct()
      val vsBatch = bf.select(col("t"), col("bucket"),
          col("id").as("__ka"), col("embedding").as("__ea"))
        .join(bf.select(col("t"), col("bucket"), col("id"),
          col("embedding")), Seq("t", "bucket"))
        .filter(col("__ka") < col("id") &&
          cos(col("__ea"), col("embedding")) >= threshold)
        .select(col("id")).distinct()
      // localCheckpoint: see NearDupAdmission — stops the caller's
      // consumption of `admitted` from re-running the sketch/cosine DAG
      // after bf is unpersisted.
      val rejected = vsHistory.union(vsBatch).distinct().localCheckpoint()
      val admitted = batch.join(
        rejected.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      registry.append(
        bf.join(admitted.select(col(idCol).cast("long").as("id")),
            Seq("id"), "left_semi")
          .select("t", "bucket", "id", "embedding"), batchId)
      admitted
    } finally bf.unpersist()
  }

  /** Fold committed batch directories ≤ `uptoBatchId` into one. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      uptoBatchId: Long): Int = registry.compact(spark, uptoBatchId)

  /** `foreachBatch` adapter. */
  def step(forward: (DataFrame, Long) => Unit)(
      batch: DataFrame, batchId: Long): Unit =
    forward(admit(batch, batchId), batchId)
}
