package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
  * Registry rows carry (planes, t, bucket, id, embedding): sketch AND
  * vector ride together, so candidate blocking and the exact-cosine
  * verify read ONE registry (a bucket-only registry would reject on
  * sketch collision alone — cheap but precision-lossy; the vector
  * payload is the price of exact-threshold semantics).
  *
  * SELF-SIZED SKETCH WIDTH — the streaming twin of the batch tier's
  * footer-derived planes (SURVEY §14.4). A FIXED width is a scale bug:
  * expected bucket occupancy is |admitted| / 2^planes per table, so the
  * probe join's per-vector fanout (and the Σ bucket² term) grows
  * linearly with corpus lifetime — at 10⁹ admitted vectors and
  * planes=4, every probe key drags ~60 M history rows. Instead:
  *
  *   - Every width is a PREFIX of ONE `maxPlanes`-wide hyperplane
  *     family (plane p of table t is the same vector at every width —
  *     [[Dedup.embeddingBucketTableHyper]]'s contract), so buckets
  *     computed at different times under different widths are mutually
  *     consistent at equal width.
  *   - `planes` rides every registry row as DATA (and leads the shard
  *     key), so runs written under different widths coexist; the
  *     admission join matches on (planes, t, bucket) — a probe never
  *     collides across widths.
  *   - The WRITE width for a trigger is [[Dedup.sizedPlanes]] of the
  *     registered count from parquet FOOTERS
  *     ([[AdmissionRegistry.approxRows]] — no scan job), EXCLUDING the
  *     batch's own replayed append (width must be replay-deterministic
  *     or a replay would re-block under a different geometry and change
  *     decisions).
  *   - History converges to the current width FOR FREE: the registry's
  *     geometric folds rewrite runs anyway, and the `foldTransform`
  *     hook re-buckets the folded rows under the width sized to the
  *     fold's own row count (footer-free: the fold already scans what
  *     it rewrites). Old widths linger only in the O(log) small
  *     unfolded runs.
  *   - The probe computes the batch's buckets only at the widths
  *     actually PRESENT on disk (footer statistics, one value per run —
  *     O(log runs) levels), falling back to the full [planes,
  *     maxPlanes] ladder when statistics are unavailable: a bounded
  *     constant factor on probe keys, in exchange for bucket occupancy
  *     (the quadratic term) pinned ~constant for life.
  *
  * Same foreachBatch-against-[[AdmissionRegistry]] shape as the
  * siblings: per-batch overwrite appends + own-batch exclusion make
  * replay exactly-once, reads fail closed, directories fold on the
  * geometric schedule with shard-pruned probes. */
class EmbeddingAdmission(stateDir: String, vecCol: String, idCol: String,
    threshold: Double, planes: Int = 4, tables: Int = 8, dim: Int = 64,
    seed: Long = 42L, compactEvery: Int = 64,
    shards: Int = 16,
    targetShardBytes: Long = 16L << 20,
    maxPlanes: Int = 20,
    /** corpus size at which the width starts growing (one extra sign
      * bit per doubling past it) — [[Dedup.sizedPlanes]]' n0. */
    sizeDatum: Long = 1000L,
    /** See [[NearDupAdmission]]'s `adaptiveExec` / [[AdmissionRegistry
      * .withFixedPlans]]: micro-batch admission plans default to
      * non-adaptive execution (profiled per-trigger fixed cost). */
    adaptiveExec: Boolean = false) extends Serializable {

  require(planes >= 1 && planes <= maxPlanes && maxPlanes <= 62,
    s"need 1 <= planes($planes) <= maxPlanes($maxPlanes) <= 62")

  /** The one max-wide hyperplane family every width prefixes. */
  private val hyperMax = Vectors.hyperplanes(seed, tables, maxPlanes, dim)
  private def prefix(w: Int) = hyperMax.map(_.take(w))

  private def width(nAdmitted: Long): Int =
    Dedup.sizedPlanes(nAdmitted, base = planes, n0 = sizeDatum,
      max = maxPlanes)

  /** Row-wise bucket under width `w` for a row's OWN table (`tCol`) —
    * the fold-time re-bucket expression (tables is config-small, so a
    * CASE over t stays codegen-friendly). */
  private def bucketByTable(spark: org.apache.spark.sql.SparkSession,
      vec: Column, tCol: Column, w: Int): Column = {
    val hp = prefix(w)
    (0 until tables).foldRight(lit(null).cast("long"): Column) {
      case (t, alt) => when(tCol === t,
        Vectors.signBucketNative(spark, vec, hp, t)).otherwise(alt)
    }
  }

  /** [[AdmissionRegistry]] fold hook: while a fold is rewriting runs
    * anyway, re-bucket every row under the width sized to the folded
    * row count — the zero-extra-write moment the self-sizing rides. */
  private def rebucket(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // DISTINCT ids, not raw rows/tables: a crashed fold can leave
    // duplicate physical rows (swap-then-delete ordering), and a count
    // inflated by them would derive a too-wide width (review r13).
    val w = width(df.select(col("id")).distinct().count())
    df.withColumn("bucket",
        bucketByTable(spark, col("embedding"), col("t"), w))
      .withColumn("planes", lit(w))
  }

  private val registry = new AdmissionRegistry(stateDir, StructType(Seq(
    StructField("planes", IntegerType),
    StructField("t", IntegerType), StructField("bucket", LongType),
    StructField("id", LongType),
    StructField("embedding", ArrayType(FloatType)))),
    shardCols = Seq("planes", "t", "bucket"), shards = shards,
    targetShardBytes = targetShardBytes,
    foldTransform = rebucket)

  /** (id, embedding) of the batch. */
  private def vecsOf(batch: DataFrame): DataFrame =
    batch.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("embedding"))

  /** The layout-pinning parameters: `maxPlanes` shifts every table's
    * hyperplane draws past table 0 (Array.fill draws sequentially), and
    * seed/tables/dim define the family outright — restarting a store
    * under ANY different value silently changes buckets and history
    * stops matching (the modulus-drift bug class; review r13). `planes`
    * and `sizeDatum` are pinned too (ADVICE r13): the probe's width
    * filter and the fail-safe ladder both start at this instance's
    * `planes`, so restarting an existing store with a LARGER base would
    * silently drop legitimate on-disk widths below it from the probe —
    * history at those widths would never match and near-dups of
    * already-admitted vectors re-admit until folds re-bucket; a drifted
    * `sizeDatum` likewise changes the size→width map and therefore
    * replay-recomputed decisions. Recorded once in `stateDir/_family`
    * and required equal ever after.
    *
    * LEGACY UPGRADE (ADVICE r14): stores created before `planes`/
    * `sizeDatum` joined the pin recorded only the 4-field prefix, and a
    * strict equality would fail every restart FOREVER — loud but
    * permanently unusable. A stored string that exactly matches the
    * old 4-field prefix of `want` is accepted and the `_family` file
    * rewritten with the current instance's planes/sizeDatum: they
    * define the store's existing layout by construction (this instance
    * is the one that has been operating it). */
  private def verifyFamilyParams(spark: org.apache.spark.sql.SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(stateDir, "_family")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val prefix = s"seed=$seed tables=$tables dim=$dim maxPlanes=$maxPlanes"
    val want = s"$prefix planes=$planes sizeDatum=$sizeDatum"
    def write(overwrite: Boolean): Unit = {
      val out = f.create(p, overwrite)
      try out.write(want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    if (f.exists(p)) {
      val in = f.open(p)
      val got = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      if (got == prefix) write(overwrite = true) // pre-r14 pin: upgrade
      else require(got == want,
        s"embedding admission family drift: store built with [$got], " +
          s"instance configured [$want] — refusing to admit against " +
          "history these buckets cannot match")
    } else write(overwrite = false)
  }

  /** Admit one micro-batch: returns the admitted rows (original schema)
    * and registers their (planes, bucket, vector) rows under `batchId`. */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    AdmissionRegistry.withFixedPlans(spark, adaptiveExec) {
    verifyFamilyParams(spark)
    registry.maybeCompact(spark, batchId, compactEvery)
    // ONE footer walk (no scan job, own batch excluded for replay
    // determinism) yields both size-dependent inputs: the registered
    // count -> this trigger's WRITE width, and the widths actually
    // PRESENT on disk -> the probe levels. History holds O(log runs)
    // distinct widths (one per run), so probing only those — instead of
    // the whole [planes, wNow] ladder — keeps the probe frame at the
    // 1-3 levels that can match, with the full ladder as the fail-safe
    // when footer statistics are unavailable.
    val (regRows, widthsSeen) =
      registry.footerStats(spark, batchId, Some("planes"))
    val wNow = width(regRows / tables)
    // Fail-safe ladder spans to maxPlanes, NOT wNow: widths are only
    // APPROXIMATELY monotone in registry size — crash-leftover duplicate
    // rows can inflate a count past a doubling boundary and leave a run
    // one width above what the deduplicated count later implies
    // (review r13) — so when footer stats are unavailable the probe
    // must cover everything a run could legally carry.
    val probeWidths = (widthsSeen
      .getOrElse((planes to maxPlanes).toSet)
      .filter(w => w >= planes && w <= maxPlanes) + wNow).toSeq.sorted
    val vecs = vecsOf(batch)
    // The probe frame carries the batch's buckets at each probed width;
    // cached for the trigger (probe tokens, history join, in-batch
    // join, registry append all consume it).
    val bf = probeWidths.map { w =>
      Dedup.embeddingBucketTableHyper(vecs, "embedding", "id", prefix(w))
        .withColumn("planes", lit(w))
    }.reduce(_ unionByName _)
      .join(vecs, Seq("id"))
      .persist()
    try {
      val cos = (a: Column, b: Column) => Vectors.cosineNative(spark, a, b)
      val tokens = registry.probeTokens(bf)
      val hist = registry.historyTouched(spark, batchId, tokens)
        .select(col("planes"), col("t"), col("bucket"),
          col("embedding").as("__he"))
      val vsHistory = bf.join(hist, Seq("planes", "t", "bucket"))
        .filter(cos(col("embedding"), col("__he")) >= threshold)
        .select(col("id")).distinct()
      // In-batch arm blocks at the CURRENT width (one width suffices
      // within a batch; both sides computed under the same prefix).
      val bfNow = bf.filter(col("planes") === wNow)
      val vsBatch = bfNow.select(col("t"), col("bucket"),
          col("id").as("__ka"), col("embedding").as("__ea"))
        .join(bfNow.select(col("t"), col("bucket"), col("id"),
          col("embedding")), Seq("t", "bucket"))
        .filter(col("__ka") < col("id") &&
          cos(col("__ea"), col("embedding")) >= threshold)
        .select(col("id")).distinct()
      // Eager persist (NOT localCheckpoint): stops the caller's
      // consumption of `admitted` from re-running the sketch/cosine DAG
      // after bf is unpersisted, while KEEPING lineage — checkpoint
      // block loss (executor decommission mid-trigger) would fail the
      // micro-batch outright, whereas a lost cache block just recomputes
      // (review r13). Blocks are reclaimed by the ContextCleaner once
      // the trigger's plans are unreachable.
      val rejected = vsHistory.union(vsBatch).distinct().persist()
      rejected.count()
      val admitted = batch.join(
        rejected.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      registry.append(
        bfNow.join(admitted.select(col(idCol).cast("long").as("id")),
            Seq("id"), "left_semi")
          .select("planes", "t", "bucket", "id", "embedding"), batchId)
      admitted
    } finally bf.unpersist()
    }
  }

  /** Register `batch`'s vectors WITHOUT admission gating — the
    * backfill/seeding path: at 100 TB a new stream bootstraps its
    * registry from the batch tier's already-deduplicated corpus (its
    * vectors are admitted by definition), not by replaying history
    * through [[admit]]'s probe joins. Buckets are computed at the
    * size-derived write width for the registry AS IT STANDS (excluding
    * this batch's own replayed append — same replay determinism as
    * admit); fold cycles converge mixed widths exactly as for live
    * appends. Also the population path of the width-crossover bench
    * ([[graft.tools.EmbeddingWidthBench]]), where gating 10⁶ disjoint
    * vectors through admit() would only measure the probe being
    * admitted-anyway. */
  def bootstrap(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    verifyFamilyParams(spark)
    registry.maybeCompact(spark, batchId, compactEvery)
    val wNow = width(registry.approxRows(spark, batchId) / tables)
    val vecs = vecsOf(batch)
    registry.append(
      Dedup.embeddingBucketTableHyper(vecs, "embedding", "id", prefix(wNow))
        .withColumn("planes", lit(wNow))
        .join(vecs, Seq("id"))
        .select("planes", "t", "bucket", "id", "embedding"), batchId)
  }

  /** Fold committed batch directories ≤ `uptoBatchId` into one
    * (re-bucketed to the size-derived width via the fold hook). */
  def compact(spark: org.apache.spark.sql.SparkSession,
      uptoBatchId: Long): Int = registry.compact(spark, uptoBatchId)

  /** `foreachBatch` adapter. */
  def step(forward: (DataFrame, Long) => Unit)(
      batch: DataFrame, batchId: Long): Unit =
    AdmissionRegistry.withFixedPlans(batch.sparkSession, adaptiveExec) {
      forward(admit(batch, batchId), batchId)
    }
}
