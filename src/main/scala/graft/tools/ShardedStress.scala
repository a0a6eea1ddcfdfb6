package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Regime measurement for the SHARD-PARTITIONED artifact layouts
  * ([[graft.ext.Sharded]], round-10 promotion of VERDICT r9 #1): which
  * access paths the directory layout actually accelerates, measured
  * against corpus growth. The honest selectivity claim (Sharded's
  * scaladoc) predicts three regimes, and each gets an arm:
  *
  *   PROBE (1 incoming doc — the serving path): touches `bands` /
  *     `chunks` / 1 of the bands×shards directories, so the pruned read
  *     is ~1/shards of the artifact at every corpus size — probe
  *     latency should stay FLAT in k while the flat-artifact probe
  *     (full signature/fingerprint/pairs scan) grows linearly;
  *   TRICKLE (32-doc micro-batch — the streaming admission cadence):
  *     touched directories ∝ batch keys, pruning degrades gracefully
  *     with batch size;
  *   BULK (quarter-corpus slice — IncrementalStress's regime): key sets
  *     saturate the shard set, the layout is neutral, and the lever is
  *     the join/bloom machinery both layouts share — expected ~parity
  *     with the flat incremental arm, REPORTED, not hidden.
  *
  * Every arm asserts result equality between flat and sharded paths
  * before reporting times (speed of a wrong answer is not reported).
  * Artifact builds are timed separately and charged to neither arm.
  * shards=64 (writeShardedBandIndex's default — the layout a real
  * deployment would pick; the registry queries use 16 at fixture scale).
  *
  * Usage: runMain graft.tools.ShardedStress [sfDir] [factors]
  */
object ShardedStress {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = (if (args.length > 1) args(1) else "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shards = 64

    val dirs = scala.collection.mutable.Map[String, String]()
    def persist(df: DataFrame, tag: String): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"shstress_$tag")
        .toString
      dirs(tag) = dir
      df.repartition(32).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    def timed(body: => Long, reps: Int = 3): (Double, Long) = {
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        spark.catalog.clearCache()
        graft.ops.Caches.releaseAll()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (samples.map(_._1).min, samples.head._2)
    }
    def xorSum(df: DataFrame): Long = {
      val h = xxhash64(df.columns.map(col): _*)
      val r = df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    def report(regime: String, family: String, k: Int, flat: (Double, Long),
        sharded: (Double, Long)): Unit = {
      val ok = flat._2 == sharded._2
      println(f"[shstress] regime=$regime%-7s family=$family%-9s k=${k}x " +
        f"flat=${flat._1}%6.2f s sharded=${sharded._1}%6.2f s " +
        f"check_flat=${flat._2} check_sharded=${sharded._2} " +
        (if (ok) "EXACT" else "CHECK-MISMATCH"))
      require(ok, s"$regime/$family at ${k}x: results differ")
    }
    /** Bytes/files selected at the artifact scans after pruning — the
      * metric that scales (class doc): flat reads the whole artifact,
      * sharded reads the touched directories. One execution per arm. */
    def footprint(regime: String, family: String, k: Int,
        flatPaths: Seq[String], shardedPaths: Seq[String],
        flatArm: => DataFrame, shardedArm: => DataFrame): Unit = {
      val (fb, ff) = graft.ext.Sharded.scanFootprint(spark, flatPaths)(flatArm)
      val (sb, sf) = graft.ext.Sharded.scanFootprint(spark,
        shardedPaths)(shardedArm)
      spark.catalog.clearCache(); graft.ops.Caches.releaseAll()
      println(f"[shstress] footprint regime=$regime%-7s family=$family%-9s " +
        f"k=${k}x flat_bytes=$fb (files=$ff) sharded_bytes=$sb " +
        f"(files=$sf) ratio=${sb.toDouble / math.max(fb, 1)}%.3f")
    }

    val docs0 = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val vowelMaps = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
      "aeiuo", "eioau", "oiaue", "uoiea")
    def mangleDocs(df: DataFrame, i: Int, idOffset: Long): DataFrame =
      df.select((col("doc_id") + lit(idOffset)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), "aeiou", vowelMaps(i))).as("text"))

    // Probe text: a corpus doc's text + a suffix (the incoming-near-dup
    // serving query, as q_dedup_probe_text_sharded uses).
    val probeText = docs0.filter(col("doc_id") === 8L)
      .select("text").head().getString(0) + " incoming suffix tokens"
    // Trickle: 32 docs; bulk: quarter corpus — both id-disjoint, mangled.
    val trickleDocs = persist(mangleDocs(
      docs0.filter(col("doc_id") % 128 === 0), 8, 900000000L), "trickle")
    val bulkDocs = persist(mangleDocs(
      docs0.filter(col("doc_id") % 4 === 0), 8, 900000000L), "bulk")
    val trickleSigs = persist(Dedup.minhashSignaturesPortable(
      trickleDocs, "text", "doc_id", numHashes = 32), "trickle_sigs")
    val bulkSigs = persist(Dedup.minhashSignaturesPortable(
      bulkDocs, "text", "doc_id", numHashes = 32), "bulk_sigs")
    val trickleFps = persist(Dedup.simhashFingerprintsPortable(
      trickleDocs, "text", "doc_id"), "trickle_fps")
    val bulkFps = persist(Dedup.simhashFingerprintsPortable(
      bulkDocs, "text", "doc_id"), "bulk_fps")
    val trickleGrams = persist(Dedup.ngramGramTable(
      trickleDocs, "text", "doc_id", n = 3), "trickle_grams")
    val bulkGrams = persist(Dedup.ngramGramTable(
      bulkDocs, "text", "doc_id", n = 3), "bulk_grams")
    println(s"[shstress] base=${docs0.count()} docs " +
      s"trickle=${trickleDocs.count()} bulk=${bulkDocs.count()} " +
      s"shards=$shards")
    val cap = 1 << 30

    factors.foreach { k =>
      val oldDocs = persist(
        (0 until k).map(i => mangleDocs(docs0, i, i * 10000000L))
          .reduce(_ unionByName _), s"old_docs_$k")

      val tArt0 = System.nanoTime()
      val oldSigs = persist(Dedup.minhashSignaturesPortable(
        oldDocs, "text", "doc_id", numHashes = 32), s"old_sigs_$k")
      val oldFps = persist(Dedup.simhashFingerprintsPortable(
        oldDocs, "text", "doc_id"), s"old_fps_$k")
      val oldGrams = persist(Dedup.ngramGramTable(
        oldDocs, "text", "doc_id", n = 3), s"old_grams_$k")
      val oldPairs = persist(Dedup.minhashDupPairsPortableFromSignatures(
        oldSigs, 32, 8, 0.5, cap), s"old_pairs_$k")
      val oldCensus = persist(Dedup.ngramGramCensus(oldGrams),
        s"old_census_$k")
      def tmp(tag: String) = java.nio.file.Files
        .createTempDirectory(s"shstress_${tag}_$k").toString
      val bandDir = tmp("bandidx")
      Dedup.writeShardedBandIndex(oldSigs, bandDir, numHashes = 32,
        bands = 8, shards = shards)
      val chunkDir = tmp("chunkidx")
      Dedup.writeShardedChunkIndex(oldFps, chunkDir, bits = 60,
        maxHamming = 3, shards = shards)
      val adjDir = tmp("adj")
      Dedup.writeShardedAdjacency(oldPairs, adjDir, "est_jaccard",
        shards = shards)
      val gramDir = tmp("gramidx")
      Dedup.writeShardedGramIndex(oldGrams, gramDir, shards = shards)
      val censusDir = tmp("census")
      Dedup.writeShardedGramCensus(oldCensus, censusDir, shards = shards)
      println(f"[shstress] ===== factor ${k}x: docs=${oldDocs.count()} " +
        f"build=${(System.nanoTime() - tArt0) / 1e9}%6.2f s " +
        "(flat + sharded artifacts, charged to neither arm) =====")

      // ---------------------------------------------------------- probes
      report("probe", "minhash", k,
        timed(xorSum(Dedup.minhashProbeTextPortable(oldSigs,
          probeText, numHashes = 32, bands = 8, threshold = 0.25))),
        timed(xorSum(Dedup.probeShardedBandIndexText(spark,
          bandDir, probeText, numHashes = 32, bands = 8,
          threshold = 0.25, shards = shards))))
      // SimHash point probe: the dedicated serving primitives (flat
      // pigeonhole filter vs the one-scan sharded chunk probe).
      val qfp = trickleFps.orderBy("id").limit(1)
        .select("id", "fp").head()
      val (qfpId, qfpVal) = (qfp.getLong(0), qfp.getLong(1))
      def simhashProbeFlat() = xorSum(
        Dedup.probeFingerprintTable(oldFps, qfpVal, bits = 60,
          maxHamming = 3, excludeId = Some(qfpId)))
      report("probe", "simhash", k,
        timed(simhashProbeFlat()),
        timed(xorSum(Dedup.probeShardedChunkIndex(spark, chunkDir,
          qfpVal, bits = 60, maxHamming = 3, shards = shards,
          excludeId = Some(qfpId)))))
      val qid = oldPairs.agg(min("id_a")).head().getLong(0)
      report("probe", "adjacency", k,
        timed(xorSum(oldPairs
          .filter(col("id_a") === qid || col("id_b") === qid)
          .select(when(col("id_a") === qid, col("id_b"))
            .otherwise(col("id_a")).as("other"),
            col("est_jaccard").as("score")))),
        timed(xorSum(Dedup.probeAdjacency(spark, adjDir, qid,
          shards = shards))))

      // --------------------------------------------- trickle + bulk appends
      def minhashFlat(sl: DataFrame) = timed(
        Dedup.minhashPairsIncrementalPortable(oldPairs.limit(0), oldSigs,
          sl, 32, 8, 0.5, cap).count())
      def minhashSh(sl: DataFrame) = timed(
        Dedup.minhashDeltaSharded(spark, bandDir, sl, 32, 8, 0.5, cap,
          shards).count())
      def simhashFlat(sl: DataFrame) = timed(
        Dedup.simhashPairsIncrementalPortable(
          oldPairs.limit(0).select(col("id_a"), col("id_b"),
            lit(0).cast("int").as("hamming")),
          oldFps, sl, maxHamming = 3).count())
      def simhashSh(sl: DataFrame) = timed(
        Dedup.simhashDeltaSharded(spark, chunkDir, sl, bits = 60,
          maxHamming = 3, shards = shards).count())
      def ngramFlat(sl: DataFrame) = timed(
        Dedup.ngramPairsIncrementalWithCensus(
          oldPairs.limit(0).select(col("id_a"), col("id_b"),
            lit(0.0).as("jaccard")),
          oldGrams, sl, oldCensus, threshold = 0.1, maxDf = cap).count())
      def ngramSh(sl: DataFrame) = timed(
        Dedup.ngramDeltaSharded(spark, gramDir, censusDir, sl,
          threshold = 0.1, maxDf = cap, shards = shards).count())

      report("trickle", "minhash", k, minhashFlat(trickleSigs),
        minhashSh(trickleSigs))
      report("trickle", "simhash", k, simhashFlat(trickleFps),
        simhashSh(trickleFps))
      report("trickle", "ngram", k, ngramFlat(trickleGrams),
        ngramSh(trickleGrams))
      report("bulk", "minhash", k, minhashFlat(bulkSigs),
        minhashSh(bulkSigs))
      report("bulk", "simhash", k, simhashFlat(bulkFps),
        simhashSh(bulkFps))
      report("bulk", "ngram", k, ngramFlat(bulkGrams), ngramSh(bulkGrams))

      // ------------------------- bytes-touched footprints (one run each)
      val sigsDir = dirs(s"old_sigs_$k"); val fpsDir = dirs(s"old_fps_$k")
      val pairsDir = dirs(s"old_pairs_$k")
      val gramPaths = Seq(dirs(s"old_grams_$k"), dirs(s"old_census_$k"))
      footprint("probe", "minhash", k, Seq(sigsDir), Seq(bandDir),
        Dedup.minhashProbeTextPortable(oldSigs, probeText,
          numHashes = 32, bands = 8, threshold = 0.25),
        Dedup.probeShardedBandIndexText(spark, bandDir, probeText,
          numHashes = 32, bands = 8, threshold = 0.25, shards = shards))
      footprint("probe", "adjacency", k, Seq(pairsDir), Seq(adjDir),
        oldPairs.filter(col("id_a") === qid || col("id_b") === qid)
          .select(when(col("id_a") === qid, col("id_b"))
            .otherwise(col("id_a")).as("other"),
            col("est_jaccard").as("score")),
        Dedup.probeAdjacency(spark, adjDir, qid, shards = shards))
      footprint("trickle", "minhash", k, Seq(sigsDir), Seq(bandDir),
        Dedup.minhashPairsIncrementalPortable(oldPairs.limit(0), oldSigs,
          trickleSigs, 32, 8, 0.5, cap),
        Dedup.minhashDeltaSharded(spark, bandDir, trickleSigs, 32, 8,
          0.5, cap, shards))
      footprint("trickle", "simhash", k, Seq(fpsDir), Seq(chunkDir),
        Dedup.simhashPairsIncrementalPortable(
          oldPairs.limit(0).select(col("id_a"), col("id_b"),
            lit(0).cast("int").as("hamming")),
          oldFps, trickleFps, maxHamming = 3),
        Dedup.simhashDeltaSharded(spark, chunkDir, trickleFps, bits = 60,
          maxHamming = 3, shards = shards))
      footprint("trickle", "ngram", k, gramPaths,
        Seq(gramDir, censusDir),
        Dedup.ngramPairsIncrementalWithCensus(
          oldPairs.limit(0).select(col("id_a"), col("id_b"),
            lit(0.0).as("jaccard")),
          oldGrams, trickleGrams, oldCensus, threshold = 0.1,
          maxDf = cap),
        Dedup.ngramDeltaSharded(spark, gramDir, censusDir, trickleGrams,
          threshold = 0.1, maxDf = cap, shards = shards))
      footprint("bulk", "minhash", k, Seq(sigsDir), Seq(bandDir),
        Dedup.minhashPairsIncrementalPortable(oldPairs.limit(0), oldSigs,
          bulkSigs, 32, 8, 0.5, cap),
        Dedup.minhashDeltaSharded(spark, bandDir, bulkSigs, 32, 8, 0.5,
          cap, shards))
    }
    spark.stop()
  }
}
