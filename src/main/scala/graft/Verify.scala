package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names — local targeted
    // re-dump while iterating (the driver always runs the full set).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several operators persist() intermediates; don't let 25 queries'
      // worth accumulate in one JVM
      spark.catalog.clearCache()
      graft.ops.Caches.releaseAll() // checkpoint storage (outside cache mgr)
    }
    // -------- structural invariants for the engine-local-hash twins ----
    // q_dedup_minhash_pairs / q_dedup_minhash / q_dedup_simhash_pairs run
    // xxhash64 hash families DuckDB cannot reproduce, so they carry no
    // oracle SQL; their refactored cores ARE hash-checked end-to-end via
    // the md5 *_portable twins. These invariants pin what that leaves
    // unchecked: pair-set structure (canonical id_a<id_b, no duplicates,
    // bounded scores, ids ⊆ corpus), the dedup view's exact derivation
    // from its pairs artifact, and count agreement with the portable
    // twins. Written to structural_checks.json next to the parquet.
    if (only.isEmpty) try {
      import org.apache.spark.sql.functions.col
      def read(name: String) = spark.read.parquet(s"$outDir/$name")
      val docs = Tables(spark, sfDir, "documents").select("doc_id")
      val checks = scala.collection.mutable.LinkedHashMap[String, Boolean]()
      val mh = read("q_dedup_minhash_pairs")
      checks("minhash_pairs.canonical_id_a_lt_id_b") =
        mh.filter(col("id_a") >= col("id_b")).count() == 0
      checks("minhash_pairs.no_duplicate_pairs") =
        mh.count() == mh.select("id_a", "id_b").distinct().count()
      checks("minhash_pairs.est_jaccard_in_threshold_1") =
        mh.filter(col("est_jaccard") < 0.5 || col("est_jaccard") > 1.0)
          .count() == 0
      checks("minhash_pairs.ids_subset_of_corpus") =
        mh.select(col("id_a").as("doc_id"))
          .union(mh.select(col("id_b").as("doc_id")))
          .join(docs, Seq("doc_id"), "left_anti").count() == 0
      val kept = read("q_dedup_minhash").select("doc_id")
      val expected = docs.join(mh.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      checks("minhash_dedup.equals_docs_minus_pair_dropped") =
        kept.exceptAll(expected).count() == 0 &&
          expected.exceptAll(kept).count() == 0
      // Numeric drift telemetry beside the boolean bounds: the exact
      // twin/portable pair-count ratios, so cross-round trend (not just
      // the 2× flag) is visible in the committed artifact.
      val metrics = scala.collection.mutable.LinkedHashMap[String, Double]()
      val mhPortable = read("q_dedup_minhash_portable").count().toDouble
      checks("minhash_pairs.count_within_2x_of_portable_twin") =
        mh.count() >= mhPortable / 2 && mh.count() <= mhPortable * 2
      metrics("minhash_pairs.twin_count") = mh.count().toDouble
      metrics("minhash_pairs.portable_count") = mhPortable
      metrics("minhash_pairs.twin_over_portable_ratio") =
        if (mhPortable > 0) mh.count() / mhPortable else -1.0
      val sh = read("q_dedup_simhash_pairs")
      checks("simhash_pairs.canonical_id_a_lt_id_b") =
        sh.filter(col("id_a") >= col("id_b")).count() == 0
      checks("simhash_pairs.no_duplicate_pairs") =
        sh.count() == sh.select("id_a", "id_b").distinct().count()
      checks("simhash_pairs.hamming_in_0_max") =
        sh.filter(col("hamming") < 0 || col("hamming") > 3).count() == 0
      checks("simhash_pairs.ids_subset_of_corpus") =
        sh.select(col("id_a").as("doc_id"))
          .union(sh.select(col("id_b").as("doc_id")))
          .join(docs, Seq("doc_id"), "left_anti").count() == 0
      val shPortable = read("q_dedup_simhash_portable").count().toDouble
      checks("simhash_pairs.count_within_2x_of_portable_twin") =
        sh.count() >= shPortable / 2 && sh.count() <= shPortable * 2
      metrics("simhash_pairs.twin_count") = sh.count().toDouble
      metrics("simhash_pairs.portable_count") = shPortable
      metrics("simhash_pairs.twin_over_portable_ratio") =
        if (shPortable > 0) sh.count() / shPortable else -1.0
      // q_distinct_sketch / q_freq_sketch now carry their sketch
      // contracts as BIGINT flag columns that the DuckDB oracle
      // hash-checks (all-1 expected), so the driver's CORRECTNESS gate
      // validates them directly; the flag re-reads here just keep the
      // structural report self-contained.
      val ds = read("q_distinct_sketch")
      checks("distinct_sketch.estimate_within_5pct_of_exact") =
        ds.filter(col("within_tol") =!= 1L).count() == 0
      checks("distinct_sketch.merge_equals_whole") =
        ds.filter(col("merge_consistent") =!= 1L).count() == 0
      val fs = read("q_freq_sketch")
      checks("freq_sketch.never_underestimates") =
        fs.filter(col("never_under") =!= 1L).count() == 0
      checks("freq_sketch.overestimate_within_eps_n") =
        fs.filter(col("within_eps") =!= 1L).count() == 0
      checks("freq_sketch.merge_equals_whole") =
        fs.filter(col("merge_consistent") =!= 1L).count() == 0
      val sj = (checks.map { case (k, v) => s""""$k": $v""" } ++
        metrics.map { case (k, v) => s""""$k": ${f"$v%.4f"}""" })
        .mkString("{", ", ", "}")
      Files.writeString(Paths.get(s"$outDir/structural_checks.json"), sj)
      val failed = checks.collect { case (k, false) => k }
      if (failed.nonEmpty)
        System.err.println(
          s"[verify] STRUCTURAL CHECK FAILED: ${failed.mkString(", ")}")
      else println(s"[verify] structural checks: ${checks.size}/${checks.size} ok")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] structural checks errored: ${e.getMessage}")
    } // targeted runs (`only`) skip structural checks, not the SQL dump

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
