package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Benchmark/eval-set decontamination: flag training documents that share
  * word n-grams with a held-out evaluation corpus (the standard n-gram
  * overlap check run before any LLM training job).
  *
  * Plan shape: explode the (small) eval set's distinct n-grams, BROADCAST
  * them, and count hits per training doc in one scan-side hash join — the
  * 100 TB corpus is never shuffled; cost is one pass over the corpus ×
  * O(1) probe per gram. Eval sets are KBs–MBs by nature; if one ever
  * outgrows broadcast, drop the hint and the same plan shuffle-joins on
  * the gram key. */
object Decontam {

  /** (id, n_hits) for every training doc: n_hits = number of DISTINCT
    * `n`-grams shared with `evalDocs`; 0 when clean. Filter `n_hits > 0`
    * to quarantine, or join back to drop. */
  def contaminationHits(docs: DataFrame, textCol: String, idCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("id"),
        explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
    val evalGrams = evalDocs
      .select(explode(Dedup.wordNgrams(col(evalTextCol), n)).as("g"))
      .distinct()
    val hits = docGrams
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Per-document contamination REPORT: distinct-gram count, hit count,
    * and overlap fraction — the form a decontamination policy consumes
    * (binary gates over-quarantine: one boilerplate gram shared with an
    * eval doc is noise at fraction 0.01, a leak at 0.8). Same broadcast
    * plan shape as [[contaminationHits]]; the corpus is never shuffled. */
  def contaminationReport(docs: DataFrame, textCol: String, idCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("id"),
        Dedup.wordNgrams(col(textCol), n).as("grams"))
      .select(col("id"), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("g"))
    val evalGrams = evalDocs
      .select(explode(Dedup.wordNgrams(col(evalTextCol), n)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1L))
    docGrams
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy("id")
      .agg(max(col("n_grams")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("overlap",
        when(col("n_grams") > 0,
          col("n_hits").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** [[contaminationHits]] with an explicit bloom-filter pre-filter on the
    * corpus side — same exact answer (the bloom only ADMITS candidates;
    * the broadcast-join verify kills its false positives), different cost
    * shape: corpus grams are probed against a ~KB–MB bitset AT SCAN SPEED
    * (codegen'd `might_contain`), so only matching grams + fpp noise ever
    * reach the join. With a clean corpus (the common case — contamination
    * is rare) that's ~0 rows into the join instead of every gram of 100 TB.
    *
    * The bloom is built in one aggregation over the (small) eval side and
    * enters the plan as a binary LITERAL — the same shape Catalyst's
    * InjectRuntimeFilter produces, but available when the filter set is a
    * fixed artifact rather than a join side. `estimatedItems`/`numBits`
    * size the filter (defaults: 1M items / 8M bits ≈ 3% fpp — fpp only
    * costs verify-join volume, never correctness). */
  def contaminationHitsBloom(spark: SparkSession, docs: DataFrame,
      textCol: String, idCol: String, evalDocs: DataFrame,
      evalTextCol: String, n: Int, estimatedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    GraftFunctions.register(spark)
    val evalGrams = evalDocs
      .select(explode(Dedup.wordNgrams(col(evalTextCol), n)).as("g"))
      .distinct()
    val bloom = evalGrams
      .agg(call_function(GraftFunctions.BloomAggName, xxhash64(col("g")),
        lit(estimatedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bloom == null) { // empty eval set → nothing can be contaminated
      return docs.select(col(idCol).as("id"), lit(0L).as("n_hits"))
    }
    val docGrams = docs
      .select(col(idCol).as("id"),
        explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .filter(call_function(GraftFunctions.BloomProbeName, lit(bloom),
        xxhash64(col("g"))))
    val hits = docGrams
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}
