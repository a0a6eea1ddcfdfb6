package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
