package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy matching via DELETION-NEIGHBORHOOD blocking
  * (the SymSpell dictionary trick, Garbe 2012): two tokens are within
  * Levenshtein distance 1 iff they share a key in
  * `{token} ∪ {token with one char deleted}` —
  *
  *   - substitution at position i: deleting position i from BOTH sides
  *     yields the same string;
  *   - insertion/deletion: the shorter token IS a deletion of the longer
  *     (shorter's identity key == one of longer's deletion keys).
  *
  * So an EQUI-join on deletion keys finds every candidate pair; a final
  * `levenshtein ≤ 1` check removes the false positives (two DIFFERENT
  * deletions can collide, e.g. "ab"/"ba" share key "a" at distance 2).
  * This turns the quadratic "compare every rare token to every vocab
  * word" spelling-normalization step into one bounded equi-join — the
  * same blocking-then-verify shape as the MinHash/SimHash families, but
  * with an EXACT (zero-recall-loss) blocking key.
  *
  * Scale: keys per token = length+1, so the exploded key table is
  * Σ(len+1) ≈ |vocab|·(avg_len+1) rows of short strings — vocab-bounded
  * (≤ a few million rows at 100 TB corpus vocab), never corpus-bounded.
  * Deletion keys of very short tokens are hot (every 2-char token emits
  * two 1-char keys shared across the alphabet), so candidates are
  * restricted to tokens of length ≥ `minLen` and buckets are capped at
  * `maxBucket` entries (combined across both sides), mirroring the
  * [[Dedup]] hot-key discipline.
  */
object Fuzzy {

  /** All length-1-deletion variants of `tok` (array of length(tok)
    * strings). HOF transform — CodegenFallback, but this runs on
    * vocab-bounded frames, never the corpus scan. */
  def deletions(tok: Column): Column =
    transform(sequence(lit(1), length(tok)),
      i => concat(tok.substr(lit(1), i - 1), tok.substr(i + 1, length(tok))))

  /** The full edit-distance-1 blocking key set: the token itself plus its
    * deletions. */
  def deletionKeys(tok: Column): Column =
    array_union(array(tok), deletions(tok))

  // NB: no alias on the token column here — `explode(f(col(tok).as(x)))`
  // in the same select resolves the lambda through a
  // LateralColumnAliasReference, which Generate cannot host (Spark
  // INTERNAL_ERROR); callers name their token columns beforehand.
  private def keyed(df: DataFrame, tokCol: String): DataFrame =
    df.select(col(tokCol), explode(deletionKeys(col(tokCol))).as("__key"))

  /** Candidate-then-verify edit-distance-1 pairs between `left.leftTok`
    * and `right.rightTok` (both assumed lowercase word tokens, e.g. from
    * [[TextStats.vocabulary]]). Output: one row per (leftTok, rightTok)
    * pair with distance exactly 1 (identical tokens are not pairs).
    *
    *   - tokens shorter than `minLen` are excluded on BOTH sides (their
    *     deletion keys are alphabet-hot and a 1-edit on a 2-char token is
    *     half the word — not a typo signal);
    *   - deletion-key buckets with more than `maxBucket` combined entries
    *     are dropped before the join ([[Dedup.scaledCap]] sizes the cap
    *     from corpus stats at scale).
    */
  def editOnePairs(left: DataFrame, leftTok: String,
      right: DataFrame, rightTok: String,
      minLen: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(leftTok != rightTok,
      "left and right token columns must have distinct names")
    val lk = keyed(left.filter(length(col(leftTok)) >= minLen), leftTok)
    val rk = keyed(right.filter(length(col(rightTok)) >= minLen), rightTok)
    // Bucket census over BOTH sides (the join cost a hot key drives is
    // |left bucket| × |right bucket|; the combined count bounds both).
    val counts = lk.select(col("__key"))
      .unionByName(rk.select(col("__key")))
      .groupBy("__key").agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= maxBucket)
      .select("__key")
    val lb = lk.join(counts, Seq("__key"))
    val rb = rk.join(counts, Seq("__key"))
    lb.join(rb, Seq("__key"))
      .select(leftTok, rightTok).distinct()
      // Bounded-distance verify: levenshtein with a threshold bails out
      // after the banded O(len·k) pass (returns -1 above the bound)
      // instead of filling the full O(len²) matrix per candidate.
      .filter(col(leftTok) =!= col(rightTok) &&
        levenshtein(col(leftTok), col(rightTok), 1) === 1)
  }

  /** Spelling-normalization map: for each left token, the single best
    * right-side match — highest `weightCol` (e.g. corpus tf), token
    * ascending as the deterministic tie-break. The per-left-token window
    * is key-bounded (a token has ≤ ~26·(len+1) distance-1 neighbors), so
    * the window never sees more than a few hundred rows per key. */
  def bestCorrection(pairs: DataFrame, leftTok: String, rightTok: String,
      weightCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(leftTok)
      .orderBy(col(weightCol).desc, col(rightTok).asc)
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
