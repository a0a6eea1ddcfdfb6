package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge INDUCTION (Sennrich et al., ACL 2016) — the
  * tokenizer-training primitive of an LLM data pipeline, run on the
  * engine instead of a single-node script.
  *
  * Scale shape: BPE never iterates over the corpus. The corpus collapses
  * ONCE to a word-frequency census (map-side-combined groupBy — shuffle
  * bounded by |vocab|, not tokens); every merge round then runs on that
  * vocab-bounded frame: adjacent-symbol pair counts weighted by word
  * frequency, a 1-row argmax pulled to the driver (same bounded-state
  * justification as the k-means centroid pull), and a two-pass literal
  * `replace` re-segmenting the census. 100 TB corpus, |vocab|-sized
  * working set.
  *
  * Merge semantics (pinned for cross-engine determinism, and asserted by
  * the DuckDB oracle which replays every round as CTE blocks):
  *   - segmentation state is a space-joined symbol string with sentinel
  *     spaces (" h e l l o "), so a literal leftmost-non-overlapping
  *     `replace(s, " a b ", " ab ")` IS the BPE merge step. TWO passes
  *     per round: consecutive occurrences share a sentinel space, so a
  *     single pass skips every other one; the skipped occurrence is then
  *     isolated and a second pass catches it. The PINNED semantics is
  *     exactly this two-pass leftmost-non-overlapping replace — both
  *     engines implement it literally, so the harness stays
  *     hash-consistent. Note it deviates from strict greedy
  *     left-to-right BPE on odd self-pair runs ≥ 5: " a a a a a " →
  *     pass 1 merges both ends → [aa, a, aa], where strict greedy gives
  *     [aa, aa, a] (same symbol multiset, different placement). Real
  *     alphabetic text makes such runs vanishingly rare; a
  *     replace-to-fixpoint in BOTH engines would restore strict
  *     fidelity at the cost of an unbounded per-round loop;
  *   - argmax tie-break: highest weighted count, then lexicographic
  *     (lhs, rhs) — deterministic on the [a-z0-9]+ symbol alphabet.
  */
object Bpe {

  /** Word-frequency census: (w, f) over [[Dedup.tokens]]. */
  def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Initial character segmentation with sentinel spaces. */
  private def charSeg(w: Column): Column =
    concat(lit(" "), concat_ws(" ",
      transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))),
      lit(" "))

  /** Weighted adjacent-pair counts of a segmented census: (lhs, rhs, cnt). */
  private def pairCounts(seg: DataFrame): DataFrame = {
    val sym = split(trim(col("s")), " ")
    seg.select(col("f"), explode(when(size(sym) >= 2,
        transform(sequence(lit(1), size(sym) - 1),
          i => struct(element_at(sym, i).as("a"),
            element_at(sym, (i + 1).cast("int")).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .groupBy(col("p.a").as("lhs"), col("p.b").as("rhs"))
      .agg(sum(col("f")).as("cnt"))
  }

  /** Induce `rounds` merge rules from the corpus: one row per round,
    * (rank, lhs, rhs, cnt) — the merge applied that round and the
    * weighted pair count that won it. Stops early if no pair remains. */
  def induceMerges(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var seg = wordCensus(docs, textCol)
      .select(charSeg(col("w")).as("s"), col("f"))
      .localCheckpoint() // census is vocab-bounded; pin it once
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // 1-row argmax: bounded driver state, like the centroid pull
      val best = pairCounts(seg)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best.head
        val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r.toLong, a, b, c))
        val old = seg
        seg = seg.select(
            expr(s"replace(replace(s, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')")
              .as("s"), col("f"))
          .localCheckpoint()
        old.unpersist()
        r += 1
      }
    }
    seg.unpersist()
    merges.toSeq.toDF("rank", "lhs", "rhs", "cnt")
  }

  /** Apply an induced merge table to segment words: (w, f, sym) with
    * `sym` the final symbol array — the vocabulary a tokenizer ships.
    * Merges MUST be applied in rank order (BPE's defining invariant). */
  def segment(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val seg0 = wordCensus(docs, textCol)
      .select(col("w"), col("f"), charSeg(col("w")).as("s"))
    val merged = merges.foldLeft(seg0) { case (d, (a, b)) =>
      d.withColumn("s",
        expr(s"replace(replace(s, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')"))
    }
    merged.select(col("w"), col("f"), split(trim(col("s")), " ").as("sym"))
  }
}
