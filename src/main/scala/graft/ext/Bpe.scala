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

  /** Induce `rounds` merge rules from the corpus: one row per merge,
    * (rank, lhs, rhs, cnt) — in the order sequential BPE applies them
    * and with the weighted pair count that won each. Stops early if no
    * pair remains.
    *
    * BATCHED rounds, decision-identical results (VERDICT r18 #2: one
    * argmax job + one re-segment checkpoint PER MERGE meant a ~32k-
    * merge tokenizer cost ~64k sequential Spark jobs — days of
    * job-launch latency at any cluster size). Each Spark round now
    * collects a prefix of the sorted pair-count list and accepts the
    * merges that sequential induction PROVABLY picks next, in order:
    *
    *   - walk pairs by (cnt desc, lhs, rhs); accept while the pair
    *     shares no symbol with any accepted merge's {lhs, rhs,
    *     lhs+rhs}; STOP at the first interacting pair (its count is
    *     `cStop`) — a skipped-but-interacting pair's count after the
    *     earlier merges is unknowable without recounting, so nothing
    *     past it may be batched;
    *   - keep only accepted pairs with cnt > 4·cStop. Merges can grow
    *     another pair q = (s, t) only through occurrences where the s-
    *     or t-instance was CREATED by an accepted merge, and each
    *     origin class has its own snapshot donor: s new ⇒ donor
    *     (b, t); t new ⇒ donor (s, c); both new ⇒ donor (b, c) — for
    *     s = ab, t = cd. Every donor contains a merge INPUT symbol and
    *     every q that can gain contains a merge OUTPUT, so all of them
    *     interact and rank at or below the stopping pair; q's count at
    *     any turn is therefore ≤ snap(q) + three donors ≤ 4·cStop.
    *     Strict `>` also clears TIES, whose (lhs, rhs) order against
    *     an accepted pair is unknowable from the snapshot.
    *
    * Within the accepted prefix the pairs are mutually non-adjacent,
    * so their counts are exactly the snapshot's and sequential BPE
    * picks them in snapshot order — the recorded (rank, cnt) rows are
    * byte-identical to one-merge-per-round induction (spec-locked by
    * BpeSpec's 256-merge batched≡sequential arm). Re-segmentation
    * applies the whole batch in ONE projection + checkpoint, so the
    * job count per Spark round is 2 regardless of batch size; batch
    * width is data-dependent (wide on sharp count decays, 1 on tie
    * plateaus — the measured widths are in SURVEY §"BPE"), and the
    * data-side cost stays |vocab|-bounded per round exactly as
    * before.
    *
    * The provable prefix is narrow on natural text (the top pairs of a
    * small alphabet almost always share a letter, so the stop fires at
    * width 1-2); `strict = false` relaxes to the STANDARD parallel-BPE
    * batch — skip interacting pairs and keep accepting disjoint ones
    * down the sorted list. Relaxed rounds still record snapshot-exact
    * counts for every accepted pair (disjoint pairs' counts are
    * invariant under each other's merges) and apply the same pinned
    * two-pass replace per merge in count order; the deviation from
    * strict-sequential induction is CHOICE ORDER near count plateaus —
    * a pair created by an earlier accepted merge can deserve a turn
    * before a later accepted one, which a snapshot cannot see. That is
    * the industry-standard trade for inducing real vocabularies
    * (measured: 256 merges in 14 Spark rounds instead of 256 —
    * BpeSpec), and the registry/oracle queries stay on the strict
    * default.
    *
    * `maxBatch` caps accepted merges per round (bounds the nested
    * replace expression fed to codegen); `roundProbe` receives each
    * round's accepted count (the job-growth spec hook). */
  def induceMerges(docs: DataFrame, textCol: String, rounds: Int,
      maxBatch: Int = 32, strict: Boolean = true,
      roundProbe: Int => Unit = _ => ()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var seg = wordCensus(docs, textCol)
      .select(charSeg(col("w")).as("s"), col("f"))
      .localCheckpoint() // census is vocab-bounded; pin it once
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (merges.size < rounds && !done) {
      val want = math.min(maxBatch, rounds - merges.size)
      // fetch a bounded slice of the sorted pair list: enough to find
      // the stopping pair (strict) or to fill the batch past skipped
      // interacting pairs (relaxed — interactions dominate a small
      // alphabet's top counts, so the walk needs a deeper horizon);
      // either way driver-bounded
      val fetch = if (strict) want * 4 + 16 else want * 32 + 64
      val top = pairCounts(seg)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(fetch).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val accepted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        // cStop: count of the first pair whose post-merge count the
        // snapshot cannot pin — -1 when the WHOLE pair list was
        // fetched and nothing interacts (then nothing can move: every
        // created-pair donor is itself an interacting pair)
        var cStop = -1L
        var i = 0
        var stopped = false
        while (i < top.length && !stopped && accepted.size < want) {
          val (a, b, c) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (used(a) || used(b) || used(a + b)) {
            if (strict) { cStop = c; stopped = true }
            // relaxed: skip it and keep walking for disjoint pairs
          } else {
            accepted += ((a, b, c))
            used += a; used += b; used += (a + b)
          }
          i += 1
        }
        if (!stopped) {
          if (top.length == fetch)
            cStop = top.last.getLong(2) // unseen tail tops out here
          else if (i < top.length)
            cStop = top(i).getLong(2) // want-cut: rest of the list moves
          // else: the COMPLETE pair list was consumed interaction-free —
          // no donors exist anywhere, cStop stays -1 (nothing can move)
        }
        val batch =
          if (strict) accepted.takeWhile(_._3 > 4 * cStop) else accepted
        if (batch.isEmpty) {
          // adversarial tie plateau: fall back to one provably-correct
          // merge (the argmax is ALWAYS safe) so progress never stalls
          val (a, b, c) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          batch += ((a, b, c))
        }
        batch.foreach { case (a, b, c) =>
          merges += ((merges.size + 1L, a, b, c))
        }
        roundProbe(batch.size)
        val old = seg
        val applied = batch.foldLeft(col("s")) { case (e, (a, b, _)) =>
          // the pinned two-pass leftmost-non-overlapping replace, per
          // merge, in batch order (see the merge-semantics doc above)
          val one = org.apache.spark.sql.functions.replace(
            e, lit(s" $a $b "), lit(s" $a$b "))
          org.apache.spark.sql.functions.replace(
            one, lit(s" $a $b "), lit(s" $a$b "))
        }
        seg = seg.select(applied.as("s"), col("f")).localCheckpoint()
        old.unpersist()
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
