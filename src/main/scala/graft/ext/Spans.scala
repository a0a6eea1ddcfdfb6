package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level (repeated-SPAN) duplication across documents: finds
  * k-token spans that occur in ≥ `minDocs` distinct documents, and the
  * per-document fraction of tokens covered by such spans.
  *
  * Document-level near-dup (MinHash/SimHash in [[Dedup]]) misses the
  * dominant duplication mode in web corpora — verbatim BOILERPLATE
  * (license headers, navigation chrome, quoted passages) embedded inside
  * otherwise-distinct documents. Span-level dedup catches exactly that;
  * it is the distributed analog of the suffix-array substring dedup of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL 2022), with fixed-k shingles standing in for arbitrary-
  * length repeated substrings (a span repeated at length ≥ k is reported
  * by all its k-windows, so coverage is identical for spans ≥ k).
  *
  * Scale shape (100 TB): the core never builds or ships span STRINGS —
  * each token is hashed once (`xxhash64`), and a span's key is a
  * polynomial fold of its k token hashes, so the positions frame is
  * (long, int, long) rows. The census groupBy is map-side combined, so a
  * corpus-wide boilerplate span costs one partial counter per partition,
  * not a hot-key shuffle; the repeated-key set is corpus-sparse, so the
  * positions⋈repeated join AQE-broadcasts its build side. Span text is
  * re-derived ONLY for matched occurrences (report path), and the
  * report re-groups on the text itself so hash collisions can add
  * candidates but never corrupt output counts. Coverage's explode is k×
  * the REPEATED positions only, never k× the corpus. */
object Spans {

  /** Per-row array of the doc's k-token spans as strings (space-joined).
    * Array-level `transform`, no explode; empty below k tokens. Used on
    * the REPORT path only — the census works on hashes. */
  def spanArray(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Span KEYS from a pre-hashed token array (`th` = xxhash64 per token,
    * bound in a prior projection so the per-span lambda hashes k LONGS,
    * never k strings): key_i = xxhash64(th[i..i+k-1]) — Spark's hash
    * expressions fold array elements natively, no overflow-prone
    * arithmetic under ANSI mode. Equal token sequences ⇒ equal keys;
    * 64-bit keys make collisions corpus-negligible. */
  private def spanKeyArray(th: Column, k: Int): Column =
    when(size(th) >= k,
      transform(sequence(lit(1), size(th) - (k - 1)),
        i => xxhash64(slice(th, i, lit(k)))))
      .otherwise(typedLit(Seq.empty[Long]))

  /** (doc_id, pos 1-based, sh) — one fixed-width row per span occurrence;
    * no strings. */
  def positions(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        transform(Dedup.tokens(col(textCol)), t => xxhash64(t)).as("__th"))
      .select(col("doc_id"), posexplode(spanKeyArray(col("__th"), k)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sh"))

  /** Census of a positions frame: (sh, n_docs, n_occ) for keys in
    * ≥ `minDocs` distinct docs. One map-side-combined aggregation. */
  private def census(pos: DataFrame, minDocs: Int): DataFrame =
    pos.groupBy("sh")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** Hash-keyed repeated-span census: (sh, n_docs, n_occ). */
  def repeatedSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minDocs: Int = 2): DataFrame =
    census(positions(docs, textCol, idCol, k), minDocs)

  /** UNFILTERED census: (sh, n_docs, n_occ) for every span key. This is
    * the mergeable partial for incremental maintenance: when partials
    * partition the corpus BY DOCUMENT, both counters are summable
    * (yesterday's census + today's == whole-history census via
    * [[graft.ops.Maintenance.mergePartialAggregates]]) — no rescan. */
  def spanCensus(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame =
    census(positions(docs, textCol, idCol, k), minDocs = 1)

  /** Report derived from a PRE-BUILT repeated-key set `repKeys` (any
    * frame with an `sh` column — a fresh census or a merged incremental
    * one): matched occurrences are re-derived to span text by
    * re-tokenizing only docs that contain matches, and counts re-grouped
    * on the text itself — output never trusts hash uniqueness. */
  def reportFromKeys(docs: DataFrame, textCol: String, idCol: String,
      k: Int, repKeys: DataFrame, minDocs: Int = 2): DataFrame = {
    val pos = positions(docs, textCol, idCol, k)
    val matched = pos.join(repKeys.select("sh"), Seq("sh"))
      .select("doc_id", "pos")
    val toks = docs.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("__t"))
    matched.join(toks, Seq("doc_id"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("__t"), col("pos"), lit(k))).as("span"))
      .groupBy("span")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Human-readable repeated-span report: (span, n_docs, n_occ). */
  def repeatedSpanReport(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minDocs: Int = 2): DataFrame =
    reportFromKeys(docs, textCol, idCol, k,
      repeatedSpans(docs, textCol, idCol, k, minDocs), minDocs)

  /** Per-doc duplicate-span coverage: (doc_id, n_tokens, covered_tokens,
    * dup_gate) where covered_tokens counts token positions inside ≥ 1
    * cross-doc repeated span (union of [pos, pos+k) windows — overlaps
    * counted once) and `dup_gate` = 1 when coverage ≥ `gatePct`% of the
    * doc. Integer arithmetic end to end: cross-engine exact. */
  def coverage(docs: DataFrame, textCol: String, idCol: String, k: Int,
      minDocs: Int = 2, gatePct: Int = 20): DataFrame = {
    val pos = positions(docs, textCol, idCol, k)
    val covered = pos.join(census(pos, minDocs).select("sh"), Seq("sh"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("j"))
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("covered_tokens"))
    docs.select(col(idCol).as("doc_id"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("covered_tokens"))
      .withColumn("dup_gate",
        (col("covered_tokens") * 100 >= col("n_tokens") * gatePct)
          .cast("long"))
  }
}
