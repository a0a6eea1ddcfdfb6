package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension): token counting, language ID, quality scoring, document
  * fingerprinting. Everything is built-in expressions (codegen'd, no UDFs)
  * so the whole stage fuses with the parquet scan — at 100 TB these run at
  * scan speed with zero shuffles (all per-row).
  *
  * Each formula has an exact ANSI-SQL twin for the DuckDB oracle; regex
  * patterns are kept in the Java∩RE2 common subset so both engines match
  * identically.
  */
object TextStats {

  /** Fixed-name output columns would silently clobber same-named input
    * columns (Spark resolves case-insensitively by default) — fail fast
    * instead; callers rename their column or project it away first. */
  private def requireFresh(df: DataFrame, out: String*): Unit = {
    val clash = out.filter(o => df.columns.exists(_.equalsIgnoreCase(o)))
    require(clash.isEmpty, s"input schema already has column(s) " +
      s"${clash.mkString(", ")} that this operator would overwrite")
  }

  /** Lowercase alphanumeric word tokens. */
  def wordTokens(c: Column): Column = Dedup.tokens(c)

  /** BPE-ish subword segmentation regex (GPT-2-style word/number/punct
    * splits, no lookahead so RE2-compatible). */
  val BpePattern: String = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9']+"

  /** Token counts: whitespace-ish words and BPE-ish pieces. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_words", size(wordTokens(col(textCol))))
    .withColumn("n_bpe", size(regexp_extract_all(col(textCol),
      lit(BpePattern), lit(0))))

  /** Corpus vocabulary statistics: per-token total frequency (tf) and
    * document frequency (df). One explode + one hash aggregation —
    * map-side combine collapses each partition's counts before the
    * shuffle, so shuffle volume is |local vocab| per partition, not
    * |tokens|. df uses exact count_distinct; at 100 TB swap in
    * `approx_count_distinct` if ±2% df error is acceptable (tf drives
    * BPE/vocab selection; df only feeds idf-style weighting). */
  def vocabulary(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(wordTokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("__doc")).as("df"))

  /** Per-document out-of-vocabulary stats against a `vocab` table with a
    * `token` column (e.g. the top-k of [[vocabulary]]): token count, OOV
    * count, OOV rate — the tokenizer-fit diagnostic that decides whether
    * a corpus slice needs vocab expansion before training. Zero-token
    * documents are kept (0, 0, 0.0).
    *
    * Scale: the vocab is broadcast (a tokenizer vocab is 30-200 k rows);
    * the exploded tokens never shuffle token strings — the in-vocab flag
    * reduces straight back to the doc key via map-side combine. */
  def oovStats(df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(wordTokens(col(textCol))).as("token"))
    val agg = toks
      .join(broadcast(vocab.select(col("token")).distinct()
        .withColumn("__iv", lit(1))), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nt"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("__no"))
    df.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nt"), lit(0L)).as("n_tokens"),
        coalesce(col("__no"), lit(0L)).as("n_oov"),
        (floor((when(coalesce(col("__nt"), lit(0L)) > 0,
            coalesce(col("__no"), lit(0L)).cast("double") / col("__nt"))
          .otherwise(lit(0.0))) * lit(10000) + lit(0.5)) / lit(10000))
          .as("oov_rate"))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: language ID at corpus scale is a
    * scan-local scoring pass; precision comes from the caller swapping in
    * bigger lists, not from this module. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "les", "de", "et", "des", "une", "est", "dans", "pour", "que"))

  /** Per-language stopword hit count (with multiplicity).
    *
    * Pure builtins: count(w in toks) = |toks| − |array_remove(toks, w)|,
    * summed over the (distinct) word list — equivalent to the obvious
    * `size(filter(toks, isin(words)))` but that lambda filter is a
    * `CodegenFallback` and would kick every scoring projection
    * (languageId, qualityScore, ruleFilter, budget selection) out of
    * WholeStageCodegen. */
  def langScore(toks: Column, words: Seq[String]): Column =
    words.map(w => size(toks) - size(array_remove(toks, w)))
      .reduce(_ + _)

  /** Language ID: argmax of stopword hit counts, first-listed language
    * wins ties, `und` when no list scores > 0. */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = wordTokens(col(textCol))
    val scored = Stopwords.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", langScore(toks, words))
    }
    val best = Stopwords.map { case (l, _) => col(s"score_$l") }.reduce(greatest(_, _))
    val pick = Stopwords.foldRight(lit("und")) { case ((lang, _), alt) =>
      when(col(s"score_$lang") === best && best > 0, lang).otherwise(alt)
    }
    scored.withColumn("lang_id", pick)
      .drop(Stopwords.map { case (l, _) => s"score_$l" }: _*)
  }

  /** Heuristic document quality score in [0,1]: length saturation,
    * alphanumeric ratio, English stopword ratio, mean word length band.
    * All terms are ratios of integer counts → cross-engine deterministic. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    requireFresh(df, "quality")
    df.withColumn("quality",
      qualityExpr(col(textCol), wordTokens(col(textCol))))
  }

  /** The quality expression from a PRECOMPUTED token array. Callers that
    * also need the tokens for other columns (e.g. a token count next to
    * the score) should project `toks` once in its own select and feed the
    * column here — Catalyst keeps a non-cheap multiply-referenced alias
    * as a projection boundary, so the tokenizing regex runs once per row
    * instead of once per consumer. */
  def qualityExpr(text: Column, toks: Column): Column = {
    val nWords = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val nAlnum = (nChars - length(regexp_replace(text, "[A-Za-z0-9]", "")))
    val nStops = langScore(toks, Stopwords.head._2).cast("double")
    val meanWlen = when(size(toks) > 0,
      // Σ token lengths as a builtin (array_join concatenation) — the
      // aggregate() lambda fold is CodegenFallback, see langScore
      length(array_join(toks, "")).cast("double") / nWords)
      .otherwise(lit(0.0))
    val lengthTerm = least(nWords / lit(100.0), lit(1.0))
    val alnumTerm = when(nChars > 0, nAlnum / nChars).otherwise(lit(0.0))
    val stopTerm = when(size(toks) > 0, least(nStops / nWords * lit(3.0), lit(1.0)))
      .otherwise(lit(0.0))
    val wlenTerm = when(meanWlen >= 3 && meanWlen <= 10, lit(1.0)).otherwise(lit(0.0))
    lengthTerm * lit(0.25) + alnumTerm * lit(0.25) +
      stopTerm * lit(0.25) + wlenTerm * lit(0.25)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 family),
    * per-row and shuffle-free:
    *
    *   - `dup_line_frac`: 1 − |distinct non-empty lines| / |non-empty
    *     lines| — boilerplate/template detector.
    *   - `top_bigram_frac`: occurrences of the most frequent word 2-gram
    *     / total 2-grams — loop/spam detector. Mode count is an O(d²)
    *     HOF over DISTINCT grams within the row (d ≤ tokens; fine for
    *     document-sized rows — a corpus-wide variant would explode +
    *     groupBy instead).
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)
    val dupLineFrac = when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double")
        / size(lines).cast("double"))
      .otherwise(lit(0.0))
    val grams = Dedup.wordNgramsAll(col(textCol), 2)
    val topCount = array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g))))
    val topBigramFrac = when(size(grams) > 0,
      topCount.cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
    df.withColumn("dup_line_frac", dupLineFrac)
      .withColumn("top_bigram_frac", topBigramFrac)
  }

  /** Cross-engine-safe PII patterns (Java∩RE2, no lookaround; literal
    * space instead of \s inside classes so both engines agree). */
  val UrlPattern = "https?://[^ \\t\\n]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 ().-]{7,}[0-9]"

  /** PII scrubbing: counts + redaction of URLs, emails, and phone-shaped
    * numbers. Pure regex projections (codegen'd, scan-fused). Redaction
    * order URL → email → phone so an email inside a URL is counted once
    * as URL. Counts are taken BEFORE redaction; the patterns are
    * non-overlapping enough for training-data hygiene, not a compliance
    * tool — swap in a proper PII model for that. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    df.withColumn("n_urls", size(regexp_extract_all(text, lit(UrlPattern), lit(0))))
      .withColumn("n_emails", size(regexp_extract_all(text, lit(EmailPattern), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(text, lit(PhonePattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(text, UrlPattern, "<URL>"),
            EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))
  }

  /** Gopher-style rule-based quality FILTER (Rae et al. 2021 §A1.1
    * family): hard pass/fail per document plus the list of failed rules —
    * the form a curation pipeline actually consumes (the continuous
    * [[qualityScore]] is for ranking/curriculum; this is the gate).
    *
    * Rules (all ratios of per-row integer counts → cross-engine
    * deterministic, scan-fused, zero shuffle):
    *   too_short      word count < 20
    *   too_long       word count > 10 000
    *   mean_wlen      mean word length outside [3, 10]
    *   low_alnum      alphanumeric-character fraction < 0.6
    *   no_stopwords   < 2 English-stopword hits
    *   dup_lines      duplicate-line fraction > 0.30
    *
    * Output: `keep` boolean + `reasons` (comma-joined failed rules in the
    * fixed order above; empty string when kept). Reasons ride as ONE
    * string, not an array — cheap to store at corpus scale and directly
    * groupBy-able for rejection-rate dashboards. */
  def ruleFilter(df: DataFrame, textCol: String): DataFrame = {
    requireFresh(df, "reasons", "keep")
    val text = col(textCol)
    val toks = wordTokens(text)
    val nWords = size(toks)
    val nChars = length(text).cast("double")
    val nAlnum = (nChars - length(regexp_replace(text, "[A-Za-z0-9]", "")))
    val meanWlen = when(nWords > 0,
      length(array_join(toks, "")).cast("double")
        / nWords.cast("double")).otherwise(lit(0.0))
    val alnumFrac = when(nChars > 0, nAlnum / nChars).otherwise(lit(0.0))
    val nStops = langScore(toks, Stopwords.head._2)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val dupLineFrac = when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double")
        / size(lines).cast("double")).otherwise(lit(0.0))
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nWords < 20),
      "too_long" -> (nWords > 10000),
      "mean_wlen" -> (meanWlen < 3.0 || meanWlen > 10.0),
      "low_alnum" -> (alnumFrac < 0.6),
      "no_stopwords" -> (nStops < 2),
      "dup_lines" -> (dupLineFrac > 0.30))
    val reasons = concat_ws(",",
      rules.map { case (name, fail) => when(fail, lit(name)) }: _*)
    df.withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
  }

  /** Linear bag-of-words classifier INFERENCE at scan time (the
    * fasttext-style quality-classifier shape): score = Σ_t w(t) / (1000·n)
    * over tokens WITH multiplicity — one per-row fold, no shuffle, no UDF;
    * scoring 100 TB is exactly one pass fused into the scan.
    *
    * Weights are derived from the token's md5 ([[Dedup.hex32]] mod 2001,
    * centered): a deterministic, cross-engine-reproducible stand-in for a
    * learned weight table, keeping the whole path oracle-checkable. A
    * production model swaps in a broadcast weight map (or a resource file
    * opened per partition) — the plan shape is identical. The fold is
    * INTEGER (exact, order-independent); the single final division is the
    * only float op. */
  def hashClassifierScore(df: DataFrame, textCol: String): DataFrame = {
    requireFresh(df, "score")
    val toks = wordTokens(col(textCol))
    val wsum = aggregate(toks, lit(0L),
      (a, t) => a + (Dedup.hex32(t) % 2001L - 1000L))
    df.withColumn("score",
      when(size(toks) > 0,
        wsum.cast("double") / (size(toks).cast("double") * 1000.0))
        .otherwise(lit(0.0)))
  }

  /** Character k-grams of the normalized text WITH multiplicity (the LM
    * unit; [[Dedup.charShingles]] is the distinct variant for sketches).
    * Native kernel ([[graft.functions.CharNgramsExpr]]) — the HOF form
    * below is the bit-identity reference (ArrayTransform is a
    * CodegenFallback AND re-walks the string per substr). */
  def charNgrams(c: Column, k: Int): Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnShim
    coalesce(
      shim.column(graft.functions.CharNgramsExpr(
        shim.expression(Dedup.normalizedText(c)), shim.expression(lit(k)))),
      typedLit(Seq.empty[String]))
  }

  /** HOF reference form of [[charNgrams]] (kept for the bit-identity
    * spec). */
  def charNgramsHof(c: Column, k: Int): Column = {
    val norm = Dedup.normalizedText(c)
    coalesce(
      when(length(norm) < k, typedLit(Seq.empty[String]))
        .otherwise(transform(sequence(lit(0), length(norm) - k),
          i => norm.substr(i + 1, lit(k)))),
      typedLit(Seq.empty[String]))
  }

  /** Corpus character-k-gram count table — the "language model" for
    * [[lmScore]]. The normalized alphabet is 37 symbols, so the k-gram
    * key space is bounded (≤ 37³ ≈ 50k rows at k=3) REGARDLESS of corpus
    * size: at 100 TB the model is still a broadcast table. One explode +
    * one hash aggregate with map-side combine (shuffle = |local gram
    * vocab| per partition). */
  def charNgramModel(df: DataFrame, textCol: String, k: Int = 3): DataFrame =
    df.select(explode(charNgrams(col(textCol), k)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Statistical-LM quality scoring (the KenLM-perplexity-filter shape):
    * score = mean corpus frequency of the document's char k-grams —
    * gibberish and non-language bytes score near zero, fluent text of
    * the corpus's languages scores high. The model rides a BROADCAST
    * join (bounded key space, see [[charNgramModel]]), so scoring is
    * explode → broadcast lookup → per-doc re-aggregate: the corpus is
    * never shuffled, and the plan is identical with a real trained
    * count table swapped in. All-integer accumulation (exact,
    * order-independent); the single division happens per doc. */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
      model: DataFrame, k: Int = 3): DataFrame = {
    requireFresh(df, "n_grams", "lm_score")
    df.select(col(idCol), explode_outer(charNgrams(col(textCol), k)).as("gram"))
      .join(broadcast(model), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(col("gram")).as("n_grams"),
        sum(coalesce(col("cnt"), lit(0L))).as("__s"))
      .withColumn("lm_score",
        when(col("n_grams") > 0,
          col("__s").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__s")
  }

  /** TF-IDF keyword extraction: the `topK` most distinctive terms per
    * document, scored tf·(N/df) — the ratio form of idf rather than
    * ln(N/df): rank-equivalent within a document whenever tf is equal,
    * exactly cross-engine-reproducible (integer numerator, one exact
    * double division; ln differs by ULPs across libm implementations).
    *
    * Shape: one explode → (doc, term) counts with map-side combine; df
    * derives from the SAME tf table (one row per doc-term); N rides a
    * broadcast 1-row aggregate; final top-k is a window PARTITIONED by
    * doc (no global sort). Shuffle volume is |doc-term pairs|, the same
    * bound as [[vocabulary]]. */
  def keywords(df: DataFrame, textCol: String, idCol: String,
      topK: Int = 3): DataFrame = {
    val tf = df.select(col(idCol).as("id"),
        explode(wordTokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")) / col("df"))
    scored.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rn") <= topK)
      .select("id", "term", "score", "rn")
  }

  /** Document fingerprint: minimum MD5 over word 3-gram hashes (a
    * winnowing-style content signature, stable under reordering of
    * surrounding documents; MD5 so the oracle can recompute it). Falls
    * back to the whole-text hash for docs shorter than 3 words. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val grams = Dedup.wordNgrams(col(textCol), 3)
    df.withColumn("fingerprint",
      coalesce(array_min(transform(grams, g => md5(g))),
        md5(Dedup.normalizedText(col(textCol)))))
  }
  /** Tokenizer fertility by group (typically language): documents,
    * bytes, tokens, and bytes-per-token — the number that says how
    * expensive each language is to train on under a given tokenizer
    * (high fertility = the tokenizer fragments that language; a corpus
    * mix weighted by docs alone under-counts its token cost). Byte
    * length is `octet_length` (UTF-8), token count the standard word
    * tokenizer. Exact long sums; the single closing division is
    * IEEE-exact-rounded, so no rounding tolerance is needed.
    *
    * Scale shape: per-row projection then one map-side-combined groupBy
    * on the (small) group key — no window, no join. */
  /** Corpus BIGRAM CENSUS (bg, df): distinct-doc counts per word
    * bigram — a SUMMABLE quality-signal artifact (per-slice censuses
    * merge by addition, same discipline as the dedup gram census): at
    * scale it is computed once per snapshot and updated per ingest, and
    * every coverage scorer reads it instead of re-counting the corpus. */
  def bigramCensus(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    graft.ext.Dedup.parallelize(df)
      .select(col(idCol).as("id"),
        explode(graft.ext.Dedup.wordNgrams(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("df"))

  /** Per-doc BIGRAM COVERAGE against a census artifact — an OOV-ish
    * quality signal: documents whose word pairs rarely recur in the
    * corpus (gibberish, mangled encodings, exotic boilerplate) score
    * low. `n_covered` counts the doc's distinct bigrams with census
    * df ≥ `minDf`; `coverage_pct` = floor(100·covered/total) (100 for
    * docs too short to form a bigram — vacuous pass), `cov_gate` 1 iff
    * ≥ `gatePct`. All integer-exact, so the DuckDB oracle pins it.
    * Scale shape: one gram explode + census join (hash-partitioned on
    * the bigram) + two map-side-combined aggregates; no window. */
  def bigramCoverage(df: DataFrame, census: DataFrame, textCol: String,
      idCol: String, minDf: Long, gatePct: Int): DataFrame = {
    val bgs = graft.ops.Caches.track(
      graft.ext.Dedup.parallelize(df)
        .select(col(idCol), explode(
          graft.ext.Dedup.wordNgrams(col(textCol), 2)).as("bg")))
    val tot = bgs.groupBy(idCol).agg(count(lit(1)).as("n_bigrams"))
    val cov = bgs
      .join(census.filter(col("df") >= minDf).select("bg"), Seq("bg"))
      .groupBy(idCol).agg(count(lit(1)).as("n_covered"))
    df.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(cov, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("coverage_pct",
        when(col("n_bigrams") === 0, lit(100L))
          .otherwise(floor(col("n_covered") * 100 / col("n_bigrams"))))
      .withColumn("cov_gate",
        when(col("coverage_pct") >= gatePct, 1L).otherwise(0L))
  }

  def tokenFertility(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    requireFresh(df, "n_docs", "n_bytes", "n_tokens", "bytes_per_token")
    df.select(col(groupCol),
        octet_length(col(textCol)).cast("long").as("__b"),
        size(wordTokens(col(textCol))).cast("long").as("__t"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__b")).as("n_bytes"),
        sum(col("__t")).as("n_tokens"))
      .withColumn("bytes_per_token",
        when(col("n_tokens") > 0,
          col("n_bytes").cast("double") / col("n_tokens")))
  }
}
