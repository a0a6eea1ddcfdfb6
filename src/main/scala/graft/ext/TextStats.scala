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

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: language ID at corpus scale is a
    * scan-local scoring pass; precision comes from the caller swapping in
    * bigger lists, not from this module. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "les", "de", "et", "des", "une", "est", "dans", "pour", "que"))

  /** Per-language stopword hit count (with multiplicity). */
  def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

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
    val text = col(textCol)
    val toks = wordTokens(text)
    val nWords = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val nAlnum = (nChars - length(regexp_replace(text, "[A-Za-z0-9]", "")))
    val nStops = langScore(toks, Stopwords.head._2).cast("double")
    val meanWlen = when(size(toks) > 0,
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nWords)
      .otherwise(lit(0.0))
    val lengthTerm = least(nWords / lit(100.0), lit(1.0))
    val alnumTerm = when(nChars > 0, nAlnum / nChars).otherwise(lit(0.0))
    val stopTerm = when(size(toks) > 0, least(nStops / nWords * lit(3.0), lit(1.0)))
      .otherwise(lit(0.0))
    val wlenTerm = when(meanWlen >= 3 && meanWlen <= 10, lit(1.0)).otherwise(lit(0.0))
    df.withColumn("quality",
      lengthTerm * lit(0.25) + alnumTerm * lit(0.25) +
        stopTerm * lit(0.25) + wlenTerm * lit(0.25))
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
}
