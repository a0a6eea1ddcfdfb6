package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextStats

class TextStatsSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("fixed-name outputs fail fast on input-column collision") {
    val s = spark
    import s.implicits._
    val hasQuality = Seq((1L, "text", 0.5)).toDF("doc_id", "text", "quality")
    val hasKeep = Seq((1L, "text", true)).toDF("doc_id", "text", "KEEP")
    val hasScore = Seq((1L, "text", 0.1)).toDF("doc_id", "text", "score")
    assert(intercept[IllegalArgumentException] {
      TextStats.qualityScore(hasQuality, "text")
    }.getMessage.contains("quality"))
    assert(intercept[IllegalArgumentException] {
      TextStats.ruleFilter(hasKeep, "text") // case-insensitive clash
    }.getMessage.contains("keep"))
    assert(intercept[IllegalArgumentException] {
      TextStats.hashClassifierScore(hasScore, "text")
    }.getMessage.contains("score"))
  }

  test("lmScore: fluent corpus text outranks gibberish; empty doc scores 0") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "the dog sat on the mat and the dog ran"),
      (3L, "zqxj vwkp qzzx jjjj wwww"), // grams shared with nothing
      (4L, "")).toDF("doc_id", "text")
    val model = TextStats.charNgramModel(docs, "text", 3)
    val got = TextStats.lmScore(docs, "text", "doc_id", model, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(3L)._2)
    assert(got(4L) == ((0L, 0.0)))
    // exact mean: every gram count ≥ 1, so score ≥ 1 for non-empty docs
    assert(got(3L)._2 >= 1.0)
  }

  test("tokenCounts: word and BPE-ish piece counts") {
    val r = TextStats.tokenCounts(docs((1L, "Hello, world! It's 42.")), "text").head()
    assert(r.getAs[Int]("n_words") == 5) // hello, world, it, s, 42
    // pieces: "Hello" "," " world" "!" " It" "'s" " 42" "." → 8
    assert(r.getAs[Int]("n_bpe") == 8)
  }

  test("languageId picks the stopword-dominant language, und when none") {
    val d = docs(
      (1L, "the cat and the dog of the house"),
      (2L, "el perro y la casa de los gatos que no se van"),
      (3L, "der hund und die katze ist nicht mit mir"),
      (4L, "le chien et les chats dans la maison pour une vie"),
      (5L, "zzz qqq 12345"))
    val got = TextStats.languageId(d, "text")
      .select("doc_id", "lang_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "en"); assert(got(2L) == "es")
    assert(got(3L) == "de"); assert(got(4L) == "fr")
    assert(got(5L) == "und")
  }

  test("qualityScore in [0,1]; clean prose beats symbol noise") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away into the woods"),
      (2L, "@@@@ #### !!!! %%%% ^^^^ &&&&"))
    val got = TextStats.qualityScore(d, "text")
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(1L) > got(2L))
  }

  test("ruleFilter: clean prose passes; each rule fires with its reason") {
    val clean = "the quick brown fox jumps over the lazy dog and it runs far " +
      "away into the deep dark woods where the old owl is watching for the " +
      "small grey mice that hide in the leaves near the river bank"
    val d = docs(
      (1L, clean),
      (2L, "short text"),                          // too_short (+no_stopwords)
      (3L, clean + "\nsame line\nsame line\nsame line\nsame line"), // dup_lines
      (4L, ("@#$% " * 40) + clean))                // low_alnum
    val got = TextStats.ruleFilter(d, "text")
      .select("doc_id", "keep", "reasons").collect()
      .map(r => (r.getLong(0), (r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) == (true, ""))
    assert(!got(2L)._1 && got(2L)._2.contains("too_short"))
    assert(!got(3L)._1 && got(3L)._2 == "dup_lines")
    assert(!got(4L)._1 && got(4L)._2 == "low_alnum")
  }

  test("hashClassifierScore: bounded, deterministic, empty-doc zero") {
    val d = docs(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),   // same text → same score
      (3L, "completely different words here"),
      (4L, "!!!"))                   // no tokens → 0.0
    val got = TextStats.hashClassifierScore(d, "text")
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.values.forall(s => s >= -1.0 && s <= 1.0))
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got(4L) == 0.0)
  }

  test("fingerprint stable under formatting, changes with content; short-doc fallback") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "ALPHA beta!! gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta"),
      (4L, "tiny doc"))
    val fp = TextStats.fingerprint(d, "text")
      .select("doc_id", "fingerprint").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(4L).nonEmpty)
  }

  test("oovStats: per-doc counts against a vocab, zero-token docs kept") {
    val s = spark
    import s.implicits._
    val d = docs(
      (1L, "the cat sat"),         // all in vocab
      (2L, "the zorblax quux"),    // 2 of 3 OOV
      (3L, "!!! ..."))             // zero tokens
    val vocab = Seq("the", "cat", "sat").toDF("token")
    val got = TextStats.oovStats(d, "text", "doc_id", vocab)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))))
      .toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L)._1 == 3L && got(2L)._2 == 2L)
    assert(math.abs(got(2L)._3 - 0.6667) < 1e-12)  // round4 of 2/3
    assert(got(3L) == ((0L, 0L, 0.0)))
  }
  test("tokenFertility: exact byte/token sums, null ratio on empty group") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "aa bb", "en"),   // 5 bytes, 2 tokens
      (2L, "ccc", "en"),     // 3 bytes, 1 token
      (3L, "", "xx"))        // 0 bytes, 0 tokens
      .toDF("doc_id", "text", "lang")
    val got = TextStats.tokenFertility(d, "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(got("en") == ((2L, 8L, 3L, 8.0 / 3)))
    assert(got("xx") == ((1L, 0L, 0L, null)))
  }

  test("bigramCoverage: census-backed OOV signal; short docs pass vacuously") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick fox jumps"),   // bigrams shared with doc 2
      (2L, "the quick fox sleeps"),  // "the quick"/"quick fox" df=2
      (3L, "zxqj vvkw pplm qqrs"),   // unique bigrams: coverage 0
      (4L, "word")                   // no bigram: vacuous pass
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.bigramCoverage(docs,
        graft.ext.TextStats.bigramCensus(docs, "text", "doc_id"),
        "text", "doc_id", minDf = 2L, gatePct = 50)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(1L) == ((3L, 2L, 66L, 1L))) // 2 of 3 bigrams recur
    assert(got(2L) == ((3L, 2L, 66L, 1L)))
    assert(got(3L) == ((3L, 0L, 0L, 0L)))  // gibberish gated out
    assert(got(4L) == ((0L, 0L, 100L, 1L))) // too short: vacuous pass
  }
}
