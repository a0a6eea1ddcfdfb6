package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Native n-gram kernel: bit-identical to the built-in-HOF reference form
  * on every edge the HOF handles. */
class NGramsExprSpec extends AnyFunSuite with SparkTestSupport {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b a b a b a b"),              // heavy duplicate grams
      (3L, "one two"),                       // shorter than n=3
      (4L, "solo"),                          // single token
      (5L, ""),                              // no tokens
      (6L, "Mixed CASE, punct!! and   spacing\nnewlines too"),
      (7L, null.asInstanceOf[String]))       // null text
      .toDF("doc_id", "text")
  }

  test("char-ngram kernel ≡ HOF reference on edge and multi-byte texts") {
    val s = spark
    import s.implicits._
    val texts = Seq("hello world", "", "ab", "a", "Ünïcødé — tëxt!",
      "  spaces   everywhere  ", "12345", null.asInstanceOf[String])
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val bad = texts.select(
          graft.ext.TextStats.charNgrams(col("text"), k).as("nat"),
          graft.ext.TextStats.charNgramsHof(col("text"), k).as("ref"))
        .filter(not(col("nat") === col("ref"))).count()
      assert(bad == 0, s"k=$k")
    }
  }

  test("property: char-ngram kernel ≡ HOF on random texts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abc 12!.\nXY"
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val bad = texts.select(
        graft.ext.TextStats.charNgrams(col("text"), 3).as("nat"),
        graft.ext.TextStats.charNgramsHof(col("text"), 3).as("ref"))
      .filter(not(col("nat") === col("ref"))).count()
    assert(bad == 0)
  }

  test("n < 1 (or null n) fails analysis instead of silently returning []") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("ngram_docs")
    for (badN <- Seq("0", "-1", "CAST(NULL AS INT)")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_ngrams(graft_tokens, $badN) FROM " +
          "(SELECT split(text, ' ') AS graft_tokens FROM ngram_docs)")
          .collect()
      }
      assert(e.getMessage.contains("n >= 1"), s"n=$badN: ${e.getMessage}")
    }
  }

  test("native ≡ HOF reference, distinct and with-multiplicity, n = 1..4") {
    for (n <- 1 to 4; distinct <- Seq(true, false)) {
      val native =
        if (distinct) Dedup.wordNgrams(col("text"), n)
        else Dedup.wordNgramsAll(col("text"), n)
      val hof = Dedup.wordNgramsHof(col("text"), n, distinct)
      val rows = docs.select(col("doc_id"), native.as("a"), hof.as("b"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2),
          s"null mismatch n=$n distinct=$distinct doc=${r.getLong(0)}")
        if (!r.isNullAt(1))
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"n=$n distinct=$distinct doc=${r.getLong(0)}")
      }
    }
  }

  test("builtin tokens ≡ HOF tokens on edge texts") {
    val rows = docs.select(col("doc_id"),
      Dedup.tokens(col("text")).as("a"),
      Dedup.tokensHof(col("text")).as("b")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null doc=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"doc=${r.getLong(0)}")
    }
  }

  test("distinct keeps first-occurrence order") {
    val s = spark
    import s.implicits._
    val got = Seq(Tuple1("x y x y z x y"))
      .toDF("text")
      .select(Dedup.wordNgrams(col("text"), 2))
      .head().getSeq[String](0)
    assert(got == Seq("x y", "y x", "y z", "z x"))
  }

  test("property: native ≡ HOF on random texts (tokens and n-grams)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('!', ',', '\n', '.', 'é', '_'),
      1 -> Gen.const("  ").map(_.charAt(0)))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val caseGen = for {
      texts <- Gen.nonEmptyListOf(textGen)
      n <- Gen.choose(1, 4)
      distinct <- Gen.oneOf(true, false)
    } yield (texts.take(8), n, distinct)
    val prop = Prop.forAll(caseGen) { case (texts, n, distinct) =>
      val s = spark
      import s.implicits._
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nat = if (distinct) Dedup.wordNgrams(col("text"), n)
        else Dedup.wordNgramsAll(col("text"), n)
      val rows = d.select(
        Dedup.tokens(col("text")).as("t1"),
        Dedup.tokensHof(col("text")).as("t2"),
        nat.as("g1"),
        Dedup.wordNgramsHof(col("text"), n, distinct).as("g2")).collect()
      rows.forall { r =>
        r.getSeq[String](0) == r.getSeq[String](1) &&
          r.getSeq[String](2) == r.getSeq[String](3)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("projection over the kernel stays in a whole-stage codegen span") {
    // repartition defeats ConvertToLocalRelation so a real plan forms;
    // collect first so AQE finalizes the stages it actually compiled
    val df = docs.repartition(2)
      .select(size(Dedup.wordNgrams(col("text"), 3)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in tree strings
    assert(plan.contains("*(1) Project"), plan.take(1500))
  }
}
