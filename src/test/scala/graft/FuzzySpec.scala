package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Fuzzy

class FuzzySpec extends AnyFunSuite with SparkTestSupport {

  test("deletions: every single-char deletion, in position order") {
    val s = spark
    import s.implicits._
    val got = Seq("abc").toDF("t")
      .select(Fuzzy.deletions(col("t"))).head().getSeq[String](0)
    assert(got == Seq("bc", "ac", "ab"))
  }

  test("editOnePairs: complete vs brute force on a crafted vocab") {
    val s = spark
    import s.implicits._
    // table/tables (insert), table/cable (substitute), tabl (deletion),
    // ab/ba-style distance-2 collision (bcde/cbde share deletions of the
    // leading pair region? verify via brute force), unrelated word.
    val toks = Seq("table", "tables", "cable", "tabl", "bcde", "cbde",
      "zebra")
    val left = toks.toDF("a")
    val right = toks.toDF("b")
    val got = Fuzzy.editOnePairs(left, "a", right, "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // Brute-force reference: all ordered pairs at levenshtein distance 1.
    val brute = (for {
      a <- toks; b <- toks if a != b
      if levDist(a, b) == 1
    } yield (a, b)).toSet
    assert(got == brute)
    // sanity: the crafted distance-2 collision is a candidate (shares a
    // deletion key) but must be verified away
    assert(levDist("bcde", "cbde") == 2 && !got.contains(("bcde", "cbde")))
    assert(got.contains(("tabl", "table")) && got.contains(("table", "cable")))
  }

  test("editOnePairs: minLen excludes short tokens on both sides") {
    val s = spark
    import s.implicits._
    val got = Fuzzy.editOnePairs(
        Seq("ab", "abc").toDF("a"), "a",
        Seq("ba", "abd", "abcd").toDF("b"), "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("abc", "abd"), ("abc", "abcd"))) // "ab"/"ba" gone
  }

  test("editOnePairs: bucket cap drops hot deletion keys") {
    val s = spark
    import s.implicits._
    // 30 tokens "aaX" all sharing deletion key "aa": combined bucket 90+
    // entries; cap 10 suppresses the whole family, the isolated pair
    // (zzzq, zzzr) survives via its cold keys.
    val fam = ('a' to 'z').map(c => s"aa$c") ++ Seq("zzzq")
    val got = Fuzzy.editOnePairs(
        fam.toDF("a"), "a", Seq("zzzr", "aab").toDF("b"), "b",
        maxBucket = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("zzzq", "zzzr")))
  }

  test("bestCorrection: argmax weight with token tie-break") {
    val s = spark
    import s.implicits._
    val pairs = Seq(("tabl", "table", 50L), ("tabl", "cable", 50L),
      ("tabl", "fable", 99L), ("valu", "value", 7L))
      .toDF("a", "b", "tf")
    val got = Fuzzy.bestCorrection(pairs, "a", "b", "tf")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("tabl" -> "fable", "valu" -> "value"))
  }

  /** Plain Levenshtein (reference implementation for the spec). */
  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
