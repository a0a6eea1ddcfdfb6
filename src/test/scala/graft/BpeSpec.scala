package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

class BpeSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // "abab" ×3 + "ab" ×2: pair (a,b) weighted count = 3·2 + 2·1 = 8 wins
  // round 1; round 2's best is (ab,ab) count 3 (inside "abab").
  private val corpus = docs(
    (1L, "abab abab abab ab ab"),
    (2L, "xy"))

  test("induceMerges picks weighted argmax per round with deterministic ties") {
    val m = Bpe.induceMerges(corpus, "text", rounds = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m(0) == (1L, "a", "b", 8L))
    assert(m(1) == (2L, "ab", "ab", 3L))
  }

  test("two-pass replace merges consecutive self-pair runs like greedy BPE") {
    // "aaaa" ×1: round 1 best is (a,a) count 3 (overlapping pairs);
    // greedy left-to-right segmentation of aaaa under merge (a,a) is
    // [aa, aa] — the single-pass skip would leave [aa, a, a].
    val seg = Bpe.segment(docs((1L, "aaaa")), "text", Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("aaaa") == Seq("aa", "aa"))
  }

  test("pinned semantics: odd self-pair runs ≥ 5 deviate from strict greedy") {
    // " a a a a a ": pass 1 merges both ends → [aa, a, aa]; strict greedy
    // BPE would give [aa, aa, a] (same symbol multiset, different
    // placement). Both engines pin the two-pass replace (Bpe scaladoc),
    // so the harness stays hash-consistent — this test locks the pinned
    // behavior, not Sennrich fidelity.
    val seg = Bpe.segment(docs((1L, "aaaaa")), "text", Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("aaaaa") == Seq("aa", "a", "aa"))
  }

  test("segment applies merges in rank order") {
    val seg = Bpe.segment(corpus, "text", Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("abab") == Seq("abab"))
    assert(seg("ab") == Seq("ab"))
    assert(seg("xy") == Seq("x", "y"))
  }

  test("early stop when no pairs remain") {
    val m = Bpe.induceMerges(docs((1L, "a b c")), "text", rounds = 5)
    assert(m.count() == 0) // all words single-char: no adjacent pairs
  }
}
