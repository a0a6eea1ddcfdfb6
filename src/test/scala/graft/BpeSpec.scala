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

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("256 merges: strict batching is decision-identical; relaxed is sublinear") {
    // VERDICT r18 #2. Strict mode may only batch what the snapshot
    // PROVES sequential induction picks next — on a Zipf-ish corpus
    // (400 random words, harmonic frequencies, 20 letters) its
    // (rank, lhs, rhs, cnt) table must be byte-identical to
    // one-merge-per-round induction. Relaxed mode (the standard
    // parallel-BPE skip-and-continue batch) must induce the same
    // NUMBER of merges in sublinearly many Spark rounds — the
    // realistic-vocab job-latency fix.
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 400).map { _ =>
      val len = 2 + rnd.nextInt(6)
      (0 until len).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString
    }.distinct
    val text = vocab.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 + 2000 / (i + 1))(w) }
      .mkString(" ")
    val corpus = docs((1L, text))
    val strictW = scala.collection.mutable.ArrayBuffer.empty[Int]
    val batched = rows(Bpe.induceMerges(corpus, "text", rounds = 256,
      roundProbe = strictW += _))
    val sequential = rows(Bpe.induceMerges(corpus, "text", rounds = 256,
      maxBatch = 1))
    assert(batched == sequential, "strict batching changed decisions")
    assert(batched.size == 256 && strictW.sum == 256)
    val relaxedW = scala.collection.mutable.ArrayBuffer.empty[Int]
    val relaxed = rows(Bpe.induceMerges(corpus, "text", rounds = 256,
      strict = false, roundProbe = relaxedW += _))
    info(s"spark rounds for 256 merges: strict=${strictW.size} " +
      s"relaxed=${relaxedW.size} (relaxed widths: ${relaxedW.mkString(",")})")
    assert(relaxed.size == 256 && relaxedW.sum == 256)
    assert(relaxedW.size <= 32, // ≥8× fewer scheduler rounds
      s"relaxed batching failed to engage: $relaxedW")
    // relaxed rounds record snapshot-exact counts and start at the true
    // argmax: the first merge always agrees with sequential
    assert(relaxed.head == sequential.head)
    // every relaxed round is internally count-ordered (rank order is
    // the snapshot's sort within a batch)
    var off = 0
    relaxedW.foreach { wdt =>
      val slice = relaxed.slice(off, off + wdt)
      assert(slice.map(_._4).sliding(2).forall(s =>
        s.size < 2 || s(0) >= s(1)), s"unsorted batch at $off")
      off += wdt
    }
  }

  test("a sharp interaction-free count decay batches a whole round") {
    // 12 two-letter words over pairwise-disjoint letters: the complete
    // pair list is interaction-free, so ONE Spark round must accept
    // all 12 merges — in the exact order sequential induction picks
    // them (distinct geometric counts pin the order).
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl",
      "mn", "op", "qr", "st", "uv", "wx")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 << (12 - i))(w) }.mkString(" ")
    val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = rows(Bpe.induceMerges(docs((1L, text)), "text", rounds = 12,
      roundProbe = widths += _))
    assert(widths.toSeq == Seq(12), s"expected one 12-wide round: $widths")
    assert(m == words.zipWithIndex.map { case (w, i) =>
      ((i + 1).toLong, w(0).toString, w(1).toString, (1L << (12 - i)))
    })
  }
}
