package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ext.{Dedup, Spans}

class SpansSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // k=3 corpus: docs 1 and 2 share the 4-token run "one two three four"
  // (two overlapping 3-spans); doc 3 is unrelated; doc 4 is too short.
  private val corpus = docs(
    (1L, "one two three four alpha beta"),
    (2L, "zz one two three four"),
    (3L, "totally different words here"),
    (4L, "hi bye"))

  test("spanArray emits n-k+1 spans, empty below k tokens") {
    val arr = corpus.select(col("doc_id"),
        Spans.spanArray(Dedup.tokens(col("text")), 3).as("sp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(arr(1L).length == 4 && arr(1L).head == "one two three")
    assert(arr(2L) == Seq("zz one two", "one two three", "two three four"))
    assert(arr(4L).isEmpty)
  }

  test("repeatedSpanReport finds exactly the shared spans with counts") {
    val rep = Spans.repeatedSpanReport(corpus, "text", "doc_id", k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == Map(
      "one two three" -> (2L, 2L),
      "two three four" -> (2L, 2L)))
  }

  test("coverage counts union of repeated windows once, gates at 20%") {
    val cov = Spans.coverage(corpus, "text", "doc_id", k = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1: repeated spans at pos 1,2 cover tokens 1..4 of 6 → 4/6 ≥ 20%
    assert(cov(1L) == (6L, 4L, 1L))
    // doc 2: spans at pos 2,3 cover tokens 2..5 of 5
    assert(cov(2L) == (5L, 4L, 1L))
    assert(cov(3L) == (4L, 0L, 0L))
    assert(cov(4L) == (2L, 0L, 0L))
  }

  test("merged doc-disjoint partial censuses equal the whole-corpus census") {
    import graft.ops.Maintenance
    val whole = Spans.spanCensus(corpus, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Maintenance.mergePartialAggregates(
        Seq(Spans.spanCensus(corpus.filter(col("doc_id") % 2 === 0),
            "text", "doc_id", 3),
          Spans.spanCensus(corpus.filter(col("doc_id") % 2 === 1),
            "text", "doc_id", 3)),
        Seq("sh"), Seq("n_docs", "n_occ"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
  }

  test("hash-keyed census agrees with direct string grouping") {
    val byHash = Spans.repeatedSpans(corpus, "text", "doc_id", k = 3)
      .select("n_docs", "n_occ")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val byString = Spans.repeatedSpanReport(corpus, "text", "doc_id", k = 3)
      .select("n_docs", "n_occ")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(byHash == byString)
  }
}
