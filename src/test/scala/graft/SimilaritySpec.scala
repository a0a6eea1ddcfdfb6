package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestSupport {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f, 0f)),
      (4L, Array(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
  }

  test("bruteForceTopK orders by cosine descending") {
    val got = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      Array(1f, 0f, 0f, 0f), 3).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L) || got == Seq(0L, 1L, 3L))
    assert(got.take(2) == Seq(0L, 1L))
  }

  test("topKForId excludes the query row itself") {
    val got = Similarity.topKForId(corpus, "embedding", "vec_id", 0L, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(!got.contains(0L) && got.head == 1L)
  }

  test("lshTopK finds an exact-duplicate vector (identical buckets)") {
    val got = Similarity.lshTopK(corpus, "embedding", "vec_id",
      Array(1f, 0f, 0f, 0f), 2, planes = 4, tables = 8).collect()
    assert(got.nonEmpty && got.head.getLong(0) == 0L)
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("ivfTopK probes nearest cells and returns ranked neighbors") {
    val cents = Array((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
    val got = Similarity.ivfTopK(corpus, "embedding", "vec_id",
      Array(0.95f, 0.05f, 0f, 0f), 2, cents, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 1L || got.head == 0L)
    assert(got.toSet.subsetOf(Set(0L, 1L))) // only cell 0 probed
  }

  test("sampleCentroids is deterministic and bounded") {
    val c = Similarity.sampleCentroids(corpus, "embedding", "vec_id", 2)
    assert(c.length == 2 && c(0)._2.head == 1f)
  }
}
