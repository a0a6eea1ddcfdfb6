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

  test("ivfTopKFromIndex over a persisted assignment index ≡ inline ivfTopK") {
    val cents = Array((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_").toString
    Similarity.ivfAssign(corpus, "embedding", cents)
      .write.mode("overwrite").parquet(dir)
    val q = Array(0.95f, 0.05f, 0f, 0f)
    val viaIndex = Similarity.ivfTopKFromIndex(spark.read.parquet(dir),
        "embedding", "vec_id", q, 2, cents, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Similarity.ivfTopK(corpus, "embedding", "vec_id",
        q, 2, cents, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == inline && viaIndex.nonEmpty)
  }

  test("sampleCentroids is deterministic and bounded") {
    val c = Similarity.sampleCentroids(corpus, "embedding", "vec_id", 2)
    assert(c.length == 2 && c(0)._2.head == 1f)
  }

  test("kmeansCentroids converges to the two cluster directions") {
    val s = spark
    import s.implicits._
    // Two tight clusters around x-axis and y-axis; init = first 2 by id
    // (one from each cluster by construction).
    val d = Seq(
      (0L, Array(1f, 0.05f, 0f, 0f)), (1L, Array(0.02f, 1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)), (3L, Array(0.1f, 0.9f, 0f, 0f)),
      (4L, Array(0.95f, 0f, 0f, 0f)), (5L, Array(0f, 0.95f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.kmeansCentroids(d, "embedding", "vec_id", 2, 4)
    assert(c.length == 2)
    val c0 = c(0)._2; val c1 = c(1)._2
    assert(c0(0) > c0(1) && c1(1) > c1(0)) // each centroid points at its cluster
    // deterministic: re-running yields bit-identical centroids
    val c2 = Similarity.kmeansCentroids(d, "embedding", "vec_id", 2, 4)
    assert(c.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq)
  }

  test("IVF with kmeans centroids: recall vs brute force on the fixture") {
    val embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = embs.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val brute = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val cents = Similarity.kmeansCentroids(embs, "embedding", "vec_id", 8, 3)
    val ivf = Similarity.ivfTopK(embs, "embedding", "vec_id", q, 10,
      cents, nprobe = 4).collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8 (ivf=$ivf brute=$brute)")
  }
}
