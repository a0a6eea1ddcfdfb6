package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupAdmission

/** Streaming MinHash near-dup admission over MemoryStream micro-batches:
  * near-dups are rejected across batches (via the persistent bucket
  * registry) and within a batch (keep-lowest-id), unrelated docs land. */
class NearDupAdmissionSpec extends AnyFunSuite with SparkTestSupport {

  // Shared-prefix long texts are near-dups (Jaccard ≈ 0.9); the distinct
  // doc is disjoint vocabulary.
  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")

  test("near-dups rejected across and within micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ndadm_").toString + "/state"
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_ndadm_").toString + "/out"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ndadm_").toString + "/ck"
    val adm = new NearDupAdmission(stateDir, "text", "doc_id")

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch(adm.step((df, _) =>
        df.write.mode("append").parquet(outDir)) _)
      .start()
    try {
      // batch 1: original + intra-batch near-dup + distinct doc
      stream.addData(
        (1L, base),
        (2L, base + " tokExtra"),
        (3L, "completely different subject matter entirely unrelated"))
      q.processAllAvailable()
      // batch 2: cross-batch near-dup of doc 1 + fresh doc
      stream.addData(
        (4L, base + " tokOther"),
        (5L, "another disjoint vocabulary document arrives here"))
      q.processAllAvailable()
      val admitted = spark.read.parquet(outDir)
        .collect().map(_.getLong(0)).toSet
      assert(admitted == Set(1L, 3L, 5L))
      // registry holds admitted docs' buckets only: 3 docs × 8 bands
      val reg = spark.read.parquet(stateDir)
      assert(reg.count() == 3 * 8)
    } finally q.stop()
  }
}
