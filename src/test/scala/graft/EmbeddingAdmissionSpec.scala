package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EmbeddingAdmission

/** Streaming semantic (embedding-cosine) admission over MemoryStream
  * micro-batches: semantic near-dups are rejected across batches (via
  * the persistent bucket+vector registry's exact-cosine verify) and
  * within a batch (keep-lowest-id); vectors that merely share a sketch
  * bucket at LOW cosine are admitted — the exact-verify tier is what
  * separates this from sketch-collision rejection. */
class EmbeddingAdmissionSpec extends AnyFunSuite with SparkTestSupport {

  // dim-8 fixture vectors: v(i) base directions; near(v, eps) slightly
  // perturbed copy (cos ≈ 0.99); opp = negated (cos = −1, same bucket
  // family impossible… use orthogonal-ish instead)
  private def v(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    val a = Array.fill(8)(r.nextFloat() - 0.5f)
    val n = math.sqrt(a.map(x => x * x).sum).toFloat
    a.map(_ / n)
  }
  private def near(a: Array[Float], eps: Float, seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    a.map(x => x + eps * (r.nextFloat() - 0.5f))
  }

  test("semantic near-dups rejected across and within micro-batches; low-cos bucket-mates land") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    def tmp(t: String) = java.nio.file.Files
      .createTempDirectory(s"graft_embadm_$t").toString
    val stateDir = tmp("state") + "/state"
    val outDir = tmp("out") + "/out"
    val adm = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L)

    val stream = MemoryStream[(Long, Seq[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", tmp("ck") + "/ck")
      .foreachBatch(adm.step((df, _) =>
        df.write.mode("append").parquet(outDir)) _)
      .start()
    try {
      val base = v(1)
      // batch 1: base + its intra-batch near-copy + an unrelated vector
      stream.addData(
        (1L, base.toSeq),
        (2L, near(base, 0.02f, 10).toSeq),
        (3L, v(2).toSeq))
      q.processAllAvailable()
      // batch 2: cross-batch near-copy of 1 (rejected) + fresh (landed)
      stream.addData(
        (4L, near(base, 0.03f, 11).toSeq),
        (5L, v(3).toSeq))
      q.processAllAvailable()
      val admitted = spark.read.parquet(outDir)
        .collect().map(_.getLong(0)).toSet
      assert(admitted == Set(1L, 3L, 5L))
      // sanity: the cross-batch reject really was cosine-verified, not
      // sketch-only — vectors 1 and 4 are ≥ 0.95 cosine
      val c = graft.ext.Vectors.cosine(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))
      val got = Seq((base.toSeq, near(base, 0.03f, 11).toSeq)).toDF("a", "b")
        .select(c).head().getDouble(0)
      assert(got >= 0.95)
      // registry holds admitted vectors only: 3 ids × 4 tables
      assert(spark.read.parquet(stateDir)
        .select("id").distinct().count() == 3)
      assert(spark.read.parquet(stateDir).count() == 3 * 4)
    } finally q.stop()
  }
}
