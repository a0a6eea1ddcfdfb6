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

  test("sketch width self-sizes with registry growth; folds re-bucket history") {
    val s = spark
    import s.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_embsz_").toString + "/state"
    // sizeDatum=4: width = 3 + log2(admitted/4) -> grows at fixture scale.
    val adm = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L,
      compactEvery = 2, sizeDatum = 4L)
    def widthsOnDisk(): Set[Int] = spark.read.parquet(stateDir)
      .select("planes").distinct().collect().map(_.getInt(0)).toSet
    def batchDf(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

    // batch 0 (registry empty -> width 3): 8 mutually-distant vectors
    val b0 = (1 to 8).map(i => (i.toLong, v(i * 3).toSeq))
    assert(adm.admit(batchDf(b0), 0L).count() == 8)
    assert(widthsOnDisk() == Set(3), s"got ${widthsOnDisk()}")
    // batch 1 (8 admitted -> width 3 + log2(8/4) = 4): fresh vectors
    // REGISTER AT THE GROWN WIDTH while width-3 history still gates
    val b1 = (11 to 18).map(i => (i.toLong, v(i * 7 + 1).toSeq))
    assert(adm.admit(batchDf(b1), 1L).count() == 8)
    assert(widthsOnDisk() == Set(3, 4), s"got ${widthsOnDisk()}")
    // batch 2: compactEvery=2 folds batches 0+1 FIRST and the fold hook
    // re-buckets all 16 admitted ids at width(16) = 5; the trigger then
    // probes widths 3..5 and must still reject a near-copy of batch 0's
    // very first vector THROUGH the re-bucketed history.
    val b2 = Seq((21L, near(v(3), 0.01f, 99).toSeq), (22L, v(1000).toSeq))
    val admitted2 = adm.admit(batchDf(b2), 2L)
      .select("vec_id").as[Long].collect().toSet
    assert(admitted2 == Set(22L),
      s"near-dup must be rejected through re-bucketed history: $admitted2")
    assert(widthsOnDisk() == Set(5), s"fold left mixed widths: ${widthsOnDisk()}")
    // replay of batch 2: width derivation excludes the batch's own
    // append, so the decisions (and the blocking geometry) are identical
    assert(adm.admit(batchDf(b2), 2L)
      .select("vec_id").as[Long].collect().toSet == Set(22L))
  }

  test("bootstrap seeds history that gates admits; replay-deterministic width") {
    val s = spark
    import s.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_embboot_").toString + "/state"
    val adm = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L,
      sizeDatum = 4L)
    // seed from an "already-curated corpus": no gating, all register
    val corpus = (1 to 8).map(i => (i.toLong, v(i * 3).toSeq))
      .toDF("vec_id", "embedding")
    adm.bootstrap(corpus, 0L)
    assert(spark.read.parquet(stateDir).select("id").distinct().count() == 8)
    // a replayed bootstrap overwrites its own append (no duplication)
    // and derives the same width (own-batch exclusion)
    adm.bootstrap(corpus, 0L)
    assert(spark.read.parquet(stateDir).select("id").distinct().count() == 8)
    assert(spark.read.parquet(stateDir).select("planes").distinct()
      .collect().map(_.getInt(0)).toSet == Set(3))
    // admit() now gates against the seeded history: a near-copy of a
    // bootstrapped vector is rejected, a fresh one admits
    val probe = Seq((100L, near(v(3), 0.01f, 42).toSeq),
      (101L, v(900).toSeq)).toDF("vec_id", "embedding")
    assert(adm.admit(probe, 1L).select("vec_id").as[Long].collect()
      .toSet == Set(101L))
  }

  test("family-parameter drift on an existing store is refused") {
    val s = spark
    import s.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_embfam_").toString + "/state"
    val adm = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L)
    assert(adm.admit(Seq((1L, v(1).toSeq)).toDF("vec_id", "embedding"), 0L)
      .count() == 1)
    // maxPlanes shifts every table's hyperplane draws past table 0 —
    // restarting with a different value would silently stop matching
    // history. The _family record must refuse it.
    val drifted = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L,
      maxPlanes = 24)
    assertThrows[IllegalArgumentException] {
      drifted.admit(Seq((2L, v(2).toSeq)).toDF("vec_id", "embedding"), 1L)
    }
    // same params -> accepted
    val same = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L)
    assert(same.admit(Seq((3L, v(3).toSeq)).toDF("vec_id", "embedding"), 1L)
      .count() == 1)
    // base-width drift (ADVICE r13): probeWidths filters `w >= planes`
    // and the fail-safe ladder starts at `planes`, so a LARGER base on
    // an existing store would silently drop legitimate on-disk widths
    // from the probe — history at the old widths never matches and
    // near-dups of admitted vectors re-admit. _family pins it.
    val widerBase = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 5, tables = 4, dim = 8, seed = 7L)
    assertThrows[IllegalArgumentException] {
      widerBase.admit(Seq((4L, v(4).toSeq)).toDF("vec_id", "embedding"), 2L)
    }
    // sizeDatum drift changes the size→width map (replay determinism)
    val driftedDatum = new EmbeddingAdmission(stateDir, "embedding",
      "vec_id", threshold = 0.95, planes = 3, tables = 4, dim = 8,
      seed = 7L, sizeDatum = 500L)
    assertThrows[IllegalArgumentException] {
      driftedDatum.admit(Seq((5L, v(5).toSeq)).toDF("vec_id", "embedding"), 2L)
    }
    // LEGACY pin upgrade (ADVICE r14): a store created before planes/
    // sizeDatum joined the pin recorded only the 4-field prefix. The
    // strict equality used to fail every restart forever; now the
    // prefix is accepted and the pin rewritten with the current
    // instance's planes/sizeDatum.
    val famPath = java.nio.file.Paths.get(s"$stateDir/_family")
    val current = new String(java.nio.file.Files.readAllBytes(famPath))
    val legacyPin = current.split(" ").take(4).mkString(" ")
    java.nio.file.Files.write(famPath, legacyPin.getBytes)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$stateDir/._family.crc"))
    val resumed = new EmbeddingAdmission(stateDir, "embedding", "vec_id",
      threshold = 0.95, planes = 3, tables = 4, dim = 8, seed = 7L)
    assert(resumed.admit(Seq((6L, v(6).toSeq)).toDF("vec_id", "embedding"),
      2L).count() == 1, "legacy 4-field pin must be accepted")
    assert(new String(java.nio.file.Files.readAllBytes(famPath)).trim
      == current.trim, "legacy pin must be rewritten to the full format")
    // ...and the upgraded pin still refuses real drift
    assertThrows[IllegalArgumentException] {
      driftedDatum.admit(Seq((7L, v(7).toSeq)).toDF("vec_id", "embedding"), 3L)
    }
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
