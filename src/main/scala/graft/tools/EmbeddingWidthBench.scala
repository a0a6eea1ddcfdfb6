package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EmbeddingAdmission

/** Measures what the self-sized sketch width (SURVEY §15.13) buys the
  * streaming embedding-admission probe: two [[EmbeddingAdmission]]
  * instances are pre-populated with the SAME vectors — one pinned to
  * the base width (`maxPlanes = planes`, the pre-r13 fixed-width
  * behavior), one free to grow — then the per-trigger `admit()` cost of
  * identical fresh batches is compared.
  *
  * The quantity at stake is bucket occupancy: at fixed planes=4 a
  * registry of N vectors holds N/16 rows per (table, bucket), and every
  * probe key drags that whole bucket through the exact-cosine verify —
  * the probe's candidate count is |batch| × tables × N/2^planes, linear
  * in corpus lifetime. The self-sized instance re-buckets to
  * width ≈ 4 + log2(N/sizeDatum) at every fold, pinning occupancy (and
  * the verify workload) ~constant.
  *
  * Usage: runMain graft.tools.EmbeddingWidthBench [nVecs] [batchVecs]
  *   (defaults 24000 / 256; dim 64, tables 8 — production-shaped)
  */
object EmbeddingWidthBench {

  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 24000
    val batchVecs = if (args.length > 1) args(1).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    println(s"[embwidth] nVecs=$nVecs batchVecs=$batchVecs dim=$dim " +
      "tables=8 threshold=0.95 (fixed = maxPlanes pinned to base 4; " +
      "sized = self-sizing on, sizeDatum=1000)")

    // Deterministic pseudo-random unit-ish vectors as a SQL expression
    // (no RNG state: vector j's component k = hash-derived in [-1, 1]).
    def vecExpr(idCol: String) = array((0 until dim).map(k =>
      (pmod(xxhash64(col(idCol) * dim + k, lit("v")), lit(2000001L))
        .cast("float") / 1000000.0f - 1.0f)): _*)
    def batchOf(fromId: Long, n: Int) = spark.range(fromId, fromId + n)
      .select(col("id").as("vec_id"), vecExpr("vec_id").as("embedding"))
    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }

    Seq(
      ("fixed", 4),  // maxPlanes = planes: the pre-r13 pinned width
      ("sized", 20)  // self-sizing free to grow
    ).foreach { case (tag, maxP) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_embw_$tag").toString + "/state"
      val adm = new EmbeddingAdmission(dir, "embedding", "vec_id",
        threshold = 0.95, planes = 4, tables = 8, dim = dim,
        compactEvery = 4, shards = 16, maxPlanes = maxP)
      // Pre-populate in admit-sized steps (the live-stream cadence, so
      // folds fire and the sized arm actually re-buckets).
      val popBatch = 3000
      val (popS, _) = timed {
        (0 until nVecs / popBatch).foreach { b =>
          adm.admit(batchOf(b.toLong * popBatch, popBatch), b.toLong)
            .count()
        }
      }
      val nBatches = nVecs / popBatch
      // Fresh probes: p50/max admit seconds over 5 identical-shape
      // triggers of new ids (disjoint id/vector space).
      val admitS = (0 until 5).map { r =>
        val (secs, _) = timed {
          adm.admit(batchOf(10000000L + r * 1000000L, batchVecs),
            100L + r).write.mode("overwrite").parquet(dir + "_out")
        }
        secs
      }.sorted
      val widths = spark.read.parquet(dir).select("planes").distinct()
        .collect().map(_.getInt(0)).sorted.mkString(",")
      println(f"[embwidth] arm=$tag%-5s populate_s=$popS%7.1f " +
        f"(over $nBatches batches) widths_on_disk=[$widths] " +
        f"admit_s_p50=${admitS(2)}%6.2f admit_s_min=${admitS.head}%6.2f " +
        f"admit_s_max=${admitS.last}%6.2f")
    }
    spark.stop()
  }
}
