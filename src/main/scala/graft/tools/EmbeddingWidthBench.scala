package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EmbeddingAdmission

/** Measures what the self-sized sketch width (SURVEY §15.13) buys the
  * streaming embedding-admission probe: two [[EmbeddingAdmission]]
  * instances hold the SAME vectors — one pinned to the base width
  * (`maxPlanes = planes`, the pre-r13 fixed-width behavior), one free
  * to grow — and the per-trigger `admit()` cost of identical fresh
  * batches is compared.
  *
  * The quantity at stake is bucket occupancy: at fixed planes=4 a
  * registry of N vectors holds N/16 rows per (table, bucket), and every
  * probe key drags that whole bucket through the exact-cosine verify —
  * the probe's candidate count is |batch| × tables × N/2^planes, LINEAR
  * in corpus lifetime. The self-sized instance re-buckets to
  * width ≈ 4 + log2(N/sizeDatum) at every fold, pinning occupancy (and
  * the verify workload) ~constant.
  *
  * Two modes:
  *
  *   default — the r13 measurement: stream-populate `nVecs` through
  *     admit() (live cadence), then compare admit p50 on fresh batches.
  *   `curve` (VERDICT r13 #4: 96k vectors was fixture-noise territory —
  *     2.32 vs 2.96 s): populate via [[EmbeddingAdmission.bootstrap]]
  *     (the corpus-seeding path — gating 10⁶ disjoint vectors through
  *     admit() would measure nothing but the probe being admitted
  *     anyway) to checkpoints maxVecs/8, /4, /2, /1; at each, fold the
  *     registry (the sized arm re-buckets) and measure admit p50/min/max
  *     of fresh `batchVecs`-sized triggers, recording the width ladder
  *     on disk. The structural claim this turns into a measured curve:
  *     fixed-width admit seconds grow ~linearly with registry size,
  *     sized stays ~flat, gap widening with lifetime.
  *
  * Usage: runMain graft.tools.EmbeddingWidthBench [nVecs] [batchVecs]
  *        runMain graft.tools.EmbeddingWidthBench curve [maxVecs] [batchVecs]
  *   (defaults 24000 / 256, curve 1048576 / 1024 — curve batches are
  *   deliberately larger; see runCurve)
  */
object EmbeddingWidthBench {

  private val dim = 64

  // Deterministic pseudo-random unit-ish vectors as a SQL expression
  // (no RNG state: vector j's component k = hash-derived in [-1, 1]).
  private def vecExpr(idCol: String) = array((0 until dim).map(k =>
    (pmod(xxhash64(col(idCol) * dim + k, lit("v")), lit(2000001L))
      .cast("float") / 1000000.0f - 1.0f)): _*)

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val curve = args.headOption.contains("curve")
    val numeric = args.filter(_.forall(_.isDigit))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def batchOf(fromId: Long, n: Int) = spark.range(fromId, fromId + n)
      .select(col("id").as("vec_id"), vecExpr("vec_id").as("embedding"))

    if (curve) runCurve(spark, batchOf,
      numeric.headOption.map(_.toInt).getOrElse(1 << 20),
      if (numeric.length > 1) numeric(1).toInt else 1024)
    else runStream(spark, batchOf,
      numeric.headOption.map(_.toInt).getOrElse(24000),
      if (numeric.length > 1) numeric(1).toInt else 256)
    spark.stop()
  }

  /** The r13 live-cadence measurement (kept for comparability). */
  private def runStream(spark: SparkSession,
      batchOf: (Long, Int) => org.apache.spark.sql.DataFrame,
      nVecs: Int, batchVecs: Int): Unit = {
    println(s"[embwidth] mode=stream nVecs=$nVecs batchVecs=$batchVecs " +
      s"dim=$dim tables=8 threshold=0.95 (fixed = maxPlanes pinned to " +
      "base 4; sized = self-sizing on, sizeDatum=1000)")
    Seq(("fixed", 4), ("sized", 20)).foreach { case (tag, maxP) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_embw_$tag").toString + "/state"
      val adm = new EmbeddingAdmission(dir, "embedding", "vec_id",
        threshold = 0.95, planes = 4, tables = 8, dim = dim,
        compactEvery = 4, shards = 16, maxPlanes = maxP)
      val popBatch = 3000
      val (popS, _) = timed {
        (0 until nVecs / popBatch).foreach { b =>
          adm.admit(batchOf(b.toLong * popBatch, popBatch), b.toLong)
            .count()
        }
      }
      val admitS = (0 until 5).map { r =>
        timed(adm.admit(batchOf(10000000L + r * 1000000L, batchVecs),
          100L + r).write.mode("overwrite").parquet(dir + "_out"))._1
      }.sorted
      val widths = spark.read.parquet(dir).select("planes").distinct()
        .collect().map(_.getInt(0)).sorted.mkString(",")
      println(f"[embwidth] arm=$tag%-5s populate_s=$popS%7.1f " +
        f"(over ${nVecs / popBatch} batches) widths_on_disk=[$widths] " +
        f"admit_s_p50=${admitS(2)}%6.2f admit_s_min=${admitS.head}%6.2f " +
        f"admit_s_max=${admitS.last}%6.2f")
    }
  }

  /** The crossover curve: admit p50 vs registry size, both arms. The
    * batch size defaults LARGER than the stream mode's (1024): the
    * width's target is the VERIFY-CANDIDATE term (|batch| × tables ×
    * N/2^planes exact cosines), and at small batches the probe's
    * history READ — paid identically by both arms once K × shardBytes
    * saturates the registry — hides it (the first cut of this curve at
    * 256-vec batches measured exactly that: both arms ≈ 7 s at 1M). */
  private def runCurve(spark: SparkSession,
      batchOf: (Long, Int) => org.apache.spark.sql.DataFrame,
      maxVecs: Int, batchVecs: Int): Unit = {
    val checkpoints = Seq(maxVecs / 8, maxVecs / 4, maxVecs / 2, maxVecs)
    println(s"[embwidth] mode=curve maxVecs=$maxVecs batchVecs=$batchVecs " +
      s"dim=$dim tables=8 checkpoints=${checkpoints.mkString(",")} " +
      "(bootstrap-populated; admit batchIds avoid compaction cycles so " +
      "the timing is the probe, not a fold)")
    val seedBatch = 32768
    Seq(("fixed", 4), ("sized", 20)).foreach { case (tag, maxP) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_embwc_$tag").toString + "/state"
      val adm = new EmbeddingAdmission(dir, "embedding", "vec_id",
        threshold = 0.95, planes = 4, tables = 8, dim = dim,
        compactEvery = 8, shards = 16, maxPlanes = maxP,
        sizeDatum = 1000L)
      var seeded = 0L
      var nextBatch = 0L
      var measureId = 0L
      checkpoints.foreach { target =>
        val (popS, _) = timed {
          while (seeded < target) {
            val n = math.min(seedBatch.toLong, target - seeded).toInt
            adm.bootstrap(batchOf(seeded, n), nextBatch)
            seeded += n; nextBatch += 1
          }
          // converge the layout a long-lived stream would have: one
          // consolidated run, history re-bucketed at the sized width
          // (prior checkpoints' measurement batches fold in too — they
          // use ids from the SAME sequence, so no stale width levels
          // linger to pad the probe)
          adm.compact(spark, uptoBatchId = nextBatch - 1)
        }
        val admitS = (0 until 3).map { r =>
          if (nextBatch % 8 == 0) nextBatch += 1 // never time a fold
          measureId = nextBatch; nextBatch += 1
          timed(adm.admit(
            batchOf(8000000L + measureId * 1000000L, batchVecs), measureId)
            .write.mode("overwrite").parquet(dir + "_out"))._1
        }.sorted
        val widths = spark.read.parquet(dir).select("planes").distinct()
          .collect().map(_.getInt(0)).sorted.mkString(",")
        println(f"[embwidth] arm=$tag%-5s registry=${seeded}%8d " +
          f"pop_s=$popS%7.1f widths=[$widths] " +
          f"admit_s_p50=${admitS(1)}%7.2f admit_s_min=${admitS.head}%7.2f " +
          f"admit_s_max=${admitS.last}%7.2f")
      }
    }
  }
}
