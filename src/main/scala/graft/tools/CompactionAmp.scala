package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.streaming.AdmissionRegistry

/** Compaction WRITE AMPLIFICATION curve (VERDICT r13 #2): §15.9's
  * "geometric folds rewrite each row O(log lifetime) times ever" was
  * argued from the policy and spec-armed on layout, but never measured
  * as a curve. This harness streams `nBatches` equal micro-batch
  * appends through two registries that differ ONLY in fold policy —
  *
  *   geometric: the production [[AdmissionRegistry.maybeCompact]]
  *     (LSM size-tiered: fold a suffix of runs only when the newer mass
  *     has caught up to the older run),
  *   fold-everything: [[AdmissionRegistry.compact]] on the same
  *     schedule (the rejected r13-initial design: every cycle folds ALL
  *     committed runs into one),
  *
  * and reports, at checkpoints, cumulative bytes WRITTEN BY COMPACTION
  * per byte ingested (appends excluded from the numerator — both arms
  * pay them identically; the quantity at stake is the REWRITE tax).
  * Expected shape: fold-everything's written/ingested grows ~linearly
  * with lifetime (each cycle rewrites the whole registry, so the tax at
  * batch N is Σ registry sizes ≈ N/2 × cycle mass), while geometric's
  * flattens to O(log N) — per-trigger compaction cost independent of
  * corpus lifetime, the write-side twin of the pruned probe's plateau.
  *
  * Bytes written are measured from the filesystem itself: a fold's cost
  * is the content size of directories that are new or changed across
  * the compaction call (the rename-aside swap means the target's bytes
  * were physically written into .compact_tmp — same count).
  *
  * Usage: runMain graft.tools.CompactionAmp [nBatches] [every] [rowsPerBatch]
  *   (defaults 192 / 8 / 2000 — 24 fold cycles, NearDup-shaped rows)
  */
object CompactionAmp {

  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 192
    val every = if (args.length > 1) args(1).toInt else 8
    val rowsPerBatch = if (args.length > 2) args(2).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[compamp] nBatches=$nBatches every=$every " +
      s"rowsPerBatch=$rowsPerBatch (written/ingested counts COMPACTION " +
      "bytes only; law: geometric ~ O(log N), fold-everything ~ O(N))")

    val schema = StructType(Seq(
      StructField("band", IntegerType), StructField("bucket", LongType)))

    def dirSizes(root: String): Map[String, Long] = {
      val d = new java.io.File(root)
      if (!d.exists()) Map.empty
      else d.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("batch=")).map { f =>
        def size(x: java.io.File): Long =
          if (x.isFile) x.length()
          else Option(x.listFiles()).getOrElse(Array.empty).map(size).sum
        f.getName -> size(f)
      }.toMap
    }

    Seq("geometric", "fold_everything").foreach { arm =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_compamp_$arm").toString + "/reg"
      val reg = new AdmissionRegistry(dir, schema, Seq("band", "bucket"),
        shards = 8, targetShardBytes = 256L << 10)
      var ingested = 0L
      var written = 0L
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        // compaction runs at the START of a trigger, as in production
        val before = dirSizes(dir)
        if (arm == "geometric") reg.maybeCompact(spark, b.toLong, every)
        else if (every > 0 && b > 0 && b % every == 0)
          reg.compact(spark, uptoBatchId = b - 1L)
        val after = dirSizes(dir)
        written += after.collect {
          case (name, sz) if before.get(name).forall(_ != sz) => sz
        }.sum
        reg.append(spark.range(rowsPerBatch)
          .select((col("id") % 8).cast("int").as("band"),
            xxhash64(col("id") + b.toLong * rowsPerBatch, lit("amp"))
              .as("bucket")), b.toLong)
        ingested += dirSizes(dir).getOrElse(s"batch=$b", 0L)
        if ((b + 1) % (every * 4) == 0 || b == nBatches - 1) {
          val live = dirSizes(dir).size
          println(f"[compamp] arm=$arm%-15s batch=${b + 1}%4d " +
            f"ingested_mb=${ingested / 1e6}%7.2f " +
            f"compact_written_mb=${written / 1e6}%8.2f " +
            f"ratio=${written.toDouble / math.max(ingested, 1)}%6.2f " +
            f"live_dirs=$live%3d " +
            f"elapsed_s=${(System.nanoTime() - t0) / 1e9}%6.1f")
        }
      }
    }
    spark.stop()
  }
}
