package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Demonstrates the embedding sign-sketch SIZING RULE at the 10× bench
  * point (VERDICT r9 #7 follow-through): the registry queries keep the
  * PORTABLE fixed-plane family (planes=4) because the DuckDB oracle
  * embeds those hyperplanes as SQL literals — and the sf1-equivalent
  * bench shows exactly the cost of carrying a fixture-sized sketch to
  * 10× data (bucket occupancy grows linearly, candidate pairs
  * quadratically). The production rule — planes ≈ 4 + log2(n/n₀),
  * stress-proven exact in IncrementalStress's planesK arm — restores
  * ~constant occupancy. This tool times the same duplicate-pair job at
  * both widths on the same vectors so the delta is attributable to
  * sizing alone.
  *
  * Usage: runMain graft.tools.PlanesDemo [sfEquivDir] [planesList]
  */
object PlanesDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf1equiv"
    val planesList = (if (args.length > 1) args(1) else "4,7")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val n = vecs.count()
    planesList.foreach { planes =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val pairs = Dedup.embeddingDupPairs(
          vecs.withColumnRenamed("id", "vec_id"), "embedding", "vec_id",
          threshold = 0.4, planes = planes, tables = 8, dim = 64).count()
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      println(f"[planes] n=$n planes=$planes " +
        f"min=${times.map(_._1).min}%6.2f s pairs=${times.head._2}")
    }
    spark.stop()
  }
}
