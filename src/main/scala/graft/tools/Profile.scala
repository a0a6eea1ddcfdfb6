package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Ad-hoc single-query profiler: time one registered query N times in
  * isolation (the bench host is a noisy shared VM — a query's cost is the
  * MIN across repeats, not any single sample). Usage:
  *   runMain graft.tools.Profile <queryName> [sfDir] [repeats] [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "documents").count() // warmup
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.ops.Caches.releaseAll() // checkpoint storage (outside cache mgr)
      println(f"[profile] $name run $i: rows=$n time=$dt%.2f s")
    }
    spark.stop()
  }
}
