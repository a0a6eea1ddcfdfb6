package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed at
  * SPARK_GRAFT_SF_DIR (default sf0.1), one JSON line out.
  *
  * Hygiene: a warmup action first (JIT + codegen + parquet footer cache),
  * and `clearCache()` between queries — several operators persist()
  * intermediate tables (LSH buckets, signature tables); letting those
  * accumulate across 25 queries in one 8 GiB JVM turns later queries into
  * GC/eviction benchmarks instead of query benchmarks (observed 60×
  * inflation on the last-run query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "events").count() // warmup
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
