package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Dedup

/** Throwaway instrumentation main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val t = 0.1
    val exploded = docs
      .select(col("doc_id").as("id"), Dedup.wordNgrams(col("text"), 3).as("grams"))
      .select(col("id"), size(col("grams")).as("nsz"), explode(col("grams")).as("g"))
      .persist()
    println(s"[scratch] docs=${docs.count()} exploded=${exploded.count()}")
    val dfStats = exploded.groupBy("g").count()
    println("[scratch] df quantiles: " +
      dfStats.stat.approxQuantile("count", Array(0.5, 0.9, 0.99, 1.0), 0.001).mkString(","))
    println(s"[scratch] distinct grams=${dfStats.count()}")
    // old-style full join volume = sum df^2 (capped at 1000)
    val sumDf2 = dfStats.filter(col("count") <= 1000)
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    println(s"[scratch] full-join volume (sum df^2, df<=1000) = $sumDf2")
    val ranked = exploded
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("g"))))
    val prefix = ranked
      .filter(col("pos") <= col("nsz") - ceil(col("nsz") * lit(t) - lit(1e-9)) + 1)
      .filter(col("df") <= 1000)
      .select("g", "id", "nsz").persist()
    println(s"[scratch] prefix rows=${prefix.count()}")
    val prefDf2 = prefix.groupBy("g").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    println(s"[scratch] prefix-join volume (sum pdf^2) = $prefDf2")
    val cands = prefix.select(col("g"), col("id").as("id_a"), col("nsz").as("na"))
      .join(prefix.select(col("g"), col("id").as("id_b"), col("nsz").as("nb")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")) >= greatest(col("na"), col("nb")) * lit(t) - lit(1e-9))
      .select("id_a", "id_b").distinct()
    println(s"[scratch] distinct candidates=${cands.count()}")
    spark.stop()
  }
}
