package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
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
    val fps = Dedup.simhashFingerprints(docs, "text", "doc_id")
    fps.collect()
    val qe = fps.queryExecution
    // full executed-plan tree string includes materialized query stages
    println(qe.executedPlan.toString.linesIterator
      .map(l => "[scratch] " + l.replaceAll("\\(.*", "")).take(40).mkString("\n"))
    spark.stop()
  }
}
