package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints `explain("formatted")` for selected (or all)
  * registered queries against a fixture dir. Used to keep the physical
  * plans honest — PushedFilters reaching the parquet scan, pruned
  * ReadSchema, broadcast joins where a side is small, WholeStageCodegen
  * spans over the hot path.
  *
  *   sbt "runMain graft.tools.Plans /root/testdata/sf0.001 q_daily_summary ..."
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n================ $name ================")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"ERR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
