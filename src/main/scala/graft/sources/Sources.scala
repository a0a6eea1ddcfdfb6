package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Review

/** Batch sources (SURVEY §2.1).
  *
  * S1: the reference reads its review CSV headerless with explicit column
  * names, `quotechar='"'`, `sep=','`, `escapechar='\\'`
  * (`stream_generator.py:49-50`; names `stream_generator.py:15-40`).
  * Spark-native: same options on the DataFrameReader with the DECLARED
  * schema — never inferred (schema inference is a second full pass over
  * 100 TB; the declared StructType also drives parquet/CSV pushdown).
  */
object Sources {

  /** S1: headerless review CSV with the reference's quote/escape dialect. */
  def readReviewsCsv(spark: SparkSession, path: String): DataFrame = spark
    .read
    .schema(Review.schema)
    .option("header", "false")
    .option("sep", ",")
    .option("quote", "\"")
    .option("escape", "\\")
    .csv(path)

  /** Generic parquet table scan (the fixture path). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
