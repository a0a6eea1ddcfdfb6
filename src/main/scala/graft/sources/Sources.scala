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

  /** S3: batch replay of a Kafka topic (the serving tier's consumer loop,
    * `visualizer.py:49-56`, as a bounded read — e.g. to rebuild the
    * serving view from the summary topic's full retention). Requires the
    * spark-sql-kafka connector on the classpath. */
  def readKafkaBatch(spark: SparkSession, bootstrapServers: String,
      topic: String): DataFrame = spark
    .read.format("kafka")
    .option("kafka.bootstrap.servers", bootstrapServers)
    .option("subscribe", topic)
    .option("startingOffsets", "earliest")
    .option("endingOffsets", "latest")
    .load()
}
