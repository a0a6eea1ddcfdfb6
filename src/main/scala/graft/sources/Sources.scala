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

  /** JSONL ingest with corrupt-record QUARANTINE: at corpus scale some
    * fraction of a crawl/export is always malformed, and the two default
    * behaviors are both wrong (FAILFAST kills a 10-hour job on row
    * 9 billion; silent PERMISSIVE nulls corrupt the dataset invisibly).
    * This reads PERMISSIVE with a `_corrupt_record` capture column and
    * splits the result: `good` (clean rows, capture column dropped) and
    * `bad` (the raw offending lines, for a quarantine sink + reprocessing).
    * The declared schema avoids an inference pass, same as the CSV path. */
  def readJsonlWithQuarantine(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark requires caching/materialization before referencing only the
      // corrupt column (the parser short-circuits otherwise).
      .cache()
    val good = raw.filter(raw("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = raw.filter(raw("_corrupt_record").isNotNull)
      .select(raw("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** ORC table scan (ORC ships inside spark-sql — same pushdown/pruning
    * contract as parquet: predicate pushdown into stripe/row-group skips,
    * column pruning from the declared projection). Offered because mixed
    * lakehouses commonly land Hive-era tables as ORC next to new parquet;
    * the engine reads both through one declared-schema discipline.
    * (Avro is NOT offered: the spark-avro module is a separate artifact,
    * absent from this container's classpath.) */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC write with zlib compression (the ORC-ecosystem default; parquet
    * sinks elsewhere use snappy — see [[graft.ops.Maintenance]]). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

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
  /** Schema-evolving union: appends snapshots whose schemas drifted
    * (columns added or dropped between ingest versions) by NAME, filling
    * absent columns with null — the ingest posture for a long-lived
    * corpus where refusing last month's files on a new optional column
    * is an outage. Positional union would silently transpose data; this
    * is `unionByName(allowMissingColumns)` folded over the snapshots, a
    * zero-shuffle plan (plain Union node). */
  def unionEvolving(snapshots: Seq[DataFrame]): DataFrame = {
    require(snapshots.nonEmpty, "unionEvolving needs at least one snapshot")
    snapshots.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
