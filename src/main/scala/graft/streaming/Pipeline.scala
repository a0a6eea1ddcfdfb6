package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.codec.JsonCodec
import graft.model.Review
import graft.ops.{Summarize, Transforms}

/** Kafka endpoint configuration (reference topology, SURVEY §2.10:
  * `kafka_server_setup.sh:8-10` — topics `reviews-stream` /
  * `summary-results`). */
final case class KafkaEndpoint(bootstrapServers: String, topic: String)

/** The reference's flagship streaming job, Spark-native.
  *
  * Reproduces `summarizer.py` end to end: Kafka source with the exact
  * reference options (S2, `summarizer.py:52-59`) → JSON decode (P1/P2) →
  * normalization (F3–F7) → 1-day tumbling event-time aggregation (A1/A2)
  * → update-mode Kafka sink with checkpointing (K1, `summarizer.py:103-111`).
  *
  * Every transform stage is a pure `DataFrame => DataFrame`, so the same
  * code runs in batch (DuckDB-oracle parity, unit tests over
  * `MemoryStream`) and streaming — only the source/sink differ.
  *
  * Scale design (100 TB / 1000-executor view):
  *   - The aggregation plans to partial+final `HashAggregateExec` around a
  *     single hash Exchange on (window, app_id, app_name); map-side combine
  *     bounds shuffle volume by |active groups| per trigger, not |rows|.
  *   - State is keyed by the same tuple in the per-partition `StateStore`;
  *     Kafka source parallelism = topic partitions (the reference runs 1
  *     partition — a deliberate non-goal to copy; this code takes whatever
  *     the topic provides).
  *   - `watermark = None` reproduces the reference exactly (no
  *     `withWatermark` anywhere in `summarizer.py` — unbounded state, late
  *     rows accepted forever). At scale pass e.g. `Some("2 days")` to bound
  *     state; for very large state use
  *     `spark.sql.streaming.stateStore.providerClass` = RocksDB.
  */
object Pipeline {

  /** S2: the reference's Kafka source, option-for-option
    * (`summarizer.py:52-59`). */
  def readReviews(spark: SparkSession, in: KafkaEndpoint): DataFrame = spark
    .readStream.format("kafka")
    .option("kafka.bootstrap.servers", in.bootstrapServers)
    .option("subscribe", in.topic)
    .option("startingOffsets", "earliest")
    .option("failOnDataLoss", "false")
    .load()

  /** The full transform chain, source-agnostic: Kafka-frame rows in
    * (`value` column), daily summary rows out. `watermark` is the optional
    * late-data bound (None = reference-faithful unbounded state). */
  def summarize(frames: DataFrame, watermark: Option[String] = None): DataFrame = {
    val parsed = JsonCodec.decode(frames, Review.schema)
    val normalized = Transforms.normalize(parsed)
    val bounded = watermark.fold(normalized)(
      normalized.withWatermark("timestamp_created", _))
    Summarize.dailySummary(bounded)
  }

  /** K1: update-mode Kafka sink, key = app_id string, value = JSON of all
    * columns, checkpointed (`summarizer.py:103-111`). */
  def writeSummary(summary: DataFrame, out: KafkaEndpoint,
      checkpointLocation: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    JsonCodec.encode(summary, col("app_id"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", out.bootstrapServers)
      .option("topic", out.topic)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("update")
      .trigger(trigger)
      .start()

  /** Serving-tier ingest (K2 streaming arm): merge each micro-batch of
    * summary updates into the keyed serving view. Mirrors the reference's
    * consumer thread + pandas upsert (`visualizer.py:49-82`). */
  def maintainView(summary: DataFrame, view: ServingView): DataStreamWriter[Row] =
    summary.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        view.merge(batch, batchId)
      }

  /** End-to-end wiring: source → summarize → Kafka sink (the whole
    * `summarizer.py` as one call). */
  def run(spark: SparkSession, in: KafkaEndpoint, out: KafkaEndpoint,
      checkpointLocation: String, watermark: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    writeSummary(summarize(readReviews(spark, in), watermark), out,
      checkpointLocation, trigger)
}
