package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Pipeline

/** Streaming-throughput measurement for the flagship summarization chain:
  * rate source → synthetic review JSON (the Kafka `value` envelope) →
  * [[Pipeline.summarize]] (decode → normalize → 1-day window agg, update
  * mode) → noop sink. Reports sustained rows/s from the query's own
  * progress records (input rows ÷ wall time over the steady-state
  * window).
  *
  * Context: the reference's replay producer tops out at ≈ 95 records/s BY
  * DESIGN (per-record sleep + flush, `stream_generator.py:10-11`); this
  * measures what the same pipeline shape sustains when the source isn't
  * throttled. Usage: runMain graft.tools.StreamBench [rowsPerSec] [secs]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rps = args.headOption.map(_.toInt).getOrElse(500000)
    val seconds = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rps)
      .option("numPartitions", cpus.toInt)
      .load()
    // Synthetic review JSON in the Kafka value envelope: 500 games,
    // event times spread over ~12 days so the window state is non-trivial.
    val frames = rate.select(to_json(struct(
      (col("value") % 500).cast("string").as("app_id"),
      concat(lit("Game "), col("value") % 500).as("app_name"),
      (lit(1600000000L) + col("value") % 1000000L).as("timestamp_created"),
      (col("value") % 6000).cast("double").as("author_playtime_at_review"),
      (when(col("value") % 3 === 0, -1.0).otherwise(1.0)).as("sentiment"),
      (when(col("value") % 2 === 0, "true").otherwise("false"))
        .as("recommended"))).cast("binary").as("value"))

    val q = Pipeline.summarize(frames)
      .writeStream.format("noop").outputMode("update").start()

    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    // steady state: drop the first batch (source warmup + codegen)
    val steady = progress.drop(1)
    val rows = steady.map(_.numInputRows).sum
    val secs = steady.map(_.batchDuration).sum / 1000.0
    println(f"[streambench] batches=${steady.size} rows=$rows " +
      f"wall=${secs}%.1f s throughput=${rows / math.max(secs, 1e-9)}%.0f rows/s " +
      f"(requested $rps rows/s for $seconds s)")
    spark.stop()
  }
}
