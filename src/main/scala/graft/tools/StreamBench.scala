package graft.tools

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Serving
import graft.streaming.{Pipeline, ServingView}

/** Streaming measurements for the flagship chain. Two arms:
  *
  *   - `throughput` (default): rate source → synthetic review JSON (the
  *     Kafka `value` envelope) → [[Pipeline.summarize]] (decode →
  *     normalize → 1-day window agg, update mode) → noop sink. Sustained
  *     rows/s over the steady-state window, wall time taken from the
  *     first/last progress timestamps (NOT Σ batchDuration, which skips
  *     inter-batch idle and overstates the rate).
  *   - `serving`: the same chain lands in the K2 serving tier
  *     ([[ServingView]] foreachBatch merge) while the main thread
  *     continuously runs the reference's dashboard reads
  *     ([[Serving.ranking]] / [[Serving.timeSeries]]) against the live
  *     view. Reports per-batch merge latency and read latency — the
  *     analog of the reference's 5 s visualizer poll
  *     (`visualizer.py:30-44`): its freshness floor is the poll interval;
  *     here a merged batch is queryable as soon as `merge` returns.
  *
  * Context: the reference's replay producer tops out at ≈ 95 records/s BY
  * DESIGN (per-record sleep + flush, `stream_generator.py:10-11`).
  * Usage: runMain graft.tools.StreamBench
  *        [throughput|serving|serving-durable] [rowsPerSec] [secs]
  * (`serving-durable` = the parquet-versioned snapshot mode.)
  */
object StreamBench {

  private def pct(xs: Seq[Double], p: Double): Double =
    if (xs.isEmpty) Double.NaN
    else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.filter(a => !a.forall(_.isDigit))
      .getOrElse("throughput")
    val numeric = args.dropWhile(a => !a.forall(_.isDigit))
    val rps = numeric.headOption.map(_.toInt)
      .getOrElse(if (mode == "serving") 100000 else 500000)
    val seconds = if (numeric.length > 1) numeric(1).toInt else 30
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
    // NOTE app_id must be a JSON NUMBER: Review.schema declares LongType
    // and from_json nulls a quoted value instead of coercing it. (A
    // string-cast here once collapsed every row to app_id=null — 13
    // window-only keys — silently understating the aggregation state.)
    val frames = rate.select(to_json(struct(
      (col("value") % 500).as("app_id"),
      concat(lit("Game "), col("value") % 500).as("app_name"),
      (lit(1600000000L) + col("value") % 1000000L).as("timestamp_created"),
      (col("value") % 6000).cast("double").as("author_playtime_at_review"),
      (when(col("value") % 3 === 0, -1.0).otherwise(1.0)).as("sentiment"),
      (when(col("value") % 2 === 0, "true").otherwise("false"))
        .as("recommended"))).cast("binary").as("value"))

    val summary = Pipeline.summarize(frames)

    if (mode.startsWith("serving"))
      runServing(spark, summary, rps, seconds,
        durable = mode == "serving-durable")
    else runThroughput(summary, rps, seconds)
    spark.stop()
  }

  private def runThroughput(summary: DataFrame, rps: Int,
      seconds: Int): Unit = {
    val q = summary.writeStream.format("noop").outputMode("update").start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    // steady state: drop the first batch (source warmup + codegen)
    val steady = progress.drop(1)
    val rows = steady.map(_.numInputRows).sum
    // wall clock spans trigger-to-trigger INCLUDING inter-batch idle:
    // first steady trigger timestamp → last trigger + its duration
    val secs = if (steady.size < 1) 0.0 else
      (Instant.parse(steady.last.timestamp).toEpochMilli
        + steady.last.batchDuration
        - Instant.parse(steady.head.timestamp).toEpochMilli) / 1000.0
    println(f"[streambench] mode=throughput batches=${steady.size} rows=$rows " +
      f"wall=${secs}%.1f s throughput=${rows / math.max(secs, 1e-9)}%.0f rows/s " +
      f"(requested $rps rows/s for $seconds s)")
  }

  /** `durable = true` runs the SAME chain against the parquet-versioned
    * snapshot mode (ServingView(snapshotDir)) — merge latency then
    * includes the version write + swap + retire, and reads scan the
    * committed parquet files; the delta vs the in-memory arm prices the
    * durability the restart story buys. */
  private def runServing(spark: SparkSession, summary: DataFrame,
      rps: Int, seconds: Int, durable: Boolean = false): Unit = {
    val view = if (durable)
      new ServingView(snapshotDir = Some(java.nio.file.Files
        .createTempDirectory("graft_sb_snap_").toString + "/snap"))
    else new ServingView()
    val mergeMs = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val q = summary.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val t0 = System.nanoTime()
        view.merge(batch, id)
        mergeMs.add((System.nanoTime() - t0) / 1e6)
        ()
      }.start()

    // dashboard read loop against the LIVE view (the reference polls its
    // pandas frame every 5 s; these are the same two query paths)
    val rankMs = scala.collection.mutable.ArrayBuffer[Double]()
    val seriesMs = scala.collection.mutable.ArrayBuffer[Double]()
    val deadline = System.nanoTime() + seconds * 1000000000L
    var viewRows = 0L
    while (System.nanoTime() < deadline) {
      // reads run under the view's read lock — a merge cannot release
      // the snapshot these jobs are scanning (ServingView.read doc)
      view.read { v =>
        var t0 = System.nanoTime()
        Serving.ranking(v, "T_reviews", year = Some(2020)).collect()
        rankMs += (System.nanoTime() - t0) / 1e6
        t0 = System.nanoTime()
        Serving.timeSeries(v, "Game 42", "A_sentiment").collect()
        seriesMs += (System.nanoTime() - t0) / 1e6
        viewRows = v.count()
      }
      Thread.sleep(200L)
    }
    q.stop()
    viewRows = view.read(_.count()).getOrElse(0L)
    val merges = {
      import scala.jdk.CollectionConverters._
      mergeMs.asScala.toSeq
    }
    val modeName = if (durable) "serving-durable" else "serving"
    println(f"[streambench] mode=$modeName batches=${merges.size} " +
      f"view_rows=$viewRows reads=${rankMs.size} " +
      f"merge_ms_p50=${pct(merges, 0.5)}%.0f merge_ms_p95=${pct(merges, 0.95)}%.0f " +
      f"rank_ms_p50=${pct(rankMs.toSeq, 0.5)}%.0f rank_ms_p95=${pct(rankMs.toSeq, 0.95)}%.0f " +
      f"series_ms_p50=${pct(seriesMs.toSeq, 0.5)}%.0f series_ms_p95=${pct(seriesMs.toSeq, 0.95)}%.0f " +
      f"(requested $rps rows/s for $seconds s)")
  }
}
