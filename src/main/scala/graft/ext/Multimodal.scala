package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded-media record produced by the (stubbed) decoder. */
final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, channels: Int)

/** A sampled video frame reference. */
final case class FrameRef(media_id: Long, frame_index: Long, ts_sec: Double)

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension): image/audio/video ride as opaque `binary` columns with
  * typed metadata; decode / feature-extract / resize / frame-sample are
  * partition-wise batch transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batched per-partition
  * processing (the JVM analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup), explode-based frame sampling —
  * is real and tested. The actual byte decoding is a clearly marked
  * DETERMINISTIC STUB (`decodeDims`): the image/audio codecs are not in
  * this container. Swapping in a real codec changes only the function
  * body; every plan shape stays identical.
  *
  * Scale notes: binary payloads dominate row size, so these tables want
  * `spark.sql.files.maxPartitionBytes` sized for ~100-row partitions and
  * the metadata projected into a separate (or columnar-pruned) scan;
  * all transforms here are narrow (no shuffle).
  */
object Multimodal {

  /** Fixture adapter: treat document text bytes as an opaque media blob so
    * the binary-column plumbing runs against real fixture data. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs
    .select(col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("content"))

  /** ======== STUB ========
    * Deterministic fake dimension "decode" from the blob alone: real
    * decoders (JPEG/PNG headers, ffprobe) are not available in this
    * container. Formula uses only byte length so the DuckDB oracle can
    * recompute it. Replace body with a real codec in production. */
  def decodeDims(nBytes: Long): (Int, Int, Int) = {
    val width = (nBytes % 1024L + 64L).toInt
    val height = (nBytes % 768L + 48L).toInt
    (width, height, 3)
  }

  /** Expression fast-path for METADATA-ONLY decode: the stub's dimension
    * math is pure byte-length arithmetic, so it can run as a codegen'd
    * projection fused into the scan — no Dataset object serialization, no
    * mapPartitions. Bit-identical output schema/values to [[decode]]
    * (asserted in MultimodalSpec). Use this when only metadata is needed;
    * use [[decode]] when a real codec must touch the bytes (its
    * partition-batched shape is the codec-amortization point). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val n = length(col("content")).cast("long")
    media.select(
      col("media_id"), col("kind"),
      n.as("n_bytes"),
      (n % 1024L + 64L).cast("int").as("width"),
      (n % 768L + 48L).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** Partition-wise batched "decode": binary blobs → typed metadata rows.
    * `mapPartitions` processes each partition's iterator in one pass —
    * per-partition (not per-row) setup cost, the JVM twin of a pandas-UDF
    * batch. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would open the codec once, here — the stub
        // has none, but the batch shape is the point.
        rows.map { case (id, kind, bytes) =>
          val n = bytes.length.toLong
          val (w, h, c) = decodeDims(n)
          MediaMeta(id, kind, n, w, h, c)
        }
      }
  }

  /** Resize planning: pure metadata transform (target box, aspect
    * preserved, integer floor) — runs as a fused projection. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"),
      lit(1.0))
    meta
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video-ish media: every `stride`-th frame of a
    * `durationSec × fps` clip → one row per sampled frame
    * (`explode(sequence(...))` — a narrow generate, no shuffle). */
  def sampleFrames(meta: DataFrame, fps: Int, stride: Int): DataFrame = meta
    .withColumn("n_frames", (col("duration_sec") * fps).cast("long"))
    .withColumn("frame_index",
      explode(sequence(lit(0L), greatest(col("n_frames") - 1, lit(0L)),
        lit(stride.toLong))))
    .withColumn("ts_sec", col("frame_index") / lit(fps.toDouble))

  /** Feature-fold modulus: a prime below 2^31 keeps `acc * 31 + byte`
    * inside exact signed-64 range, so the SAME fold is computable in any
    * engine with plain BIGINT arithmetic (wrapping 2^64 arithmetic — the
    * previous form — is NOT: strict engines raise on overflow). */
  val FeatureMod = 1000000007L

  /** Deterministic fake feature vector (STUB for an image/audio encoder):
    * `dim` doubles derived from the blob bytes by a position-salted
    * modular byte-fold — exercises the real plumbing (binary in,
    * fixed-width vector out, partition-batched). The fold is pure integer
    * arithmetic over unsigned byte values mod [[FeatureMod]], so the
    * DuckDB oracle reproduces it bit-for-bit (hex-expand the blob,
    * list_reduce the same recurrence). */
  def featureExtract(spark: SparkSession, media: DataFrame,
      dim: Int = 8): DataFrame = {
    import spark.implicits._
    val feats = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val vec = Array.tabulate(dim) { d =>
            // cheap deterministic byte-fold; a real encoder goes here
            var acc = (1125899906842597L + d) % FeatureMod
            var i = 0
            while (i < bytes.length) {
              acc = (acc * 31L + (bytes(i) & 0xFF)) % FeatureMod
              i += 1
            }
            (acc % 1000L).toDouble / 1000.0
          }
          (id, vec)
        }
      }.toDF("media_id", "features")
    feats
  }
}
