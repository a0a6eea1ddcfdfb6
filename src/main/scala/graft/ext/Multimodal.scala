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
  * is real and tested. Dimension decode is REAL for PNG/JPEG containers
  * ([[imageDims]]: pure-JVM header parse, no codec libraries); blobs
  * that are not a recognized image container fall back to a clearly
  * marked DETERMINISTIC STUB (`decodeDims`) so the text-bytes fixture
  * stays oracle-checkable. Full pixel decoding (and audio/video
  * probing) would slot into the same partition-batched body; every plan
  * shape stays identical.
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

  /** ======== STUB (fallback) ========
    * Deterministic fake dimension "decode" from the blob length alone,
    * used when the blob is not a recognized image container (the fixture
    * adapter feeds text bytes) — the formula is pure byte-length
    * arithmetic so the DuckDB oracle can recompute it. Recognized PNG /
    * JPEG blobs take the REAL header parse in [[imageDims]] instead.
    * Audio/video probing would slot in the same way (container headers),
    * but no fixture carries those containers. */
  def decodeDims(nBytes: Long): (Int, Int, Int) = {
    val width = (nBytes % 1024L + 64L).toInt
    val height = (nBytes % 768L + 48L).toInt
    (width, height, 3)
  }

  /** REAL image-dimension decode from container headers — pure JVM, no
    * codec libraries: only the fixed-layout header fields are read, never
    * pixel data, so this is safe to run inline in a partition-batched
    * decode at corpus scale (O(header) per blob, no allocation beyond the
    * result).
    *
    *   - PNG: 8-byte signature, then the IHDR chunk at a fixed offset —
    *     width/height are big-endian u32 at 16/20, channels from the
    *     color type at 25 (gray=1, gray+alpha=2, RGB/palette=3, RGBA=4).
    *   - JPEG: walk the marker segments from SOI to the first SOF0-SOF15
    *     frame header (skipping C4/C8/CC which are not frame markers):
    *     height/width are big-endian u16 at +5/+7 in the SOF payload,
    *     channel count at +9.
    *
    * Returns None for anything else (caller falls back to the
    * deterministic stub so fixture text blobs stay oracle-checkable). */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i))
        && bytes.slice(12, 16).map(_.toChar).mkString == "IHDR") {
      val channels = u8(25) match {
        case 0 => 1 // grayscale
        case 4 => 2 // grayscale + alpha
        case 6 => 4 // RGBA
        case _ => 3 // truecolor (2) / palette (3)
      }
      Some((u32(16).toInt, u32(20).toInt, channels))
    } else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 9 < bytes.length) {
        if (u8(i) != 0xFF) return None // desynced — not a marker stream
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) {
          i += 2 // standalone marker, no length field
        } else if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOF frame header: [len u16][precision u8][height u16][width u16][ncomp u8]
          return Some((u16(i + 7), u16(i + 5), u8(i + 9)))
        } else if (marker == 0xD9 || marker == 0xDA) {
          return None // EOI / start-of-scan without a frame header
        } else {
          i += 2 + u16(i + 2) // skip segment payload
        }
      }
      None
    } else None
  }

  /** A fully decoded 8-bit PNG image: dimensions + raw pixel bytes in
    * row-major (y, x, channel) order, exactly `width*height*channels`
    * bytes. */
  final case class PngImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** REAL pixel decode for 8-bit PNG — pure JVM (`java.util.zip.Inflater`
    * is the zlib the PNG spec mandates; no codec libraries): walk the
    * chunk stream, concatenate IDAT payloads, inflate, and undo the five
    * per-row filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supports
    * color types 0/2/4/6 at bit depth 8 (palette and sub-byte depths
    * return None — header metadata still decodes via [[imageDims]]).
    *
    * Scale shape: pixel decode is a per-row CPU kernel over blob bytes —
    * it belongs inside the same partition-batched `mapPartitions` body as
    * the header parse (no shuffle, no driver involvement), which is
    * exactly where [[decodePixelStats]] runs it. */
  def pngPixels(bytes: Array[Byte]): Option[PngImage] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 33 ||
      !pngSig.indices.forall(i => u8(i) == pngSig(i))) return None
    var w = 0; var h = 0; var channels = 0; var depth = 0
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= bytes.length) {
      val len = u32(i).toInt
      val ctype = bytes.slice(i + 4, i + 8).map(_.toChar).mkString
      if (i + 8 + len > bytes.length) return None // truncated chunk
      ctype match {
        case "IHDR" =>
          w = u32(i + 8).toInt; h = u32(i + 12).toInt
          depth = u8(i + 16)
          channels = u8(i + 17) match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return None // palette / unknown
          }
        case "IDAT" => idat.write(bytes, i + 8, len)
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len // len + type + data + crc
    }
    if (w <= 0 || h <= 0 || depth != 8 || idat.size == 0) return None
    val bpp = channels
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (!inf.finished() && off < raw.length) {
      val n = inf.inflate(raw, off, raw.length - off)
      if (n == 0 && inf.needsInput()) return None // truncated stream
      off += n
    }
    inf.end()
    if (off != raw.length) return None
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (1 + stride)) & 0xFF
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xFF else 0 // left
        val b = if (y > 0) out(rowOut - stride + x) & 0xFF else 0 // up
        val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xFF
          else 0 // up-left
        val recon = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur + pred
          case _ => return None
        }
        out(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(PngImage(w, h, channels, out))
  }

  /** One row of REAL per-blob pixel statistics. */
  final case class PixelStats(media_id: Long, width: Int, height: Int,
      channels: Int, n_px_bytes: Long, px_sum: Long, px_min: Int,
      px_max: Int)

  /** Partition-batched REAL pixel decode → per-blob statistics: the
    * full-decode upgrade of [[decode]] (headers) for PNG blobs. Blobs
    * that are not a decodable 8-bit PNG are dropped (the gate for "is
    * this a real decodable image" at ingest). Same mapPartitions shape —
    * one iterator per partition, no shuffle. */
  def decodePixelStats(spark: SparkSession,
      media: DataFrame): Dataset[PixelStats] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          pngPixels(bytes).map { img =>
            var sum = 0L; var mn = 255; var mx = 0
            img.pixels.foreach { p =>
              val v = p & 0xFF
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            }
            PixelStats(id, img.width, img.height, img.channels,
              img.pixels.length.toLong, sum, mn, mx)
          }
        }
      }
  }

  /** Expression fast-path for METADATA-ONLY decode: the stub's dimension
    * math is pure byte-length arithmetic, so it can run as a codegen'd
    * projection fused into the scan — no Dataset object serialization, no
    * mapPartitions. Bit-identical output schema/values to [[decode]] for
    * blobs without an image container (asserted in MultimodalSpec; real
    * PNG/JPEG blobs take [[imageDims]] in `decode`, which a fused
    * byte-length projection cannot express). Use this when only metadata
    * is needed; use [[decode]] when the bytes must be touched (its
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
        // per-partition setup would open a full codec once, here; the
        // header parse needs none. Real PNG/JPEG blobs get their true
        // dimensions; anything else falls back to the deterministic stub
        // (the oracle fixture path feeds text bytes).
        rows.map { case (id, kind, bytes) =>
          val n = bytes.length.toLong
          val (w, h, c) = imageDims(bytes).getOrElse(decodeDims(n))
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
