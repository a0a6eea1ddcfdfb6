package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Audio, Multimodal}

/** One probed media row: which decoder accepted the blob + its typed
  * metadata (image fields zero for audio and vice versa). */
final case class MediaProbe(media_id: Long, kind: String, width: Int,
    height: Int, channels: Int, n_frames: Long, sample_rate: Int)

/** Ingest-time DECODABILITY gate for multimodal columns — the streaming
  * twin of the batch gates in [[graft.ext.Multimodal.decodePixelStats]]
  * / [[graft.ext.Audio.decodeStats]]: a blob is admitted iff one of the
  * REAL decoders (8-bit PNG, baseline JPEG, GIF, PCM WAV) fully accepts
  * it, and the admitted row carries the decoder-verified metadata.
  * Truncated scans, desynced marker streams and junk bytes are dropped
  * at the door instead of poisoning downstream feature extraction.
  *
  * Unlike [[NearDupAdmission]]/[[SpanAdmission]] this gate is STATELESS
  * (decodability is a per-row property — no history, no registry, no
  * replay concern), so it is a plain narrow `mapPartitions` transform
  * that runs identically on a batch frame and on a streaming frame
  * (MediaGateSpec asserts both paths row-for-row). At 100 TB the kernel
  * cost rides the ingest scan; nothing shuffles. */
object MediaGate {

  /** Probe one blob with every real decoder; cheapest-first container
    * sniffing is already inside each decoder's signature check. */
  def probe(id: Long, bytes: Array[Byte]): Option[MediaProbe] =
    Multimodal.pngPixels(bytes)
      .map(p => MediaProbe(id, "png", p.width, p.height, p.channels, 1L, 0))
      .orElse(Multimodal.jpegPixels(bytes)
        .map(j => MediaProbe(id, "jpeg", j.width, j.height, j.channels,
          1L, 0)))
      .orElse(Multimodal.gifFrames(bytes).filter(_.nonEmpty)
        .map { fs =>
          val f = fs.head
          MediaProbe(id, "gif", f.width, f.height, 3, fs.length.toLong, 0)
        })
      .orElse(Multimodal.bmpPixels(bytes)
        .map(b => MediaProbe(id, "bmp", b.width, b.height, b.channels,
          1L, 0)))
      .orElse(Audio.wavSamples(bytes)
        .map(a => MediaProbe(id, "wav", 0, 0, a.channels,
          a.samples.length.toLong / a.channels, a.sampleRate)))

  /** Gate a (media_id, content) frame — batch OR streaming — to the
    * decodable rows with verified metadata. */
  def gate(spark: SparkSession, media: DataFrame): Dataset[MediaProbe] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => probe(id, bytes) })
  }
}
