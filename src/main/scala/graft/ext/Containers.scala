package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed METADATA for compressed A/V containers the engine does not
  * sample-decode (MP3, MP4 — full decode genuinely needs external codec
  * libraries, SURVEY §9): duration, rates, dimensions and track layout
  * come from a pure header/box walk over the blob bytes, which is what
  * a curation pipeline needs for budgeting, filtering, and dataset
  * cards even when the samples stay opaque. Same scale shape as
  * [[Multimodal.imageDims]]: a per-partition CPU kernel over `binary`
  * columns — no shuffle, no driver involvement, never throws on
  * adversarial bytes (fuzzed in ContainersSpec under the
  * [[Multimodal.pngPixels]] hardening contract).
  */
object Containers {

  /** Parsed MPEG audio (MP3) stream metadata: the frame-header walk
    * counts REAL frames (sync + valid tables + declared size stepping),
    * so `n_frames`/`duration_ms` are content-derived, not guessed from
    * file size. `bitrate_kbps` is the mean over frames (VBR-correct). */
  final case class Mp3Meta(version: String, layer: Int,
      sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Long, bitrate_kbps: Int, has_id3v2: Boolean)

  /** Parsed ISO BMFF (MP4/M4A/MOV) metadata from the box tree: movie
    * duration from `mvhd`, visual dimensions from the first video
    * track's `tkhd` (16.16 fixed point), track roles from `hdlr`. */
  final case class Mp4Meta(major_brand: String, duration_ms: Long,
      n_tracks: Int, width: Int, height: Int, has_video: Boolean,
      has_audio: Boolean)

  // MPEG audio frame tables (ISO 11172-3 / 13818-3), Layer III column.
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  private val RateV1 = Array(44100, 48000, 32000)

  def mp3Meta(bytes: Array[Byte]): Option[Mp3Meta] =
    try mp3MetaImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def mp3MetaImpl(bytes: Array[Byte]): Option[Mp3Meta] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    if (bytes.length < 4) return None
    var i = 0
    var hasId3 = false
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      // ID3v2: 4-byte syncsafe size after the 10-byte header
      val sz = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
      i = 10 + sz
      hasId3 = true
    }
    // stop before a trailing ID3v1 tag if present
    val end =
      if (bytes.length >= 128 && bytes(bytes.length - 128) == 'T' &&
        bytes(bytes.length - 127) == 'A' && bytes(bytes.length - 126) == 'G')
        bytes.length - 128
      else bytes.length
    var version = ""; var rate = 0; var channels = 0
    var nFrames = 0L; var kbpsSum = 0L; var spf = 0
    while (i + 4 <= end) {
      if (u8(i) != 0xFF || (u8(i + 1) & 0xE0) != 0xE0) {
        // resync only before the first frame; garbage after real
        // frames ends the stream walk
        if (nFrames > 0) return finishMp3(version, rate, channels,
          nFrames, kbpsSum, spf, hasId3)
        i += 1
      } else {
        val verBits = (u8(i + 1) >> 3) & 3   // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (u8(i + 1) >> 1) & 3 // 1=Layer III
        val brIdx = (u8(i + 2) >> 4) & 15
        val srIdx = (u8(i + 2) >> 2) & 3
        val padding = (u8(i + 2) >> 1) & 1
        val chMode = (u8(i + 3) >> 6) & 3
        val valid = layerBits == 1 && verBits != 1 && brIdx != 0 &&
          brIdx != 15 && srIdx != 3
        if (!valid) {
          if (nFrames > 0) return finishMp3(version, rate, channels,
            nFrames, kbpsSum, spf, hasId3)
          i += 1
        } else {
          val v1 = verBits == 3
          val kbps = (if (v1) BitrateV1L3 else BitrateV2L3)(brIdx)
          val sr = RateV1(srIdx) / (verBits match {
            case 3 => 1; case 2 => 2; case _ => 4 })
          val frameSpf = if (v1) 1152 else 576
          val frameLen = frameSpf / 8 * kbps * 1000 / sr + padding
          if (frameLen < 4 || i + frameLen > end) {
            if (nFrames > 0) return finishMp3(version, rate, channels,
              nFrames, kbpsSum, spf, hasId3)
            i += 1
          } else {
            if (nFrames == 0) {
              version = verBits match {
                case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5" }
              rate = sr; spf = frameSpf
              channels = if (chMode == 3) 1 else 2
            } else if (sr != rate) {
              // rate change mid-stream: treat as end of the stream
              return finishMp3(version, rate, channels, nFrames,
                kbpsSum, spf, hasId3)
            }
            nFrames += 1; kbpsSum += kbps
            i += frameLen
          }
        }
      }
    }
    finishMp3(version, rate, channels, nFrames, kbpsSum, spf, hasId3)
  }

  private def finishMp3(version: String, rate: Int, channels: Int,
      nFrames: Long, kbpsSum: Long, spf: Int,
      hasId3: Boolean): Option[Mp3Meta] =
    // ≥2 stepping frames: a lone sync-looking word in random bytes
    // must not classify the blob as MP3
    if (nFrames < 2) None
    else Some(Mp3Meta(version, 3, rate, channels, nFrames,
      nFrames * spf * 1000L / rate, (kbpsSum / nFrames).toInt, hasId3))

  def mp4Meta(bytes: Array[Byte]): Option[Mp4Meta] =
    try mp4MetaImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def mp4MetaImpl(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= bytes.length)
        new String(bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    // walk one box level [from, to); calls f(type, bodyFrom, bodyTo)
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val sz32 = u32(i)
        val t = tag(i + 4)
        val (body, endB) =
          if (sz32 == 1L) {
            if (i + 16 > to) return false
            val sz = u64(i + 8)
            if (sz < 16 || i + sz > to) return false
            (i + 16, i + sz.toInt)
          } else if (sz32 == 0L) (i + 8, to) // box runs to end of scope
          else {
            if (sz32 < 8 || i + sz32 > to) return false
            (i + 8, i + sz32.toInt)
          }
        f(t, body, endB)
        i = endB
      }
      i == to || from == to
    }
    if (bytes.length < 12 || tag(4) != "ftyp") return None
    var brand = ""; var durationMs = -1L; var nTracks = 0
    var width = 0; var height = 0
    var hasVideo = false; var hasAudio = false
    val topOk = walk(0, bytes.length) { (t, b, e) =>
      t match {
        case "ftyp" => if (e - b >= 4) brand = tag(b)
        case "moov" =>
          walk(b, e) { (t2, b2, e2) =>
            t2 match {
              case "mvhd" =>
                val ver = u8(b2)
                if (ver == 0 && e2 - b2 >= 20) {
                  val ts = u32(b2 + 12); val dur = u32(b2 + 16)
                  if (ts > 0) durationMs = dur * 1000L / ts
                } else if (ver == 1 && e2 - b2 >= 32) {
                  val ts = u32(b2 + 20); val dur = u64(b2 + 24)
                  if (ts > 0) durationMs = dur * 1000L / ts
                }
              case "trak" =>
                nTracks += 1
                var tw = 0; var th = 0; var handler = ""
                walk(b2, e2) { (t3, b3, e3) =>
                  t3 match {
                    case "tkhd" =>
                      // v0 fixed fields end at body+40 (v1's 64-bit
                      // times add 12); width/height are 16.16 fixed
                      // point after the 36-byte matrix — the integer
                      // part is the leading u16 of each
                      val off = if (u8(b3) == 1) 52 else 40
                      if (e3 - b3 >= off + 44) {
                        tw = u16(b3 + off + 36)
                        th = u16(b3 + off + 40)
                      }
                    case "mdia" =>
                      walk(b3, e3) { (t4, b4, e4) =>
                        if (t4 == "hdlr" && e4 - b4 >= 12)
                          handler = tag(b4 + 8)
                      }
                    case _ => ()
                  }
                }
                if (handler == "vide") {
                  hasVideo = true
                  if (width == 0) { width = tw; height = th }
                } else if (handler == "soun") hasAudio = true
              case _ => ()
            }
          }
        case _ => () // mdat / free / uuid … skipped by size
      }
    }
    if (!topOk || brand.isEmpty || durationMs < 0) None
    else Some(Mp4Meta(brand, durationMs, nTracks, width, height,
      hasVideo, hasAudio))
  }

  /** One dispatched container-metadata row (the A/V twin of
    * [[Multimodal.imageDims]]'s kind dispatch). */
  final case class AvMeta(media_id: Long, kind: String,
      duration_ms: Long, sample_rate: Int, n_frames: Long, width: Int,
      height: Int, n_tracks: Int, has_video: Boolean, has_audio: Boolean)

  /** Partition-batched container-metadata extraction over
    * (media_id, content) blobs: MP3 frame walk, MP4 box walk, WAV
    * header (duration from the REAL decoded sample count — the one
    * format the engine fully decodes). Undecodable blobs are dropped
    * (the metadata ingest gate). */
  def avMeta(spark: SparkSession, media: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          mp3Meta(bytes).map(m => AvMeta(id, "mp3", m.duration_ms,
              m.sample_rate, m.n_frames, 0, 0, 1, has_video = false,
              has_audio = true))
            .orElse(mp4Meta(bytes).map(m => AvMeta(id, "mp4",
              m.duration_ms, 0, 0L, m.width, m.height, m.n_tracks,
              m.has_video, m.has_audio)))
            .orElse(Audio.wavSamples(bytes).map(p => AvMeta(id, "wav",
              p.samples.length / p.channels * 1000L / p.sampleRate,
              p.sampleRate, p.samples.length.toLong / p.channels, 0, 0,
              1, has_video = false, has_audio = true)))
        }
      }
  }
}
