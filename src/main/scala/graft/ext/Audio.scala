package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded PCM clip: interleaved samples as signed ints (8-bit unsigned
  * WAV samples are re-centered to signed −128..127 so every depth shares
  * one amplitude convention). */
final case class PcmAudio(sampleRate: Int, channels: Int,
    bitsPerSample: Int, samples: Array[Int])

/** One row of REAL per-blob audio statistics (integer-exact, so a SQL
  * oracle can pin them from fixture math). */
final case class AudioStats(media_id: Long, sample_rate: Int,
    channels: Int, bits_per_sample: Int, n_frames: Long, amp_min: Int,
    amp_max: Int, amp_sum_abs: Long, zero_crossings: Long)

/** REAL audio-column support for training-data pipelines — pure JVM, no
  * codec libraries: WAV/RIFF PCM is a fixed-layout container (the audio
  * twin of the PNG/JPEG work in [[Multimodal]]), so parse + sample
  * decode + feature extraction run as per-partition CPU kernels over
  * `binary` columns with no shuffle and no driver involvement.
  * Compressed codecs (MP3/AAC/Vorbis) genuinely need external libraries;
  * they would slot behind the same [[wavSamples]] dispatch with
  * identical plan shapes.
  *
  * AudioSpec pins both directions against the JDK's independent
  * `javax.sound.sampled` implementation: clips encoded by
  * [[AudioFixtures.buildWav]] decode identically through AudioSystem,
  * and AudioSystem-written WAVE streams decode identically here. PCM is
  * lossless, so unlike the JPEG ±1 IDCT bound these comparisons are
  * bit-exact.
  */
object Audio {

  /** Decoded-sample ceiling per blob (2²⁸ samples = 1 GiB of ints) —
    * the audio twin of [[Multimodal]]'s lying-header pixel cap and
    * [[Archives.MaxGunzip]]: allocation is gated before it happens so
    * OutOfMemoryError (an Error the NonFatal gate cannot catch) is
    * unreachable from crafted headers. */
  val MaxSamples: Int = 1 << 28

  /** Parse a WAV (RIFF/WAVE) byte blob to interleaved PCM samples.
    * Supported: format 1 (integer PCM) at 8 bits (unsigned, re-centered
    * by −128), 16/24/32 bits (signed little-endian), format 3 (IEEE
    * float, 32-bit — samples presented in the 16-bit integer domain,
    * round(f·32767) clamped, the standard float→int reduction), and
    * format 6 (G.711 A-law) and 7 (G.711 μ-law) — 8-bit companded
    * telephony samples expanded to 16-bit linear by the CCITT segment
    * tables (μ-law full scale ±32124, A-law ±32256; pinned against the
    * JDK's independent `javax.sound` codecs in AudioSpec), format 17
    * (IMA/DVI ADPCM — 4-bit block-coded deltas, the dominant compressed
    * WAV layout: per-channel block headers carry the seed
    * predictor/step index, nibbles decode through the 89-entry step
    * table; the JDK has no ADPCM codec, so AudioSpec pins a hand-walked
    * nibble stream instead), and
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of them — the
    * container most tools emit for >2 channels or >16 bits (SubFormat
    * GUID checked against the KSDATAFORMAT tail), any channel count /
    * sample rate; `fmt ` and `data` chunks in any order, unknown chunks
    * (LIST, fact, …) skipped by their declared length, word-aligned as
    * RIFF requires (odd-length chunks carry a pad byte). 64-bit float
    * and truncated data return None. */
  def wavSamples(bytes: Array[Byte]): Option[PcmAudio] =
    try wavSamplesImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None } // never throw on adversarial bytes (see Multimodal.safely)

  private def wavSamplesImpl(bytes: Array[Byte]): Option[PcmAudio] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= bytes.length) bytes.slice(i, i + 4).map(_.toChar).mkString
      else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var isFloat = false
    var law = 0 // 0 none, 6 A-law, 7 μ-law
    var adpcm = false; var blockAlign = 0; var spb = 0
    var data: Option[(Int, Int)] = None // (offset, length)
    // KSDATAFORMAT_SUBTYPE GUID tail shared by the PCM and IEEE-float
    // subformats (…-0000-0010-8000-00AA00389B71); the leading u16 is
    // the wrapped format code.
    val ksTail = Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
      0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
    var i = 12
    while (i + 8 <= bytes.length) {
      val ct = tag(i); val len = u32(i + 4).toInt
      if (len < 0 || i + 8 + len > bytes.length) return None // truncated
      ct match {
        case "fmt " =>
          if (len < 16) return None
          var audioFormat = u16(i + 8)
          channels = u16(i + 10)
          rate = u32(i + 12).toInt
          bits = u16(i + 22)
          if (audioFormat == 0xFFFE) { // WAVE_FORMAT_EXTENSIBLE
            if (len < 40) return None
            // SubFormat GUID at +24 into the chunk body: u16 wrapped
            // format code + the fixed KSDATAFORMAT tail
            if (!ksTail.indices.forall(k => u8(i + 8 + 26 + k) == ksTail(k)))
              return None
            audioFormat = u16(i + 8 + 24)
          }
          isFloat = audioFormat == 3
          law = if (audioFormat == 6 || audioFormat == 7) audioFormat else 0
          adpcm = audioFormat == 17
          blockAlign = u16(i + 20)
          if (adpcm && len >= 20) spb = u16(i + 26) // cbSize=2 extension
          fmtOk = channels > 0 && rate > 0 && (audioFormat match {
            case 1 => Seq(8, 16, 24, 32).contains(bits)
            case 3 => bits == 32
            case 6 | 7 => bits == 8 // G.711 A-law / μ-law
            case 17 => bits == 4 && blockAlign >= 4 * channels &&
              blockAlign % (4 * channels) == 0 &&
              // the canonical block geometry every IMA writer emits
              spb == (blockAlign - 4 * channels) * 2 / channels + 1
            case _ => false
          })
        case "data" => data = Some((i + 8, len))
        case _ => () // LIST / fact / cue … skipped
      }
      i += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    (data, fmtOk) match {
      case (Some((off, len)), true) if adpcm =>
        imaAdpcmSamples(bytes, off, len, rate, channels, blockAlign, spb)
      case (Some((off, len0)), true) =>
        val bytesPer = bits / 8
        // same lying-header clamp + sample cap as the ADPCM arm
        val len = math.max(0, math.min(len0, bytes.length - off))
        val n = len / (bytesPer * channels) * channels // whole frames only
        if (n.toLong > MaxSamples) return None
        val out = new Array[Int](n)
        var s = 0
        while (s < n) {
          val b = off + bytesPer * s
          out(s) =
            if (law == 7) ulaw2linear(u8(b))
            else if (law == 6) alaw2linear(u8(b))
            else if (isFloat) { // 32-bit IEEE float → 16-bit integer domain
              val f = java.lang.Float.intBitsToFloat(u32(b).toInt)
              if (f.isNaN) 0
              else math.max(-32768, math.min(32767, math.round(f * 32767f)))
            } else bits match {
              case 8 => u8(b) - 128
              case 16 => (u16(b) << 16) >> 16 // sign-extend 16-bit LE
              case 24 => (u8(b) | (u8(b + 1) << 8) | (u8(b + 2) << 16)
                ) << 8 >> 8 // sign-extend 24-bit LE
              case _ => u32(b).toInt // full signed 32-bit LE
            }
          s += 1
        }
        Some(PcmAudio(rate, channels, bits, out))
      case _ => None
    }
  }

  // IMA/DVI ADPCM quantizer step table (89 entries) and index
  // adjustment, as published in the IMA Recommended Practices.
  private val imaStep = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19,
    21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97,
    107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337,
    371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
    1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
    10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
    24623, 27086, 29794, 32767)
  private val imaIndexAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode IMA ADPCM `data`-chunk bytes: per block, a 4-byte header
    * per channel (seed predictor int16 LE + step index — the header
    * sample IS frame 0), then nibble data in 4-byte per-channel groups
    * (stereo alternates ch0/ch1 groups), low nibble first. Each nibble
    * updates predictor/index through [[imaStep]]/[[imaIndexAdj]] with
    * the standard additive expansion `step>>3 (+step)(+step>>1)
    * (+step>>2)`, clamped to ±32768/0..88. A trailing partial block is
    * dropped (real writers pad to whole blocks; the `fact` chunk that
    * would trim the tail is presentation-only here). */
  private def imaAdpcmSamples(bytes: Array[Byte], off: Int, len0: Int,
      rate: Int, channels: Int, blockAlign: Int,
      spb: Int): Option[PcmAudio] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    // Defense in depth against lying headers (ADVICE r10): the chunk
    // walk already rejects a data length that overruns the blob, but
    // the allocation below must stay safe even if a future caller
    // skips that walk — clamp to bytes present and cap total decoded
    // samples in Long space (an OOM/NegativeArraySize from Int
    // overflow must be unreachable, not merely caught).
    val len = math.max(0, math.min(len0, bytes.length - off))
    val nBlocks = len / blockAlign
    val total = nBlocks.toLong * spb * channels
    if (total > MaxSamples) return None
    val out = new Array[Int](total.toInt)
    val pred = new Array[Int](channels); val idx = new Array[Int](channels)
    var b = 0
    while (b < nBlocks) {
      val base = off + b * blockAlign
      val outBase = b * spb * channels
      var c = 0
      while (c < channels) {
        val h = base + 4 * c
        pred(c) = ((u8(h) | (u8(h + 1) << 8)) << 16) >> 16
        idx(c) = u8(h + 2)
        if (idx(c) > 88) return None
        out(outBase + c) = pred(c)
        c += 1
      }
      val dataStart = base + 4 * channels
      val groupsPerChan = (blockAlign - 4 * channels) / (4 * channels)
      var g = 0
      var frame = 1
      while (g < groupsPerChan) {
        c = 0
        while (c < channels) {
          val gOff = dataStart + (g * channels + c) * 4
          var k = 0
          while (k < 8) {
            val byt = u8(gOff + k / 2)
            val n = if (k % 2 == 0) byt & 0x0F else byt >> 4
            val step = imaStep(idx(c))
            var diff = step >> 3
            if ((n & 4) != 0) diff += step
            if ((n & 2) != 0) diff += step >> 1
            if ((n & 1) != 0) diff += step >> 2
            val p = if ((n & 8) != 0) pred(c) - diff else pred(c) + diff
            pred(c) = math.max(-32768, math.min(32767, p))
            idx(c) = math.max(0, math.min(88, idx(c) + imaIndexAdj(n & 7)))
            val f = frame + k
            if (f < spb) out(outBase + f * channels + c) = pred(c)
            k += 1
          }
          c += 1
        }
        frame += 8
        g += 1
      }
      b += 1
    }
    Some(PcmAudio(rate, channels, 4, out))
  }

  /** CCITT G.711 μ-law byte → 16-bit linear (full scale ±32124):
    * complement, then expand the 3-bit segment / 4-bit mantissa with
    * the 0x84 bias. */
  private def ulaw2linear(u0: Int): Int = {
    val u = ~u0 & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** CCITT G.711 A-law byte → 16-bit linear (full scale ±32256):
    * un-invert the even bits (0x55), then segment-expand; a SET sign
    * bit means positive in A-law. */
  private def alaw2linear(a0: Int): Int = {
    val a = (a0 ^ 0x55) & 0xFF
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0F) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Partition-batched REAL audio decode → per-blob statistics, the
    * audio twin of [[Multimodal.decodePixelStats]]: blobs that are not
    * decodable PCM WAV are dropped (the ingest gate). All stats are
    * integer-exact over the signed sample values; `zero_crossings`
    * counts strict sign flips between CONSECUTIVE FRAMES PER CHANNEL
    * (summed over channels — interleaving never pairs samples from
    * different channels), zeros breaking a run. */
  def decodeStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavSamples(bytes).map { pcm =>
            var mn = Int.MaxValue; var mx = Int.MinValue
            var sumAbs = 0L; var zc = 0L
            val ch = pcm.channels
            var s = 0
            while (s < pcm.samples.length) {
              val v = pcm.samples(s)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sumAbs += math.abs(v.toLong)
              if (s >= ch) {
                val p = pcm.samples(s - ch) // same channel, previous frame
                if ((p < 0 && v > 0) || (p > 0 && v < 0)) zc += 1
              }
              s += 1
            }
            if (pcm.samples.isEmpty) { mn = 0; mx = 0 }
            AudioStats(id, pcm.sampleRate, ch, pcm.bitsPerSample,
              pcm.samples.length.toLong / ch, mn, mx, sumAbs, zc)
          }
        }
      }
  }

  /** One content-addressed audio row: container-independent identity. */
  final case class AudioContentId(media_id: Long, sample_rate: Int,
      channels: Int, pcm_md5: String)

  /** CONTENT-ADDRESSED audio identity — the audio twin of
    * [[Multimodal.contentFingerprint]]: md5 over the canonical string
    * `"rate,channels:s0,s1,…"` of DECODED samples, so the same PCM
    * content survives container-level variation (an inserted LIST
    * chunk, chunk reordering, trailing padding) that makes file-level
    * hashes diverge. Decode IS the normalization. */
  def contentFingerprint(spark: SparkSession,
      media: DataFrame): Dataset[AudioContentId] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          wavSamples(bytes).map { pcm =>
            md.reset()
            md.update((s"${pcm.sampleRate},${pcm.channels}:" +
              pcm.samples.mkString(",")).getBytes("UTF-8"))
            val hex = md.digest().map(b => f"${b & 0xFF}%02x").mkString
            AudioContentId(id, pcm.sampleRate, pcm.channels, hex)
          }
        }
      }
  }

  /** One resampled-clip row: stats over the rate-normalized samples. */
  final case class ResampledStats(media_id: Long, src_rate: Int,
      dst_rate: Int, channels: Int, n_frames: Long, amp_min: Int,
      amp_max: Int, amp_sum_abs: Long)

  /** Rate-normalize every decodable clip to `dstRate` by integer-exact
    * per-channel linear interpolation — the "everything at 16 kHz"
    * step an audio training pipeline runs before featurization. Frame
    * j samples source position j·src/dst as the exact rational
    * (idx = ⌊j·src/dst⌋, frac = j·src mod dst) and interpolates
    * s0 + ⌊(s1−s0)·frac/dst⌋ (floor semantics, so the oracle's
    * hand-computed rows are bit-determined; an integer decimation
    * factor degenerates to taking every k-th frame exactly).
    * n_out = ⌊(n_in−1)·dst/src⌋+1 keeps every sampled position inside
    * the clip. Per-partition CPU kernel like [[decodeStats]];
    * undecodable blobs drop. */
  def resampleStats(spark: SparkSession, media: DataFrame,
      dstRate: Int): Dataset[ResampledStats] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavSamples(bytes).map { pcm =>
            val ch = pcm.channels
            val nIn = pcm.samples.length / ch
            val nOut =
              if (nIn == 0) 0
              else ((nIn - 1).toLong * dstRate / pcm.sampleRate).toInt + 1
            var mn = Int.MaxValue; var mx = Int.MinValue; var sumAbs = 0L
            var j = 0
            while (j < nOut) {
              val posNum = j.toLong * pcm.sampleRate
              val idx = (posNum / dstRate).toInt
              val frac = posNum % dstRate
              var c = 0
              while (c < ch) {
                val s0 = pcm.samples(idx * ch + c)
                val v =
                  if (frac == 0 || idx + 1 >= nIn) s0
                  else {
                    val s1 = pcm.samples((idx + 1) * ch + c)
                    s0 + Math.floorDiv((s1 - s0).toLong * frac,
                      dstRate.toLong).toInt
                  }
                if (v < mn) mn = v
                if (v > mx) mx = v
                sumAbs += math.abs(v.toLong)
                c += 1
              }
              j += 1
            }
            if (nOut == 0) { mn = 0; mx = 0 }
            ResampledStats(id, pcm.sampleRate, dstRate, ch, nOut.toLong,
              mn, mx, sumAbs)
          }
        }
      }
  }

  /** One silence-trim row: the kept extent and its statistics. */
  final case class TrimmedStats(media_id: Long, n_frames: Long,
      lead_trimmed: Long, trail_trimmed: Long, kept_frames: Long,
      kept_sum_abs: Long)

  /** Strip leading/trailing silence — frames whose per-channel max
    * |amplitude| is ≤ `threshold` — the head/tail gate a speech
    * curation pipeline applies before windowing (interior silence is
    * content and stays). All-silent clips keep zero frames.
    * Integer-exact; undecodable blobs drop. */
  def trimSilenceStats(spark: SparkSession, media: DataFrame,
      threshold: Int): Dataset[TrimmedStats] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavSamples(bytes).map { pcm =>
            val ch = pcm.channels
            val n = pcm.samples.length / ch
            def loud(f: Int): Boolean = {
              var c = 0
              while (c < ch) {
                if (math.abs(pcm.samples(f * ch + c)) > threshold)
                  return true
                c += 1
              }
              false
            }
            var lo = 0
            while (lo < n && !loud(lo)) lo += 1
            var hi = n - 1
            while (hi >= lo && !loud(hi)) hi -= 1
            var sumAbs = 0L
            var f = lo
            while (f <= hi) {
              var c = 0
              while (c < ch) {
                sumAbs += math.abs(pcm.samples(f * ch + c).toLong)
                c += 1
              }
              f += 1
            }
            TrimmedStats(id, n.toLong, lo.toLong, (n - 1 - hi).toLong,
              (hi - lo + 1).toLong.max(0L), sumAbs)
          }
        }
      }
  }

  /** Fixed-length windowed features over a decoded clip — the audio
    * encoder front-end shape (frames of `windowFrames` frames, hop =
    * window, per-window integer energy + peak + zero-crossings). Output
    * rides as one row per (blob, window): the explode-style layout a
    * downstream embedding model consumes. Integer-exact like
    * [[decodeStats]]. */
  def windowFeatures(spark: SparkSession, media: DataFrame,
      windowFrames: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavSamples(bytes).toSeq.flatMap { pcm =>
            val ch = pcm.channels
            val nFrames = pcm.samples.length / ch
            (0 until nFrames / windowFrames).map { w =>
              var sumAbs = 0L; var peak = 0; var zc = 0L
              var f = w * windowFrames
              while (f < (w + 1) * windowFrames) {
                var c = 0
                while (c < ch) {
                  val v = pcm.samples(f * ch + c)
                  val a = math.abs(v)
                  sumAbs += a
                  if (a > peak) peak = a
                  if (f > w * windowFrames) {
                    val p = pcm.samples((f - 1) * ch + c)
                    if ((p < 0 && v > 0) || (p > 0 && v < 0)) zc += 1
                  }
                  c += 1
                }
                f += 1
              }
              (id, w, sumAbs, peak, zc)
            }
          }
        }
      }.toDF("media_id", "window", "sum_abs", "peak", "zero_crossings")
  }
}
