package graft.ext

/** Genuine WAV byte fixtures for the REAL PCM parser ([[Audio.wavSamples]])
  * — the audio twin of [[MediaFixtures]]: every structural byte (RIFF
  * framing, fmt chunk, sample packing) derived in plain code, and the
  * expected statistics in q_multimodal_audio's oracle are hand-computed
  * from the sample lists below.
  */
object AudioFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Build a REAL, spec-valid PCM WAV from explicit interleaved signed
    * samples (−128..127 for 8-bit — stored unsigned per the WAV spec —
    * signed little-endian for 16/24/32-bit). `extensible` wraps the
    * format in a WAVE_FORMAT_EXTENSIBLE fmt chunk (format 0xFFFE +
    * 22-byte extension with the KSDATAFORMAT_SUBTYPE_PCM GUID and a
    * speaker mask) — the container most tools emit for >16 bits. */
  def buildWav(rate: Int, channels: Int, bits: Int,
      samples: Seq[Int], extensible: Boolean = false): Array[Byte] = {
    require(Seq(8, 16, 24, 32).contains(bits), "PCM 8/16/24/32-bit")
    require(samples.length % channels == 0, "partial frame")
    val bytesPer = bits / 8
    val data: Array[Byte] = bits match {
      case 8 => samples.map(v => ((v + 128) & 0xFF).toByte).toArray
      case 16 => samples.flatMap(v => le16(v & 0xFFFF)).toArray
      case 24 => samples.flatMap(v => Seq((v & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte)).toArray
      case _ => samples.flatMap(v => le32(v)).toArray
    }
    wrapWav(rate, channels, bits, formatCode = 1, extensible, data)
  }

  /** Build a 32-bit IEEE-float WAV (format 3, or extensible wrapping
    * float) from explicit per-sample floats. */
  def buildWavFloat(rate: Int, channels: Int, samples: Seq[Float],
      extensible: Boolean = false): Array[Byte] = {
    require(samples.length % channels == 0, "partial frame")
    val data: Array[Byte] = samples.flatMap(f =>
      le32(java.lang.Float.floatToIntBits(f))).toArray
    wrapWav(rate, channels, bits = 32, formatCode = 3, extensible, data)
  }

  private def wrapWav(rate: Int, channels: Int, bits: Int,
      formatCode: Int, extensible: Boolean,
      data: Array[Byte]): Array[Byte] = {
    val bytesPer = bits / 8
    val base = le16(if (extensible) 0xFFFE else formatCode) ++
      le16(channels) ++ le32(rate) ++
      le32(rate * channels * bytesPer) ++ le16(channels * bytesPer) ++
      le16(bits)
    val fmt =
      if (!extensible) base
      else base ++ le16(22) ++ // cbSize
        le16(bits) ++ // validBitsPerSample
        le32(0) ++    // channel/speaker mask (unspecified)
        le16(formatCode) ++ // SubFormat GUID: wrapped code + KS tail
        Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
          0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71).map(_.toByte)
    val chunks = "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
  }

  /** Build a G.711 WAV (format 6 A-law / 7 μ-law, 8 companded bits per
    * sample) from explicit RAW companded bytes — expected linear
    * values in the fixtures below are hand-expanded by the CCITT
    * tables. */
  def buildWavG711(rate: Int, channels: Int, law: Int,
      companded: Seq[Int], extensible: Boolean = false): Array[Byte] = {
    require(law == 6 || law == 7, "A-law 6 / μ-law 7")
    require(companded.length % channels == 0, "partial frame")
    wrapWav(rate, channels, bits = 8, formatCode = law, extensible,
      companded.map(b => (b & 0xFF).toByte).toArray)
  }

  /** μ-law mono 8000 Hz, companded bytes 0x80,0x00,0xFF,0xEF,0x6F —
    * hand-expanded: +32124 (positive full scale), −32124, 0, +132,
    * −132. Expected stats: n_frames=5, amp −32124..32124,
    * sum_abs=64248+264=64512, zero_crossings=2 (+→− flip; →0 none;
    * →+132 none, the zero broke the run; →−132 flip). */
  val wavUlaw: Array[Byte] = buildWavG711(8000, 1, law = 7,
    Seq(0x80, 0x00, 0xFF, 0xEF, 0x6F))

  /** A-law mono 8000 Hz, companded bytes 0xAA,0x2A,0xD5,0x55 —
    * hand-expanded: +32256 (full scale), −32256, +8, −8. Expected:
    * n_frames=4, amp −32256..32256, sum_abs=64528, zero_crossings=3
    * (every step flips). */
  val wavAlaw: Array[Byte] = buildWavG711(8000, 1, law = 6,
    Seq(0xAA, 0x2A, 0xD5, 0x55))

  /** [[wavUlaw]]'s bytes in an EXTENSIBLE container (0xFFFE wrapping
    * SubFormat 7) — spec-only fixture. */
  val wavUlawExt: Array[Byte] = buildWavG711(8000, 1, law = 7,
    Seq(0x80, 0x00, 0xFF, 0xEF, 0x6F), extensible = true)

  /** Build an IMA ADPCM WAV (format 17, 4 bits) from explicit RAW
    * block bytes (per-channel 4-byte headers + nibble groups, exactly
    * as they sit in the data chunk); the canonical
    * samples-per-block for `blockAlign` goes into the fmt extension. */
  def buildWavAdpcm(rate: Int, channels: Int, blockAlign: Int,
      data: Seq[Int]): Array[Byte] = {
    val spb = (blockAlign - 4 * channels) * 2 / channels + 1
    val fmt = le16(17) ++ le16(channels) ++ le32(rate) ++
      le32(rate * blockAlign / spb) ++ // nominal average byte rate
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(spb)
    val d = data.map(b => (b & 0xFF).toByte).toArray
    val chunks = "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(d.length) ++ d ++
      (if (d.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
  }

  /** IMA ADPCM mono 8000 Hz, ONE 8-byte block: header pred=100 idx=0,
    * nibbles 0,4,8,3,15,0,2,9 — hand-walked through the step table:
    * 100 (header), 100, 107, 106, 113, 102, 104, 112, 108. Expected
    * stats: n_frames=9, amp 100..113, sum_abs=952, zero_crossings=0. */
  val wavAdpcmMono: Array[Byte] = buildWavAdpcm(8000, 1, 8,
    Seq(100, 0, 0, 0, // header: pred 100 LE, index 0, reserved
      0x40, 0x38, 0x0F, 0x92)) // nibbles low-first: (0,4)(8,3)(15,0)(2,9)

  /** IMA ADPCM stereo 4000 Hz, ONE 16-byte block: ch0 header pred=0
    * idx=0 with nibbles (1,8)×4 — at step 7 the index stays pinned at
    * 0 (both adjustments are −1), n=1 adds step>>2=1 and n=8 subtracts
    * step>>3=0, so the predictor RATCHETS: 1,1,2,2,3,3,4,4; ch1 header
    * pred=−5 with all-zero nibbles → −5 held. The 4-byte group
    * interleave is the thing under test. Expected: n_frames=9,
    * amp −5..4, sum_abs=20+45=65, zero_crossings=0. */
  val wavAdpcmStereo: Array[Byte] = buildWavAdpcm(4000, 2, 16,
    Seq(0, 0, 0, 0, // ch0 header
      0xFB, 0xFF, 0, 0, // ch1 header: pred −5 LE int16
      0x81, 0x81, 0x81, 0x81, // ch0 group
      0, 0, 0, 0)) // ch1 group

  /** 16-bit mono 8000 Hz clip with silent padding for the trim gate:
    * frames 0,3,−2,900,0,−800,4,0,2 — at threshold 5 only frames 3
    * and 5 are loud, so lead=3, trail=3, kept=3 (the interior zero is
    * content and stays), kept_sum_abs=1700. */
  val wavPadded: Array[Byte] = buildWav(8000, 1, 16,
    Seq(0, 3, -2, 900, 0, -800, 4, 0, 2))

  /** 16-bit mono clip that is silent throughout at threshold 5
    * (1,−1,0,2): the trim convention counts an all-silent clip as all
    * lead (lead=4, trail=0, kept=0). */
  val wavQuiet: Array[Byte] = buildWav(8000, 1, 16, Seq(1, -1, 0, 2))

  /** 16-bit mono 8000 Hz square wave, 16 frames alternating ±1000.
    * Expected stats: n_frames=16, amp −1000..1000, sum_abs=16000,
    * zero_crossings=15. */
  val wavSquare: Array[Byte] = buildWav(8000, 1, 16,
    (0 until 16).map(i => if (i % 2 == 0) 1000 else -1000))

  /** [[wavSquare]]'s SAMPLES in a different CONTAINER: a LIST chunk
    * (odd length → pad byte) spliced before fmt/data — different file
    * bytes, identical decoded PCM; the audio content-fingerprint dedup
    * fixture. */
  val wavSquareChunked: Array[Byte] = {
    val list = "LIST".getBytes ++ le32(7) ++ "graftfx".getBytes ++
      Array(0.toByte)
    val spliced = wavSquare.take(12) ++ list ++ wavSquare.drop(12)
    // RIFF size field covers everything after the first 8 bytes
    le32(spliced.length - 8).copyToArray(spliced, 4)
    spliced
  }

  /** 8-bit stereo 4000 Hz, 4 frames: channel 0 alternates ±10 (3 sign
    * flips), channel 1 alternates 0/20 (zeros break runs — 0 flips).
    * Expected stats: n_frames=4, amp −10..20, sum_abs=80,
    * zero_crossings=3. */
  val wavStereo8: Array[Byte] = buildWav(4000, 2, 8,
    Seq(10, 0, -10, 20, 10, 0, -10, 20))

  /** 24-bit mono 48 kHz, 5 frames spanning the full 24-bit range
    * (±(2^23−1) at the ends — the depth real music masters use).
    * Expected stats: n_frames=5, amp −8388607..8388607,
    * sum_abs=2·8388607+2·300000=17377214, zero_crossings=2
    * (hand-walk: +8388607 → −300000 flip, → 0 none, → +300000 none —
    * the zero broke the run, → −8388607 flip). */
  val wav24Mono: Array[Byte] = buildWav(48000, 1, 24,
    Seq(8388607, -300000, 0, 300000, -8388607))

  /** 32-bit int stereo 44.1 kHz EXTENSIBLE container (0xFFFE +
    * KSDATAFORMAT_SUBTYPE_PCM), 3 frames; ch0 ±2^30 alternating,
    * ch1 constant 1 billion. Expected: n_frames=3,
    * amp −1073741824..1073741824,
    * sum_abs=3·2^30+3·10^9=6221225472, zero_crossings=2 (ch0). */
  val wav32ExtStereo: Array[Byte] = buildWav(44100, 2, 32,
    Seq(1073741824, 1000000000, -1073741824, 1000000000,
      1073741824, 1000000000), extensible = true)

  /** 32-bit float mono 16 kHz (format 3), 6 samples: ±0.5 alternating,
    * then an out-of-range +2.0f (clamps to 32767) and NaN (→0).
    * Float decode presents in the 16-bit domain: round(f·32767), where
    * Math.round's half-up makes 0.5f → 16384 but −0.5f → −16383.
    * Expected: n_frames=6, amp −16383..32767,
    * sum_abs=2·16384+2·16383+32767+0=98301, zero_crossings=4
    * (+→−→+→−→+ flips four times; →NaN-as-0 none). */
  val wavFloatMono: Array[Byte] = buildWavFloat(16000, 1,
    Seq(0.5f, -0.5f, 0.5f, -0.5f, 2.0f, Float.NaN))

  /** [[wavFloatMono]]'s first four samples in an EXTENSIBLE float
    * container (0xFFFE wrapping format 3). */
  val wavFloatExt: Array[Byte] = buildWavFloat(16000, 1,
    Seq(0.5f, -0.5f, 0.5f, -0.5f), extensible = true)
}
