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
    * or −32768..32767 for 16-bit little-endian). */
  def buildWav(rate: Int, channels: Int, bits: Int,
      samples: Seq[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16, "PCM 8/16-bit only")
    require(samples.length % channels == 0, "partial frame")
    val bytesPer = bits / 8
    val data: Array[Byte] =
      if (bits == 8) samples.map(v => ((v + 128) & 0xFF).toByte).toArray
      else samples.flatMap(v => le16(v & 0xFFFF)).toArray
    val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * bytesPer) ++ le16(channels * bytesPer) ++
      le16(bits)
    val chunks = "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
  }

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
}
