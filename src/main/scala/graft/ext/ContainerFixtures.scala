package graft.ext

/** Genuine MP3 / MP4 byte fixtures for the container-metadata walks
  * ([[Containers]]) — every structural byte (MPEG frame headers with
  * real bitrate/samplerate table entries, ISO BMFF box tree with sizes,
  * versions, 16.16 fixed-point dimensions) derived in plain code, so
  * the oracle's expected metadata is hand-readable from the builders.
  * Payloads are zero-filled: the walks are header/box parsers by
  * design (sample decode of these codecs needs external libraries —
  * SURVEY §9), so frame/box CONTENT is opaque by contract.
  */
object ContainerFixtures {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** One MPEG audio frame: a real 4-byte header (version/layer/bitrate/
    * samplerate/padding/channel-mode fields) + zero payload of the
    * exact length the header declares. */
  def mp3Frame(mpeg1: Boolean, bitrateIdx: Int, srIdx: Int,
      padding: Int, mono: Boolean): Array[Byte] = {
    val verBits = if (mpeg1) 3 else 2
    val h = Array(0xFF.toByte,
      (0xE0 | (verBits << 3) | (1 << 1) | 1).toByte, // Layer III, no CRC
      ((bitrateIdx << 4) | (srIdx << 2) | (padding << 1)).toByte,
      (if (mono) 0xC0 else 0x00).toByte)
    val kbps = (if (mpeg1)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
      160))(bitrateIdx)
    val sr = Array(44100, 48000, 32000)(srIdx) / (if (mpeg1) 1 else 2)
    val spf = if (mpeg1) 1152 else 576
    val len = spf / 8 * kbps * 1000 / sr + padding
    h ++ new Array[Byte](len - 4)
  }

  /** A minimal ID3v2.3 tag of `payload` bytes (syncsafe size). */
  def id3v2(payload: Int): Array[Byte] =
    "ID3".getBytes ++ Array[Byte](3, 0, 0,
      ((payload >> 21) & 0x7F).toByte, ((payload >> 14) & 0x7F).toByte,
      ((payload >> 7) & 0x7F).toByte, (payload & 0x7F).toByte) ++
      new Array[Byte](payload)

  /** CBR MPEG1 Layer III mono 44.1 kHz at 128 kbps, 5 frames, with an
    * ID3v2 prefix and an ID3v1 ("TAG") trailer. Expected meta:
    * n_frames=5, duration = 5·1152·1000/44100 = 130 ms (integer),
    * bitrate 128, has_id3v2. */
  val mp3Cbr: Array[Byte] =
    id3v2(17) ++
      (0 until 5).flatMap(_ => mp3Frame(mpeg1 = true, bitrateIdx = 9,
        srIdx = 0, padding = 0, mono = true)).toArray ++
      ("TAG" + "x" * 125).getBytes

  /** VBR MPEG2 Layer III stereo 24 kHz: 64/96/64 kbps frames with a
    * padding byte on the middle one. Expected: n_frames=3,
    * duration = 3·576·1000/24000 = 72 ms, mean bitrate
    * (64+96+64)/3 = 74 (integer division). */
  val mp3Vbr: Array[Byte] =
    (mp3Frame(mpeg1 = false, bitrateIdx = 8, srIdx = 1, padding = 0,
      mono = false) ++
      mp3Frame(mpeg1 = false, bitrateIdx = 10, srIdx = 1, padding = 1,
        mono = false) ++
      mp3Frame(mpeg1 = false, bitrateIdx = 8, srIdx = 1, padding = 0,
        mono = false))

  private def box(btype: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ btype.getBytes ++ body

  private def fullBox(btype: String, version: Int,
      body: Array[Byte]): Array[Byte] =
    box(btype, Array[Byte](version.toByte, 0, 0, 0) ++ body)

  /** Minimal valid ISO BMFF video file: ftyp(isom) + moov(mvhd v0
    * timescale=1000 duration=5400 → 5400 ms; video trak 640×360 16.16
    * in tkhd + hdlr 'vide'; audio trak + hdlr 'soun') + mdat.
    * Expected: brand isom, duration_ms=5400, n_tracks=2, 640×360,
    * video+audio. */
  val mp4Video: Array[Byte] = {
    val mvhd = fullBox("mvhd", 0,
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(5400) ++
        new Array[Byte](80)) // rate/volume/matrix/next-track, opaque
    def tkhd(w: Int, h: Int) = fullBox("tkhd", 0,
      new Array[Byte](36) ++ // ctime..volume+reserved (v0: 36 bytes)
        new Array[Byte](36) ++ // matrix
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    def hdlr(handler: String) = fullBox("hdlr", 0,
      be32(0) ++ handler.getBytes ++ new Array[Byte](13))
    def trak(w: Int, h: Int, handler: String) =
      box("trak", tkhd(w, h) ++ box("mdia", hdlr(handler)))
    box("ftyp", "isom".getBytes ++ be32(512) ++ "isommp42".getBytes) ++
      box("moov", mvhd ++ trak(640, 360, "vide") ++
        trak(0, 0, "soun")) ++
      box("mdat", new Array[Byte](32))
  }

  /** Audio-only M4A twin: mvhd v1 (64-bit times, timescale 600,
    * duration 1234 → 2056 ms integer), one 'soun' track, no video.
    * Expected: brand M4A_ (ISO-8859-1 tag), duration_ms=2056,
    * n_tracks=1, 0×0, audio only. */
  val m4aAudio: Array[Byte] = {
    val mvhd = fullBox("mvhd", 1,
      new Array[Byte](16) ++ // 64-bit ctime/mtime
        be32(600) ++ Array[Byte](0, 0, 0, 0) ++ be32(1234) ++
        new Array[Byte](80))
    val tkhd = fullBox("tkhd", 1,
      new Array[Byte](48) ++ new Array[Byte](36) ++
        be32(0) ++ be32(0))
    val hdlr = fullBox("hdlr", 0,
      be32(0) ++ "soun".getBytes ++ new Array[Byte](13))
    box("ftyp", "M4A ".getBytes ++ be32(0) ++ "M4A mp42isom".getBytes) ++
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", hdlr))) ++
      box("mdat", new Array[Byte](16))
  }
}
