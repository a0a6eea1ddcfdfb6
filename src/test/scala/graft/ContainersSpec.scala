package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AudioFixtures, ContainerFixtures, Containers,
  MediaFixtures}

/** Container-metadata walks (MP3 frame headers, MP4 box tree) over
  * spec-derived fixtures, plus the adversarial never-throw contract. */
class ContainersSpec extends AnyFunSuite with SparkTestSupport {

  test("mp3Meta walks frames: CBR with ID3 framing, VBR mean bitrate") {
    val cbr = Containers.mp3Meta(ContainerFixtures.mp3Cbr).get
    assert(cbr.version == "MPEG1" && cbr.layer == 3)
    assert((cbr.sample_rate, cbr.channels) == ((44100, 1)))
    // 5 frames × 1152 samples at 44.1 kHz → 130 ms (integer)
    assert((cbr.n_frames, cbr.duration_ms, cbr.bitrate_kbps) ==
      ((5L, 130L, 128)))
    assert(cbr.has_id3v2)
    val vbr = Containers.mp3Meta(ContainerFixtures.mp3Vbr).get
    assert(vbr.version == "MPEG2" && vbr.sample_rate == 24000 &&
      vbr.channels == 2)
    // 64/96/64 kbps frames (the middle one padded): mean 74
    assert((vbr.n_frames, vbr.duration_ms, vbr.bitrate_kbps) ==
      ((3L, 72L, 74)))
    assert(!vbr.has_id3v2)
    // a lone sync word in junk is NOT an MP3 (≥2 stepping frames)
    val junk = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0) ++
      Array.fill(64)(0x55.toByte)
    assert(Containers.mp3Meta(junk).isEmpty)
    assert(Containers.mp3Meta(AudioFixtures.wavSquare).isEmpty)
  }

  test("mp4Meta walks the box tree: mvhd v0/v1, tkhd dims, hdlr roles") {
    val v = Containers.mp4Meta(ContainerFixtures.mp4Video).get
    assert(v.major_brand == "isom")
    assert((v.duration_ms, v.n_tracks) == ((5400L, 2)))
    assert((v.width, v.height) == ((640, 360)))
    assert(v.has_video && v.has_audio)
    val a = Containers.mp4Meta(ContainerFixtures.m4aAudio).get
    assert(a.major_brand == "M4A ")
    // mvhd v1: 64-bit duration 1234 at timescale 600 → 2056 ms
    assert((a.duration_ms, a.n_tracks) == ((2056L, 1)))
    assert((a.width, a.height) == ((0, 0)))
    assert(!a.has_video && a.has_audio)
    // non-BMFF blobs rejected (no ftyp at offset 4)
    assert(Containers.mp4Meta(MediaFixtures.pngRgb2x2).isEmpty)
    assert(Containers.mp4Meta(ContainerFixtures.mp3Cbr).isEmpty)
    // a lying box size must not classify or throw
    val bad = ContainerFixtures.mp4Video.clone()
    bad(0) = 0x7F.toByte // ftyp size → absurd
    assert(Containers.mp4Meta(bad).isEmpty)
  }

  test("avMeta dispatches mp3/mp4/wav and gates the rest; never throws on fuzz") {
    val s = spark
    import s.implicits._
    val got = Containers.avMeta(s, Seq(
        (1L, ContainerFixtures.mp3Cbr),
        (2L, ContainerFixtures.mp4Video),
        (3L, AudioFixtures.wavSquare),
        (4L, MediaFixtures.jpeg4x2),
        (5L, "not media".getBytes))
      .toDF("media_id", "content")).collect()
      .map(m => m.media_id -> m).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L).kind == "mp3" && got(1L).duration_ms == 130L)
    assert(got(2L).kind == "mp4" && got(2L).width == 640)
    // WAV duration from the REAL decoded sample count: 16 frames at
    // 8 kHz → 2 ms
    assert(got(3L).kind == "wav" && got(3L).duration_ms == 2L &&
      got(3L).n_frames == 16L)
    // adversarial: random blobs + bit-flipped/truncated fixtures
    val rnd = new scala.util.Random(31)
    def all(b: Array[Byte]): Unit = {
      Containers.mp3Meta(b); Containers.mp4Meta(b); ()
    }
    for (_ <- 0 until 200)
      all(Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
    for (fix <- Seq(ContainerFixtures.mp3Cbr, ContainerFixtures.mp3Vbr,
        ContainerFixtures.mp4Video, ContainerFixtures.m4aAudio);
        _ <- 0 until 60) {
      val m = fix.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      all(m); all(m.take(rnd.nextInt(m.length)))
    }
    succeed
  }
}
