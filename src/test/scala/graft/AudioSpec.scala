package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Audio, AudioFixtures, MediaFixtures}

class AudioSpec extends AnyFunSuite with SparkTestSupport {

  test("wavSamples round-trips buildWav fixtures exactly") {
    val sq = Audio.wavSamples(AudioFixtures.wavSquare).get
    assert((sq.sampleRate, sq.channels, sq.bitsPerSample) == ((8000, 1, 16)))
    assert(sq.samples.toSeq ==
      (0 until 16).map(i => if (i % 2 == 0) 1000 else -1000))
    val st = Audio.wavSamples(AudioFixtures.wavStereo8).get
    assert((st.sampleRate, st.channels, st.bitsPerSample) == ((4000, 2, 8)))
    assert(st.samples.toSeq == Seq(10, 0, -10, 20, 10, 0, -10, 20))
  }

  test("wavSamples skips unknown chunks, handles odd-length padding, rejects junk") {
    // splice a LIST chunk (odd length 7 → 1 pad byte) before fmt/data
    val base = AudioFixtures.buildWav(8000, 1, 16, Seq(5, -5, 7))
    val list = "LIST".getBytes ++
      Array(7, 0, 0, 0).map(_.toByte) ++ "abcdefg".getBytes ++
      Array(0.toByte)
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    for (j <- 0 until 4)
      spliced(4 + j) = ((riffLen >> (8 * j)) & 0xFF).toByte
    val got = Audio.wavSamples(spliced).get
    assert(got.samples.toSeq == Seq(5, -5, 7))
    // rejections: not RIFF, truncated data chunk, float PCM format
    assert(Audio.wavSamples("RIFXjunk".getBytes).isEmpty)
    assert(Audio.wavSamples(base.take(base.length - 3)).isEmpty)
    val floatFmt = base.clone()
    floatFmt(20) = 3 // WAVE_FORMAT_IEEE_FLOAT
    assert(Audio.wavSamples(floatFmt).isEmpty)
    assert(Audio.wavSamples(MediaFixtures.jpeg4x2).isEmpty)
  }

  test("buildWav bytes are decoded bit-exact by the JDK's independent codec") {
    // javax.sound.sampled is a WAV implementation this repo did not
    // write; PCM is lossless so the comparison is exact, not ±1.
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(AudioFixtures.wavSquare))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    assert(raw.length == 32)
    val jdk = (0 until 16).map { i =>
      // 16-bit little-endian signed, as the fmt chunk declares
      ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
    }
    assert(jdk == Audio.wavSamples(AudioFixtures.wavSquare).get.samples.toSeq)
  }

  test("wavSamples decodes JDK-written WAVE streams bit-exact") {
    // reverse direction: AudioSystem writes the container, we parse it
    val rnd = new scala.util.Random(7)
    for ((channels, bits) <- Seq((1, 16), (2, 16), (1, 8))) {
      val nFrames = 37
      val samples = Array.fill(nFrames * channels)(
        if (bits == 16) rnd.nextInt(65536) - 32768 else rnd.nextInt(256) - 128)
      val bytesPer = bits / 8
      val pcm: Array[Byte] =
        if (bits == 8) samples.map(v => ((v + 128) & 0xFF).toByte)
        else samples.flatMap(v =>
          Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 16000f, bits,
        channels, channels * bytesPer, 16000f, false)
      val fmt8 = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 16000f, 8,
        channels, channels, 16000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        if (bits == 8) fmt8 else fmt, nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      val got = Audio.wavSamples(baos.toByteArray)
        .getOrElse(fail(s"rejected JDK WAVE at ch=$channels bits=$bits"))
      assert((got.sampleRate, got.channels, got.bitsPerSample) ==
        ((16000, channels, bits)))
      assert(got.samples.toSeq == samples.toSeq)
    }
  }

  test("wavSamples decodes 24/32-bit, float, and extensible containers; JDK agrees") {
    // 24-bit full-range
    val w24 = Audio.wavSamples(AudioFixtures.wav24Mono).get
    assert((w24.sampleRate, w24.channels, w24.bitsPerSample) ==
      ((48000, 1, 24)))
    assert(w24.samples.toSeq ==
      Seq(8388607, -300000, 0, 300000, -8388607))
    // the JDK's independent reader agrees byte-for-byte (24-bit LE)
    val in24 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(AudioFixtures.wav24Mono))
    assert(in24.getFormat.getSampleSizeInBits == 24)
    val raw24 = in24.readAllBytes()
    val jdk24 = (0 until 5).map { i =>
      ((raw24(3 * i) & 0xFF) | ((raw24(3 * i + 1) & 0xFF) << 8) |
        ((raw24(3 * i + 2) & 0xFF) << 16)) << 8 >> 8
    }
    assert(jdk24 == w24.samples.toSeq)
    // extensible container wrapping 32-bit int PCM
    val w32 = Audio.wavSamples(AudioFixtures.wav32ExtStereo).get
    assert((w32.sampleRate, w32.channels, w32.bitsPerSample) ==
      ((44100, 2, 32)))
    assert(w32.samples.toSeq == Seq(1073741824, 1000000000,
      -1073741824, 1000000000, 1073741824, 1000000000))
    val in32 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(AudioFixtures.wav32ExtStereo))
    assert(in32.getFormat.getSampleSizeInBits == 32 &&
      in32.getFormat.getChannels == 2)
    // IEEE float (format 3): presented in the 16-bit integer domain
    // round(f·32767); out-of-range clamps, NaN → 0
    val wf = Audio.wavSamples(AudioFixtures.wavFloatMono).get
    assert((wf.sampleRate, wf.channels, wf.bitsPerSample) ==
      ((16000, 1, 32)))
    assert(wf.samples.toSeq ==
      Seq(16384, -16383, 16384, -16383, 32767, 0))
    // extensible wrapping float decodes to the same presentation
    val wfe = Audio.wavSamples(AudioFixtures.wavFloatExt).get
    assert(wfe.samples.toSeq == Seq(16384, -16383, 16384, -16383))
    // reverse direction: the JDK writes 24-bit PCM and float WAVE
    // streams; ours parses both bit-exact
    val rnd = new scala.util.Random(11)
    val s24 = Array.fill(23)(rnd.nextInt(1 << 24) - (1 << 23))
    val pcm24 = s24.flatMap(v => Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte))
    val fmt24 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 22050f, 24,
      1, 3, 22050f, false)
    val b24 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm24), fmt24, 23L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, b24)
    val got24 = Audio.wavSamples(b24.toByteArray)
      .getOrElse(fail("rejected JDK-written 24-bit WAVE"))
    assert(got24.samples.toSeq == s24.toSeq)
    val fls = Array.fill(17)(rnd.nextFloat() * 2f - 1f)
    val pcmF = fls.flatMap { f =>
      val b = java.lang.Float.floatToIntBits(f)
      Array((b & 0xFF).toByte, ((b >> 8) & 0xFF).toByte,
        ((b >> 16) & 0xFF).toByte, ((b >> 24) & 0xFF).toByte)
    }
    val fmtF = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 16000f, 32,
      1, 4, 16000f, false)
    val bF = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmF), fmtF, 17L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bF)
    val gotF = Audio.wavSamples(bF.toByteArray)
      .getOrElse(fail("rejected JDK-written float WAVE"))
    assert(gotF.samples.toSeq == fls.toSeq.map(f =>
      math.max(-32768, math.min(32767, math.round(f * 32767f)))))
    // 64-bit float stays rejected, not mis-decoded
    val w64 = AudioFixtures.wavFloatMono.clone()
    assert((w64(34) & 0xFF) == 32) // bits field of the fmt chunk
    w64(34) = 64.toByte
    assert(Audio.wavSamples(w64).isEmpty)
  }

  test("wavSamples expands G.711 u-law/A-law; JDK codecs agree both directions") {
    import javax.sound.sampled._
    // hand-expanded CCITT segment-table values (see AudioFixtures)
    val expU = Seq(32124, -32124, 0, 132, -132)
    val u = Audio.wavSamples(AudioFixtures.wavUlaw).get
    assert(u.sampleRate == 8000 && u.channels == 1 && u.bitsPerSample == 8)
    assert(u.samples.toSeq == expU)
    val expA = Seq(32256, -32256, 8, -8)
    assert(Audio.wavSamples(AudioFixtures.wavAlaw).get.samples.toSeq == expA)
    // extensible container wrapping SubFormat 7, same payload
    assert(Audio.wavSamples(AudioFixtures.wavUlawExt).get.samples.toSeq == expU)
    // the JDK's independent G.711 codecs expand our fixture bytes to
    // the same linear values
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f,
      16, 1, 2, 8000f, false)
    def jdk16(dec: AudioInputStream): Seq[Int] = {
      val raw = dec.readAllBytes()
      (0 until raw.length / 2).map(i =>
        ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt)
    }
    for ((fix, exp) <- Seq((AudioFixtures.wavUlaw, expU),
        (AudioFixtures.wavAlaw, expA))) {
      val enc = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(fix))
      assert(jdk16(AudioSystem.getAudioInputStream(pcmFmt, enc)) == exp,
        "jdk expansion of our fixture")
    }
    // reverse: the JDK compands PCM and writes the WAVE container; our
    // expansion must match the JDK's own re-expansion of that file
    val rnd = new scala.util.Random(11)
    val frames = Array.fill(50)(rnd.nextInt(65536) - 32768)
    val pcmBytes = frames.flatMap(v =>
      Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
    for (lawEnc <- Seq(AudioFormat.Encoding.ULAW, AudioFormat.Encoding.ALAW)) {
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBytes), pcmFmt, 50)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(AudioSystem.getAudioInputStream(lawEnc, src),
        AudioFileFormat.Type.WAVE, baos)
      val bytes = baos.toByteArray
      val ours = Audio.wavSamples(bytes)
        .getOrElse(fail(s"rejected JDK-written $lawEnc WAVE"))
      assert(ours.bitsPerSample == 8 && ours.channels == 1)
      val reread = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ours.samples.toSeq ==
        jdk16(AudioSystem.getAudioInputStream(pcmFmt, reread)),
        s"$lawEnc expansion parity with the JDK")
    }
  }

  test("wavSamples decodes IMA ADPCM blocks (mono nibble walk, stereo interleave)") {
    // mono: the hand-walked step-table expansion from AudioFixtures
    val m = Audio.wavSamples(AudioFixtures.wavAdpcmMono).get
    assert(m.sampleRate == 8000 && m.channels == 1 && m.bitsPerSample == 4)
    assert(m.samples.toSeq ==
      Seq(100, 100, 107, 106, 113, 102, 104, 112, 108))
    // stereo: 4-byte group interleave must route nibbles per channel
    val st = Audio.wavSamples(AudioFixtures.wavAdpcmStereo).get
    assert(st.channels == 2)
    assert(st.samples.toSeq ==
      (Seq(0, -5) ++ Seq(1, 1, 2, 2, 3, 3, 4, 4).flatMap(v => Seq(v, -5))))
    // two consecutive mono blocks decode independently (fresh headers)
    val twoBlocks = AudioFixtures.buildWavAdpcm(8000, 1, 8,
      Seq(100, 0, 0, 0, 0x40, 0x38, 0x0F, 0x92,
        0x38, 0xFF, 88, 0, 0x00, 0x00, 0x00, 0x00)) // pred −200, idx 88
    val t = Audio.wavSamples(twoBlocks).get
    assert(t.samples.length == 18)
    assert(t.samples(9) == -200) // block 2's header seed
    // block 2 seeds idx=88 (max step 32767); nibble 0 still adds the
    // rounding term step>>3 = 4095
    assert(t.samples(10) == -200 + (32767 >> 3))
    // malformed: header step index out of range gates out
    val bad = AudioFixtures.buildWavAdpcm(8000, 1, 8,
      Seq(0, 0, 120, 0, 0, 0, 0, 0))
    assert(Audio.wavSamples(bad).isEmpty)
    // inconsistent samples-per-block (fmt says the wrong geometry):
    // flip the spb field and the file gates out instead of mis-decoding
    val wrongSpb = AudioFixtures.wavAdpcmMono.clone()
    wrongSpb(38) = 99.toByte // spb LE lo byte inside the fmt extension
    assert(Audio.wavSamples(wrongSpb).isEmpty)
  }

  test("resampleStats: floor-exact interpolation; identity at equal rates") {
    val s = spark
    import s.implicits._
    def one(fix: Array[Byte], dst: Int) =
      Audio.resampleStats(s, Seq((1L, fix)).toDF("media_id", "content"),
        dstRate = dst).collect().head
    // the hand-walked 8000→6000 square wave (period-3 ladder)
    assert(one(AudioFixtures.wavSquare, 6000) ==
      Audio.ResampledStats(1L, 8000, 6000, 1, 12, -334, 1000, 6672))
    // stereo upsample interpolates per channel through the interleave
    assert(one(AudioFixtures.wavStereo8, 6000) ==
      Audio.ResampledStats(1L, 4000, 6000, 2, 5, -4, 13, 71))
    // identity: dst == src touches no fractional positions
    val id = one(AudioFixtures.wav24Mono, 48000)
    assert(id.n_frames == 5 && id.amp_min == -8388607 &&
      id.amp_max == 8388607 && id.amp_sum_abs == 17377214L)
    // integer decimation takes every k-th frame exactly
    val dec = one(AudioFixtures.wavSquare, 4000)
    assert(dec.n_frames == 8 && dec.amp_min == 1000 && dec.amp_max == 1000)
  }

  test("trimSilenceStats: head/tail extent at the threshold, interior kept") {
    val s = spark
    import s.implicits._
    val got = Audio.trimSilenceStats(s, Seq(
        (1L, AudioFixtures.wavPadded),
        (2L, AudioFixtures.wavStereo8),
        (3L, AudioFixtures.wavQuiet),
        (4L, "junk".getBytes))
      .toDF("media_id", "content"), threshold = 5)
      .collect().map(t => t.media_id -> t).toMap
    assert(got.size == 3) // junk gated out
    assert(got(1L) == Audio.TrimmedStats(1L, 9, 3, 3, 3, 1700))
    assert(got(2L) == Audio.TrimmedStats(2L, 4, 0, 0, 4, 80))
    assert(got(3L) == Audio.TrimmedStats(3L, 4, 4, 0, 0, 0))
  }

  test("decodeStats: integer-exact statistics; non-WAV blobs gated out") {
    val s = spark
    import s.implicits._
    val got = Audio.decodeStats(s, Seq(
        (1L, AudioFixtures.wavSquare),
        (2L, AudioFixtures.wavStereo8),
        (3L, MediaFixtures.jpeg4x2))
      .toDF("media_id", "content")).collect()
      .map(a => a.media_id -> a).toMap
    assert(got.keySet == Set(1L, 2L))
    val sq = got(1L)
    assert((sq.sample_rate, sq.channels, sq.n_frames) == ((8000, 1, 16L)))
    assert((sq.amp_min, sq.amp_max, sq.amp_sum_abs, sq.zero_crossings) ==
      ((-1000, 1000, 16000L, 15L)))
    val st = got(2L)
    assert((st.sample_rate, st.channels, st.n_frames) == ((4000, 2, 4L)))
    // zero samples break sign-flip runs; channels never cross-pair
    assert((st.amp_min, st.amp_max, st.amp_sum_abs, st.zero_crossings) ==
      ((-10, 20, 80L, 3L)))
  }

  test("contentFingerprint: identical PCM across container variants shares a digest") {
    val s = spark
    import s.implicits._
    // different FILE bytes (LIST chunk spliced), same decoded samples
    assert(!java.util.Arrays.equals(AudioFixtures.wavSquare,
      AudioFixtures.wavSquareChunked))
    val got = Audio.contentFingerprint(s, Seq(
        (1L, AudioFixtures.wavSquare),
        (2L, AudioFixtures.wavSquareChunked),
        (3L, AudioFixtures.wavStereo8),
        (4L, MediaFixtures.jpeg4x2))
      .toDF("media_id", "content")).collect()
      .map(c => c.media_id -> c.pcm_md5).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == got(2L) && got(1L) != got(3L))
  }

  test("windowFeatures: per-window energy/peak/crossings, hop = window") {
    val s = spark
    import s.implicits._
    val got = Audio.windowFeatures(s,
        Seq((2L, AudioFixtures.wavStereo8)).toDF("media_id", "content"),
        windowFrames = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq((0, 40L, 20, 1L), (1, 40L, 20, 1L)))
    // a trailing partial window is dropped, not mis-aggregated
    val odd = Audio.windowFeatures(s,
        Seq((1L, AudioFixtures.buildWav(8000, 1, 16, Seq(1, -2, 3)))
          ).toDF("media_id", "content"), windowFrames = 2)
      .collect()
    assert(odd.length == 1 && odd.head.getLong(2) == 3L)
  }
}
