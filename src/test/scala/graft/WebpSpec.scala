package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Multimodal, Webp, WebpFixtures}
import graft.ext.WebpFixtures.{ColorTf, PaletteTf, Pred, SubGreen}

/** VP8L (lossless WebP) decode pinned against the from-scratch fixture
  * encoder: every bitstream feature round-trips — prefix-code forms,
  * color cache, LZ77 backrefs via the plane-code table, meta prefix
  * groups, and all four transforms in combination. Fuzz arms hold the
  * fail-closed contract (None, never a throw) on random and bit-flipped
  * bytes, matching the other decoders in MultimodalSpec. */
class WebpSpec extends AnyFunSuite {

  /** Deterministic pseudo-random ARGB pixels (opaque unless `alpha`). */
  private def pattern(w: Int, h: Int, seed: Int,
      alpha: Boolean = false, values: Int = 256): Array[Int] =
    Array.tabulate(w * h) { i =>
      def mix(k: Int): Int = {
        var x = i * 2654435761L + seed * 40503L + k * 97L
        x ^= x >>> 13; x *= 0x5deece66dL; x ^= x >>> 17
        (math.floorMod(x, values)).toInt
      }
      val a = if (alpha) mix(3) else 0xff
      (a << 24) | (mix(0) << 16) | (mix(1) << 8) | mix(2)
    }

  private def decode(bytes: Array[Byte]): Multimodal.RawImage =
    Webp.pixels(bytes).getOrElse(fail("vp8l decode returned None"))

  private def assertPixels(img: Multimodal.RawImage, w: Int, h: Int,
      argb: Array[Int], alpha: Boolean): Unit = {
    assert(img.width == w && img.height == h)
    assert(img.channels == (if (alpha) 4 else 3))
    val ch = img.channels
    var i = 0
    while (i < w * h) {
      val px = argb(i)
      assert((img.pixels(i * ch) & 0xff) == ((px >> 16) & 0xff),
        s"red at $i")
      assert((img.pixels(i * ch + 1) & 0xff) == ((px >> 8) & 0xff),
        s"green at $i")
      assert((img.pixels(i * ch + 2) & 0xff) == (px & 0xff),
        s"blue at $i")
      if (alpha)
        assert((img.pixels(i * ch + 3) & 0xff) == ((px >>> 24) & 0xff),
          s"alpha at $i")
      i += 1
    }
  }

  private def roundTrip(w: Int, h: Int, argb: Array[Int],
      transforms: Seq[WebpFixtures.Tf] = Nil, cacheBits: Int = 0,
      metaBits: Int = 0, useBackrefs: Boolean = true): Unit = {
    val alpha = argb.exists(p => (p >>> 24) != 0xff)
    val bytes = WebpFixtures.buildVp8l(w, h, argb, transforms,
      cacheBits, metaBits, useBackrefs)
    assertPixels(decode(bytes), w, h, argb, alpha)
  }

  test("solid color: simple prefix codes, zero-bit trees") {
    roundTrip(6, 3, Array.fill(18)(0xff4080c0))
  }

  test("two-value image: simple 2-symbol codes") {
    roundTrip(5, 4, Array.tabulate(20)(i =>
      if (i % 3 == 0) 0xff102030 else 0xffa0b0c0))
  }

  test("dense pattern: normal codes with code-length coding") {
    roundTrip(17, 11, pattern(17, 11, seed = 1))
  }

  test("alpha channel round-trips when the hint is set") {
    roundTrip(9, 7, pattern(9, 7, seed = 2, alpha = true))
  }

  test("backrefs: runs compress through the plane-code table") {
    val px = Array.tabulate(64 * 3) { i =>
      if ((i / 16) % 2 == 0) 0xff112233 else 0xff445566
    }
    roundTrip(64, 3, px, useBackrefs = true)
  }

  test("color cache: repeated colors hit the cache path") {
    val palette = Array(0xff000000, 0xffff0000, 0xff00ff00, 0xff0000ff)
    val px = Array.tabulate(16 * 16)(i => palette((i * 7 + i / 16) % 4))
    // backrefs off so cache hits, not runs, carry the repetition
    roundTrip(16, 16, px, cacheBits = 4, useBackrefs = false)
  }

  test("meta prefix groups: checkerboard 2-group entropy image") {
    roundTrip(23, 14, pattern(23, 14, seed = 3), metaBits = 2)
  }

  test("subtract-green transform") {
    roundTrip(12, 9, pattern(12, 9, seed = 4), Seq(SubGreen))
  }

  test("predictor transform: every mode 0..13 appears") {
    // 4-px blocks over a 32x16 image = 8x4 = 32 blocks; cycle modes
    roundTrip(32, 16, pattern(32, 16, seed = 5),
      Seq(Pred(2, (bx, by) => (bx + by * 8) % 14)))
  }

  test("color transform: constant cross-channel element") {
    roundTrip(13, 10, pattern(13, 10, seed = 6),
      Seq(ColorTf(3, g2r = 0x35, g2b = 0xe2, r2b = 0x1b)))
  }

  test("palette: 4 colors bundle 4 pixels per byte") {
    val palette = Array(0xff111111, 0xff222222, 0xff888888, 0xffeeeeee)
    val px = Array.tabulate(21 * 6)(i => palette((i * 5 + 1) % 4))
    roundTrip(21, 6, px, Seq(PaletteTf))
  }

  test("palette: 2 colors bundle 8 pixels per byte, odd width") {
    val px = Array.tabulate(19 * 5)(i =>
      if ((i ^ (i / 19)) % 2 == 0) 0xff000000 else 0xffffffff)
    roundTrip(19, 5, px, Seq(PaletteTf))
  }

  test("palette: 200 colors, no bundling") {
    val px = Array.tabulate(40 * 10)(i => 0xff000000 | ((i % 200) * 97 % 256 << 16) | (i % 200))
    roundTrip(40, 10, px, Seq(PaletteTf))
  }

  test("stacked transforms: subtract-green + predictor + cache") {
    roundTrip(24, 13, pattern(24, 13, seed = 7),
      Seq(SubGreen, Pred(2, (bx, by) => (bx * 3 + by) % 14)),
      cacheBits = 6)
  }

  test("stacked transforms: color + subtract-green + meta groups") {
    roundTrip(20, 12, pattern(20, 12, seed = 8),
      Seq(ColorTf(2, 0x10, 0x20, 0x30), SubGreen), metaBits = 3)
  }

  test("palette then predictor: transform sizing follows the bundled width") {
    val palette = Array(0xff101010, 0xff505050, 0xff909090, 0xffd0d0d0)
    val px = Array.tabulate(33 * 9)(i => palette((i * 11 + i / 33) % 4))
    roundTrip(33, 9, px, Seq(PaletteTf, Pred(2, (_, _) => 2)))
  }

  test("1x1 and single-row/column edge geometries") {
    roundTrip(1, 1, Array(0xff7f7f7f))
    roundTrip(1, 9, pattern(1, 9, seed = 9))
    roundTrip(9, 1, pattern(9, 1, seed = 10))
  }

  test("dims: VP8L header, VP8 lossy key frame, VP8X canvas") {
    val lossless = WebpFixtures.buildVp8l(300, 77, Array.fill(300 * 77)(0xff000000))
    assert(Webp.dims(lossless).contains((300, 77, 3)))
    assert(Multimodal.imageDims(lossless).contains((300, 77, 3)))
    val lossy = WebpFixtures.buildVp8LossyStub(640, 480)
    assert(Webp.dims(lossy).contains((640, 480, 3)))
    assert(Multimodal.imageDims(lossy).contains((640, 480, 3)))
    // since r18 the lossy path DECODES; a filler payload with sound
    // framing reconstructs to some image (arithmetic-coded bytes are
    // never structurally invalid — libwebp behaves the same)
    assert(Webp.pixels(lossy).exists(i => i.width == 640 && i.height == 480))
  }

  test("decodeStatus taxonomy: ok / unsupported / corrupt") {
    val good = WebpFixtures.buildVp8l(4, 4, Array.fill(16)(0xff336699))
    assert(Multimodal.decodeStatus(good)._1 == "ok")
    // real lossy VP8 is `ok` since r18 (Vp8Spec pins it bit-exactly);
    // a lossy container whose partition framing is BROKEN is corrupt
    val lossy = WebpFixtures.pinnedLossyWebp
    assert(Multimodal.decodeStatus(lossy)._1 == "ok")
    assert(Multimodal.decodeStatus(lossy.take(26))._1 == "corrupt")
    val truncated = good.take(good.length - 3)
    assert(Multimodal.decodeStatus(truncated)._1 == "corrupt")
    val svg = "<svg xmlns='http://www.w3.org/2000/svg'/>".getBytes("UTF-8")
    assert(Multimodal.decodeStatus(svg)._1 == "unsupported")
    val png = graft.ext.MediaFixtures.buildPng(3, 2, colorType = 2,
      rows = Seq.fill(2)(Seq.fill(9)(7)), filters = Seq.fill(2)(0))
    assert(Multimodal.decodeStatus(png)._1 == "ok")
    assert(Multimodal.decodeStatus(png.take(24))._1 == "corrupt")
    // valid ANIMATED lossless is ok — decoded via the frame path (r17
    // ADVICE: it sniffed webp-vp8l but the still path can't decode it,
    // so undamaged animations were censused corrupt)
    val anim = WebpFixtures.buildWebpAnim(6, 4, Seq(
      WebpFixtures.AnimFrame(0, 0, 6, 4, 100,
        Array.fill(24)(0xff5588bb))))
    val (animStatus, animImg) = Multimodal.decodeStatus(anim)
    assert(animStatus == "ok" &&
      animImg.exists(i => i.width == 6 && i.height == 4))
    // ...and a DAMAGED (truncated mid-frame) animation is corrupt,
    // not unsupported
    assert(Multimodal.decodeStatus(anim.take(anim.length - 4))._1
      == "corrupt")
  }

  test("animation: VP8X+ANIM+ANMF frames round-trip geometry, timing, pixels") {
    val f0 = WebpFixtures.AnimFrame(0, 0, 5, 3, 120,
      pattern(5, 3, seed = 20))
    val f1 = WebpFixtures.AnimFrame(4, 2, 3, 2, 80,
      pattern(3, 2, seed = 21))
    val bytes = WebpFixtures.buildWebpAnim(9, 6, Seq(f0, f1), loops = 2)
    // canvas dims come from VP8X
    assert(Webp.dims(bytes).contains((9, 6, 3)))
    val frames = Webp.frames(bytes).getOrElse(fail("no frames"))
    assert(frames.map(f => (f.index, f.x, f.y, f.width, f.height,
      f.duration_ms)) == Seq((0, 0, 0, 5, 3, 120), (1, 4, 2, 3, 2, 80)))
    frames.zip(Seq(f0, f1)).foreach { case (got, want) =>
      val img = Multimodal.RawImage(got.width, got.height,
        got.channels, got.pixels)
      assertPixels(img, want.w, want.h, want.argb, alpha = false)
    }
    // a still image has no frames; frames() of a GIF is None too
    val still = WebpFixtures.buildVp8l(4, 4, Array.fill(16)(0xff224466))
    assert(Webp.frames(still).isEmpty)
    assert(Webp.pixels(still).isDefined)
    // a damaged frame bitstream fails the WHOLE decode closed
    val tampered = bytes.clone()
    tampered(bytes.length - 5) = (tampered(bytes.length - 5) ^ 0x7).toByte
    Webp.frames(tampered) // any result, no throw
    (0 until bytes.length by 11).foreach(n => Webp.frames(bytes.take(n)))
  }

  test("fuzz: random bytes and bit flips never throw") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Webp.pixels(b); Webp.dims(b) // must not throw
    }
    val real = WebpFixtures.buildVp8l(15, 11, pattern(15, 11, seed = 11),
      Seq(SubGreen, Pred(2, (bx, by) => (bx + by) % 14)), cacheBits = 5)
    (0 until 400).foreach { i =>
      val b = real.clone()
      val bit = (i * 2654435761L % (b.length * 8L)).toInt
      b(bit / 8) = (b(bit / 8) ^ (1 << (bit % 8))).toByte
      Webp.pixels(b) // any result is fine; throwing is not
    }
    // truncations at every prefix length
    (0 until real.length by 7).foreach { n =>
      Webp.pixels(real.take(n)); Webp.dims(real.take(n))
    }
  }

  test("randomized round trips: 80 dim/transform/cache/meta combinations") {
    val rnd = new scala.util.Random(1717)
    (0 until 80).foreach { k =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(24)
      val alpha = rnd.nextBoolean()
      // palette path needs a bounded color count; others free-range
      val usePalette = rnd.nextInt(4) == 0
      val values = if (usePalette) 1 + rnd.nextInt(5) else 256
      val px = pattern(w, h, seed = 1000 + k, alpha = alpha && !usePalette,
        values = values)
      val tfs = scala.collection.mutable.ArrayBuffer.empty[WebpFixtures.Tf]
      if (usePalette) tfs += PaletteTf
      else {
        if (rnd.nextBoolean()) tfs += SubGreen
        if (rnd.nextBoolean()) {
          val modes = Array.tabulate(64)(_ => rnd.nextInt(14))
          tfs += Pred(2 + rnd.nextInt(3),
            (bx, by) => modes((bx * 7 + by * 3) % 64))
        }
        if (rnd.nextInt(3) == 0)
          tfs += ColorTf(2 + rnd.nextInt(3), rnd.nextInt(256),
            rnd.nextInt(256), rnd.nextInt(256))
      }
      val cacheBits = if (rnd.nextBoolean()) 1 + rnd.nextInt(8) else 0
      val metaBits = if (rnd.nextInt(3) == 0) 2 + rnd.nextInt(3) else 0
      withClue(s"combo $k: ${w}x$h tfs=${tfs.toList} cache=$cacheBits " +
        s"meta=$metaBits") {
        roundTrip(w, h, px, tfs.toSeq, cacheBits, metaBits,
          useBackrefs = rnd.nextBoolean())
      }
    }
  }

  test("plane-code table: exact spec domain, order, and distance map") {
    val t = Webp.neighborTable
    // the spec LUT is one byte per entry, (dy << 4) | (8 - dx): the
    // domain is EXACTLY dy in [0,7], dx in [-7,8] (dx > 0 when dy = 0)
    // — which counts to precisely 120 (r17 review: a wider candidate
    // square truncated to 120 drifted on codes 97..120)
    assert(t.length == 120 && t.distinct.length == 120)
    assert(t.forall { case (x, y) =>
      y >= 0 && y <= 7 && x >= -7 && x <= 8 && !(y == 0 && x <= 0) })
    // ordered by distance, ties dy desc then +dx before -dx
    val keys = t.map { case (x, y) => (x * x + y * y, -y, -x) }
    assert(keys.sameElements(keys.sorted))
    // the spec table's opening row, literal
    assert(t.take(8).toSeq == Seq((0, 1), (1, 0), (1, 1), (-1, 1),
      (0, 2), (2, 0), (1, 2), (-1, 2)))
    // distance mapping: code 1 = one row up, code 2 = one left,
    // codes > 120 = direct distance - 120
    assert(Webp.planeToDist(1, 100) == 100)
    assert(Webp.planeToDist(2, 100) == 1)
    assert(Webp.planeToDist(121, 100) == 1)
    assert(Webp.planeToDist(130, 100) == 10)
    // negative-dx offsets clamp at 1 minimum
    assert(t.forall { case (x, y) =>
      Webp.planeToDist(t.indexOf((x, y)) + 1, 4) >= 1 })
  }

  test("pixel budget: lying 14-bit dims do not over-allocate") {
    // declared 16384x16384 = 256M pixels exceeds the 64M budget
    val bw = new WebpFixtures.BitWriter
    bw.writeBits(16383, 14); bw.writeBits(16383, 14)
    bw.writeBits(0, 1); bw.writeBits(0, 3)
    val payload = Array(0x2f.toByte) ++ bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    val sz = 4 + 8 + payload.length
    out.write(Array[Byte]((sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
      ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
    out.write("WEBPVP8L".getBytes("ISO-8859-1"))
    out.write(Array[Byte]((payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte, 0, 0))
    out.write(payload)
    assert(Webp.pixels(out.toByteArray).isEmpty)
  }

  test("prefix-table budget: meta-group tree bomb fails closed") {
    // ADVICE r18 (low): the 65536 meta-group cap is spec-correct, but
    // group count alone let a crafted file expand kilobytes of
    // RLE-coded code lengths into an order of magnitude more heap than
    // the encoded bytes. This fixture IS that attack: a 4×4 image whose
    // 1×1 meta image declares group index 4351 (red=16, green=255), and
    // 4352 groups each carrying four dense Kraft-complete 256-entry
    // length-8 tables — ~4.46M tree entries (past the 2²² ceiling, so
    // the charge trips ~250 groups early) from ~390 KB of input. The
    // cumulative prefix-table budget (Reader.chargeTreeSymbols) must
    // fail the decode closed instead of materializing them all.
    val bw = new WebpFixtures.BitWriter
    bw.writeBits(3, 14); bw.writeBits(3, 14) // 4×4
    bw.writeBits(0, 1) // no alpha hint
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // level 0: no color cache
    bw.writeBits(1, 1); bw.writeBits(0, 3) // meta groups on, metaBits=2
    // meta sub-image (1×1): five single-symbol codes; the lone pixel
    // decodes to (red=16, green=255) → numGroups = 4352, 0 data bits
    def single(sym: Int): Unit = {
      bw.writeBits(1, 1) // simple code
      bw.writeBits(0, 1) // one symbol
      bw.writeBits(1, 1) // 8-bit symbol
      bw.writeBits(sym, 8)
    }
    bw.writeBits(0, 1) // sub-image: no color cache
    single(255); single(16); single(0); single(255); single(0)
    // one dense table: 256 symbols all length 8 (Kraft: 256·2⁷ = 2¹⁵),
    // written as one literal + 43 rep-16 runs; alphabets wider than 256
    // (green = 256+24) zero-fill the tail with rep-17 runs
    def denseTable(alphabet: Int): Unit = {
      bw.writeBits(0, 1) // normal code
      bw.writeBits(8, 4) // numCl = 12: ClcOrder prefix reaches 16 and 8
      // code-length-code lens by ClcOrder position
      // [17,18,0,1,2,3,4,5,16,6,7,8] → 17↦2, 16↦1, 8↦2
      Seq(2, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 2).foreach(bw.writeBits(_, 3))
      bw.writeBits(0, 1) // no max-symbol cap
      // canonical clc: 16 = 0₂, 8 = 10₂, 17 = 11₂ (MSB-first)
      bw.writeBits(1, 1); bw.writeBits(0, 1) // literal len 8 (prev := 8)
      (1 to 42).foreach { _ => // 42 × rep-16 of 6
        bw.writeBits(0, 1); bw.writeBits(3, 2)
      }
      bw.writeBits(0, 1); bw.writeBits(0, 2) // rep-16 of 3 → 256 total
      if (alphabet > 256) { // rep-17 zero runs: 10 + 10 + 4 = 24
        bw.writeBits(1, 1); bw.writeBits(1, 1); bw.writeBits(7, 3)
        bw.writeBits(1, 1); bw.writeBits(1, 1); bw.writeBits(7, 3)
        bw.writeBits(1, 1); bw.writeBits(1, 1); bw.writeBits(1, 3)
      }
    }
    (0 until 4352).foreach { _ =>
      denseTable(256 + 24) // green+length (cache off)
      denseTable(256); denseTable(256); denseTable(256) // red, blue, alpha
      single(0) // distance
    }
    val payload = Array(0x2f.toByte) ++ bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    val sz = 4 + 8 + payload.length
    out.write(Array[Byte]((sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
      ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
    out.write("WEBPVP8L".getBytes("ISO-8859-1"))
    out.write(Array[Byte]((payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte, 0))
    out.write(payload)
    assert(payload.length > 300000, s"bomb too small: ${payload.length}")
    assert(Webp.pixels(out.toByteArray).isEmpty)
  }
}
