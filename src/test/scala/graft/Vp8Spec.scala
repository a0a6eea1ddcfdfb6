package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Multimodal, Vp8, Webp}

/** The from-scratch RFC 6386 (lossy WebP / VP8) key-frame decoder,
  * gated BIT-EXACTLY against the reference implementation: the pinned
  * vectors in `vp8_vectors.json` are real VP8 streams produced by the
  * system libwebp encoder (across quality levels 5..95 — i.e. the full
  * quantizer range — segmentation, odd dims, B_PRED-heavy noise, and
  * extended-format alpha), each stored WITH libwebp's own
  * `WebPDecodeYUV` output. The decoder must reproduce every Y/U/V
  * plane byte for byte — intra prediction, dequant clamps, token
  * trees, and the loop filter all have to be exactly right for even
  * one vector to pass. Alpha vectors additionally pin the ALPH plane
  * against libwebp's RGBA decode. */
class Vp8Spec extends AnyFunSuite {

  private final case class Vec(name: String, webp: Array[Byte], w: Int,
      h: Int, y: Array[Byte], u: Array[Byte], v: Array[Byte],
      a: Option[Array[Byte]])

  private lazy val vectors: Seq[Vec] = {
    val in = getClass.getResourceAsStream("/vp8_vectors.json")
    assert(in != null, "vp8_vectors.json resource missing")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(txt)
    val b64 = java.util.Base64.getDecoder
    (0 until root.size()).map { i =>
      val n = root.get(i)
      Vec(n.get("name").asText(), b64.decode(n.get("webp").asText()),
        n.get("w").asInt(), n.get("h").asInt(),
        b64.decode(n.get("y").asText()), b64.decode(n.get("u").asText()),
        b64.decode(n.get("v").asText()),
        Option(n.get("a")).map(a => b64.decode(a.asText())))
    }
  }

  private def firstDiff(tag: String, got: Array[Byte],
      want: Array[Byte], w: Int): String = {
    val i = got.indices.find(i => got(i) != want(i)).getOrElse(-1)
    if (i < 0) s"$tag: lengths ${got.length} vs ${want.length}"
    else s"$tag: first diff at ($i = ${i % w},${i / w}): " +
      s"got ${got(i) & 0xff}, want ${want(i) & 0xff}"
  }

  test("pinned libwebp streams: Y/U/V planes decode bit-exactly") {
    assert(vectors.nonEmpty)
    vectors.foreach { vec =>
      val yuv = Webp.lossyPlanes(vec.webp)
        .getOrElse(fail(s"${vec.name}: no decode"))
      assert(yuv.width == vec.w && yuv.height == vec.h, vec.name)
      val cw = (vec.w + 1) / 2
      assert(java.util.Arrays.equals(yuv.y, vec.y),
        s"${vec.name} ${firstDiff("Y", yuv.y, vec.y, vec.w)}")
      assert(java.util.Arrays.equals(yuv.u, vec.u),
        s"${vec.name} ${firstDiff("U", yuv.u, vec.u, cw)}")
      assert(java.util.Arrays.equals(yuv.v, vec.v),
        s"${vec.name} ${firstDiff("V", yuv.v, vec.v, cw)}")
    }
  }

  test("extended-format alpha: ALPH plane matches libwebp's RGBA decode") {
    val withAlpha = vectors.filter(_.a.isDefined)
    assert(withAlpha.nonEmpty, "no alpha vectors pinned")
    withAlpha.foreach { vec =>
      val img = Webp.pixels(vec.webp)
        .getOrElse(fail(s"${vec.name}: no pixels"))
      assert(img.channels == 4, s"${vec.name}: expected RGBA")
      val alpha = Array.tabulate(vec.w * vec.h)(i =>
        img.pixels(i * 4 + 3))
      assert(java.util.Arrays.equals(alpha, vec.a.get),
        s"${vec.name} ${firstDiff("A", alpha, vec.a.get, vec.w)}")
    }
  }

  test("decodeStatus: real lossy WebP classes ok; damage classes corrupt") {
    val still = vectors.find(_.a.isEmpty).get
    val (st, img) = Multimodal.decodeStatus(still.webp)
    assert(st == "ok" && img.exists(i =>
      i.width == still.w && i.height == still.h))
    // structural damage (truncated partitions) fails closed
    val cut = still.webp.take(24)
    assert(Multimodal.decodeStatus(cut)._1 == "corrupt")
  }

  test("animated WebP with LOSSY frames decodes real pixels per frame") {
    // real muxers re-frame a still's coded chunks inside ANMF; the r18
    // lossy path must land the SAME pixels there as on the still path,
    // including a per-frame ALPH plane
    import graft.ext.WebpFixtures
    val still = WebpFixtures.pinnedLossyWebp // 8x8 RGB
    val alpha = WebpFixtures.pinnedAlphaWebp // 32x20 RGBA (ALPH + VP8)
    val anim = WebpFixtures.buildWebpAnimFromStills(32, 28, Seq(
      (0, 0, 40, still), (0, 8, 70, alpha)))
    val frames = Webp.frames(anim).getOrElse(fail("no frames"))
    assert(frames.map(f => (f.index, f.x, f.y, f.width, f.height,
      f.duration_ms, f.channels)) ==
      Seq((0, 0, 0, 8, 8, 40, 3), (1, 0, 8, 32, 20, 70, 4)))
    val stillPx = Webp.pixels(still).get
    assert(java.util.Arrays.equals(frames(0).pixels, stillPx.pixels))
    val alphaPx = Webp.pixels(alpha).get
    assert(java.util.Arrays.equals(frames(1).pixels, alphaPx.pixels))
    // the mixed container sniffs lossy and censuses ok via the frame
    // path (no top-level still chunk exists)
    assert(Multimodal.sniffFormat(anim).contains("webp-lossy"))
    assert(Multimodal.decodeStatus(anim)._1 == "ok")
    // damage the SECOND frame's ALPH: whole decode fails closed
    val bad = anim.clone()
    val alphSig = "ALPH".getBytes("ISO-8859-1")
    val alphAt = bad.indices.drop(30).find(i => i + 4 < bad.length &&
      bad.slice(i, i + 4).sameElements(alphSig)).get
    (12 until 22).foreach(k =>
      bad(alphAt + 8 + k) = (bad(alphAt + 8 + k) ^ 0xff).toByte)
    assert(Webp.frames(bad).isEmpty)
    assert(Multimodal.decodeStatus(bad)._1 == "corrupt")
  }

  test("present-but-damaged ALPH fails the decode closed (corrupt, not RGB)") {
    // silently dropping a damaged alpha plane would census broken
    // transparency as a clean RGB image
    val vec = vectors.find(_.a.isDefined).get
    val bytes = vec.webp.clone()
    var i = 12
    var alphOff = -1
    while (alphOff < 0 && i + 8 <= bytes.length) {
      val cc = new String(bytes, i, 4, "ISO-8859-1")
      val sz = (bytes(i + 4) & 0xff) | ((bytes(i + 5) & 0xff) << 8) |
        ((bytes(i + 6) & 0xff) << 16) | ((bytes(i + 7) & 0xff) << 24)
      if (cc == "ALPH") alphOff = i + 8
      else i += 8 + sz + (sz & 1)
    }
    assert(alphOff > 0, "vector lacks an ALPH chunk")
    // wreck the lossless alpha stream beyond entropy-code recovery
    (5 until 17).foreach(k =>
      bytes(alphOff + k) = (bytes(alphOff + k) ^ 0xff).toByte)
    assert(Webp.pixels(bytes).isEmpty,
      "damaged ALPH must fail the decode, not drop to RGB")
    assert(Multimodal.decodeStatus(bytes)._1 == "corrupt")
    // the undamaged original still decodes RGBA, of course
    assert(Webp.pixels(vec.webp).exists(_.channels == 4))
  }

  test("fuzz: random bytes, bit flips, truncations never throw") {
    val rnd = new scala.util.Random(1812)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Vp8.decodePlanes(b, 0, b.length) // must not throw
    }
    val real = vectors.head.webp
    (0 until 300).foreach { i =>
      val b = real.clone()
      val bit = (i * 2654435761L % (b.length * 8L)).toInt
      b(bit / 8) = (b(bit / 8) ^ (1 << (bit % 8))).toByte
      Webp.pixels(b) // any result is fine; throwing is not
    }
    (0 until real.length by 5).foreach { n =>
      Webp.pixels(real.take(n)); Webp.lossyPlanes(real.take(n))
    }
  }
}
