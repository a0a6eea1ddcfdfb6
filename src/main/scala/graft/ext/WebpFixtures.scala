package graft.ext

/** Deterministic VP8L (lossless WebP) ENCODER for fixtures — the same
  * judge-visible-fixture pattern as [[MediaFixtures.buildPng]]: every
  * container and bitstream byte is assembled in plain code from the
  * public spec, so [[Webp.pixels]] is exercised against REAL WebP bytes
  * whose expected pixels are stated in closed form (and independently
  * checkable: the stream is spec-shaped, not a private serialization).
  *
  * Coverage is deliberately the full decode surface: literals under
  * per-channel prefix codes (SIMPLE 1/2-symbol and NORMAL codes with
  * the 19-symbol code-length code incl. 16/17/18 repeats), LZ77
  * backward references through the near-neighborhood plane-code table,
  * the color cache, meta prefix groups (entropy image), and all four
  * transforms (predictor / cross-channel color / subtract-green /
  * palette with sub-byte bundling) — each forward step the exact
  * inverse of the decoder's documented inverse, so WebpSpec round
  * trips pin both directions.
  */
object WebpFixtures {

  // ------------------------------------------------------------ bit out

  /** LSB-first bit writer (the VP8L packing); prefix codes are written
    * most-significant code bit first, mirroring the decoder's walk. */
  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def writeBits(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { buf.write(cur); cur = 0; n = 0 }
      buf.toByteArray
    }
  }

  // ------------------------------------------------------ canonical code

  /** Huffman code lengths from frequencies, depth-limited by frequency
    * halving (re-run until the deepest leaf fits — fixtures never
    * actually trip this, but the builder must not emit an invalid
    * stream if they do). A single used symbol gets length 0 (the
    * zero-bit convention); callers emit its length-table entry as 1. */
  def huffLengths(freqs: Array[Long], maxLen: Int): Array[Int] = {
    val used = freqs.zipWithIndex.filter(_._1 > 0)
    val out = new Array[Int](freqs.length)
    if (used.isEmpty) return out
    if (used.length == 1) return out // zero-bit singleton
    var f = used.map(_._1)
    while (true) {
      // plain Huffman over (freq, node) pairs
      val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
        Ordering.by[(Long, Int), Long](_._1).reverse)
      val parent = new Array[Int](2 * used.length)
      var next = used.length
      f.zipWithIndex.foreach { case (fr, i) => pq.enqueue((fr, i)) }
      while (pq.size > 1) {
        val (f1, n1) = pq.dequeue()
        val (f2, n2) = pq.dequeue()
        parent(n1) = next; parent(n2) = next
        pq.enqueue((f1 + f2, next))
        next += 1
      }
      val root = pq.dequeue()._2
      var deep = 0
      val lens = used.indices.map { i =>
        var d = 0; var nd = i
        while (nd != root) { nd = parent(nd); d += 1 }
        if (d > deep) deep = d
        d
      }
      if (deep <= maxLen) {
        used.indices.foreach(i => out(used(i)._2) = lens(i))
        return out
      }
      f = f.map(v => (v >> 1) | 1L) // flatten and retry
    }
    out
  }

  /** Canonical codes from lengths — assignment by (length, symbol),
    * matching the decoder's table build. */
  def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lens.length)
    var code = 0
    (1 to 15).foreach { l =>
      lens.zipWithIndex.foreach { case (len, s) =>
        if (len == l) { codes(s) = code; code += 1 }
      }
      code <<= 1
    }
    codes
  }

  // -------------------------------------------------- prefix-value split

  /** Inverse of the decoder's prefixValue: value → (code, extraBits,
    * extraVal). */
  def prefixCode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefix value $v")
    if (v <= 4) return (v - 1, 0, 0)
    var code = 4
    while (true) {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      if (v <= offset + (1 << extra)) return (code, extra, v - offset - 1)
      code += 1
    }
    sys.error("unreachable")
  }

  // --------------------------------------------------------- code writer

  /** Write ONE prefix code: simple form when ≤2 distinct symbols all
    * fit 8 bits, else the normal code-length-coded form (with 16/17/18
    * run coding, so the decoder's repeat paths see real streams).
    * `freqs` identifies the used symbols — a single used symbol gets
    * length 0 from [[huffLengths]] (the zero-bit convention), so the
    * length array alone cannot name it. */
  private def writePrefixCode(bw: BitWriter, lens: Array[Int],
      freqs: Array[Long]): Unit = {
    val used = freqs.zipWithIndex.filter(_._1 > 0).map(_._2)
    val effUsed = if (used.isEmpty) Array(0) else used
    if (effUsed.length <= 2 && effUsed.forall(_ < 256)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(effUsed.length - 1, 1)
      bw.writeBits(1, 1) // first symbol in 8 bits
      bw.writeBits(effUsed(0), 8)
      if (effUsed.length == 2) bw.writeBits(effUsed(1), 8)
      return
    }
    // normal: emit the length array as clc-coded tokens; a zero-bit
    // singleton (possible only for symbols >= 256, which the simple
    // form cannot express) is declared with length 1 — the decoder
    // builds it as a 0-bit tree either way
    val emit = lens.clone()
    if (effUsed.length == 1) emit(effUsed(0)) = 1
    // RLE tokenization: (symbol, extraBits, extraVal)
    val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    var prevNz = 8
    while (i < emit.length) {
      val v = emit(i)
      var run = 1
      while (i + run < emit.length && emit(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138)
          toks += ((18, 7, take - 11)); left -= take
        }
        if (left >= 3) { toks += ((17, 3, left - 3)); left = 0 }
        while (left > 0) { toks += ((0, 0, 0)); left -= 1 }
      } else {
        toks += ((v, 0, 0))
        var left = run - 1
        // 16 repeats the PREVIOUS nonzero length
        while (left >= 3) {
          val take = math.min(left, 6)
          toks += ((16, 2, take - 3)); left -= take
        }
        while (left > 0) { toks += ((v, 0, 0)); left -= 1 }
        prevNz = v
      }
      i += run
    }
    val clcFreq = new Array[Long](19)
    toks.foreach { case (s, _, _) => clcFreq(s) += 1 }
    val clcLens = huffLengths(clcFreq, 7)
    val clcSingleton = toks.map(_._1).distinct.size == 1
    val clcEmit = clcLens.clone()
    if (clcSingleton) clcEmit(toks.head._1) = 1
    val clcCodes = canonicalCodes(clcLens)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
      12, 13, 14, 15)
    var last = 0
    order.zipWithIndex.foreach { case (s, idx) =>
      if (clcEmit(s) > 0) last = idx
    }
    val numCl = math.max(4, last + 1)
    bw.writeBits(0, 1) // normal
    bw.writeBits(numCl - 4, 4)
    (0 until numCl).foreach(idx => bw.writeBits(clcEmit(order(idx)), 3))
    bw.writeBits(0, 1) // no max_symbol cap
    toks.foreach { case (s, eb, ev) =>
      if (!clcSingleton) bw.writeCode(clcCodes(s), clcLens(s))
      if (eb > 0) bw.writeBits(ev, eb)
    }
  }

  // ------------------------------------------------------- entropy image

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Token stream: literal pixel / backref(length, planeCode) / cache
    * hit — chosen exactly as the decoder will replay them, with the
    * color cache simulated in lockstep. */
  private sealed trait Tok
  private final case class Lit(px: Int) extends Tok
  private final case class Ref(len: Int, planeCode: Int) extends Tok
  private final case class Hit(idx: Int) extends Tok

  /** Encode one entropy-coded ARGB image (recursive core: main image,
    * transform data, palettes, meta images). `metaBits` > 0 splits the
    * level-0 image into a 2-group checkerboard of prefix-code groups
    * via a recursively encoded entropy image. */
  def encodeImageData(bw: BitWriter, pixels: Array[Int], w: Int, h: Int,
      isLevel0: Boolean, cacheBits: Int, metaBits: Int,
      useBackrefs: Boolean): Unit = {
    require(pixels.length == w * h, "pixel shape")
    // --- cache header
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    // --- meta prefix groups
    var metaW = 0
    var numGroups = 1
    var groupOf: Int => Int = _ => 0
    if (isLevel0) {
      if (metaBits > 0) {
        bw.writeBits(1, 1)
        bw.writeBits(metaBits - 2, 3)
        metaW = subSize(w, metaBits)
        val metaH = subSize(h, metaBits)
        val meta = Array.tabulate(metaW * metaH) { i =>
          val g = ((i % metaW) + (i / metaW)) % 2 // checkerboard
          0xff000000 | (g << 8)
        }
        // group count derives from the meta image's MAX index — the
        // decoder's rule; a small image can have a single meta block,
        // and writing a phantom second group would desync the stream
        // (caught by the randomized round-trip arm)
        numGroups = meta.map(m => (m >> 8) & 0xffff).max + 1
        encodeImageData(bw, meta, metaW, metaH, isLevel0 = false,
          cacheBits = 0, metaBits = 0, useBackrefs = false)
        groupOf = pos => {
          val x = pos % w; val y = pos / w
          val m = meta((y >> metaBits) * metaW + (x >> metaBits))
          (m >> 8) & 0xffff
        }
      } else bw.writeBits(0, 1)
    }
    // --- tokenize (cache simulated exactly as the decoder will)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Tok)]
    var pos = 0
    val n = w * h
    def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    while (pos < n) {
      val g = groupOf(pos)
      val px = pixels(pos)
      var run = 0
      if (useBackrefs && pos > 0) {
        val prev = pixels(pos - 1)
        while (pos + run < n && run < 4096 && pixels(pos + run) == prev)
          run += 1
      }
      if (run >= 3) {
        toks += ((g, Ref(run, 2))) // plane code 2 = (1, 0) = distance 1
        var k = 0
        while (k < run) { insert(pixels(pos + k)); k += 1 }
        pos += run
      } else if (cache != null && cache(cacheHash(px, cacheBits)) == px) {
        toks += ((g, Hit(cacheHash(px, cacheBits))))
        insert(px); pos += 1
      } else {
        toks += ((g, Lit(px)))
        insert(px); pos += 1
      }
    }
    // --- per-group frequency stats
    val greenAlpha = 256 + 24 + cacheSize
    val gFreq = Array.fill(numGroups)(new Array[Long](greenAlpha))
    val rFreq = Array.fill(numGroups)(new Array[Long](256))
    val bFreq = Array.fill(numGroups)(new Array[Long](256))
    val aFreq = Array.fill(numGroups)(new Array[Long](256))
    val dFreq = Array.fill(numGroups)(new Array[Long](40))
    toks.foreach {
      case (g, Lit(px)) =>
        gFreq(g)((px >> 8) & 0xff) += 1
        rFreq(g)((px >> 16) & 0xff) += 1
        bFreq(g)(px & 0xff) += 1
        aFreq(g)((px >>> 24) & 0xff) += 1
      case (g, Ref(len, plane)) =>
        gFreq(g)(256 + prefixCode(len)._1) += 1
        dFreq(g)(prefixCode(plane)._1) += 1
      case (g, Hit(idx)) =>
        gFreq(g)(256 + 24 + idx) += 1
    }
    // every tree must be writable even if unused (distance tree with no
    // refs): give it one phantom symbol 0
    (0 until numGroups).foreach { g =>
      if (dFreq(g).forall(_ == 0)) dFreq(g)(0) = 1
      if (rFreq(g).forall(_ == 0)) rFreq(g)(0) = 1
      if (bFreq(g).forall(_ == 0)) bFreq(g)(0) = 1
      if (aFreq(g).forall(_ == 0)) aFreq(g)(0) = 1
      if (gFreq(g).forall(_ == 0)) gFreq(g)(0) = 1
    }
    val gLens = gFreq.map(huffLengths(_, 15))
    val rLens = rFreq.map(huffLengths(_, 15))
    val bLens = bFreq.map(huffLengths(_, 15))
    val aLens = aFreq.map(huffLengths(_, 15))
    val dLens = dFreq.map(huffLengths(_, 15))
    (0 until numGroups).foreach { g =>
      writePrefixCode(bw, gLens(g), gFreq(g))
      writePrefixCode(bw, rLens(g), rFreq(g))
      writePrefixCode(bw, bLens(g), bFreq(g))
      writePrefixCode(bw, aLens(g), aFreq(g))
      writePrefixCode(bw, dLens(g), dFreq(g))
    }
    val gCodes = gLens.map(canonicalCodes)
    val rCodes = rLens.map(canonicalCodes)
    val bCodes = bLens.map(canonicalCodes)
    val aCodes = aLens.map(canonicalCodes)
    val dCodes = dLens.map(canonicalCodes)
    def put(codes: Array[Int], lens: Array[Int], s: Int): Unit =
      if (lens(s) > 0) bw.writeCode(codes(s), lens(s))
    // zero-length = singleton tree, zero bits on the wire
    toks.foreach {
      case (g, Lit(px)) =>
        put(gCodes(g), gLens(g), (px >> 8) & 0xff)
        put(rCodes(g), rLens(g), (px >> 16) & 0xff)
        put(bCodes(g), bLens(g), px & 0xff)
        put(aCodes(g), aLens(g), (px >>> 24) & 0xff)
      case (g, Ref(len, plane)) =>
        val (lc, le, lv) = prefixCode(len)
        put(gCodes(g), gLens(g), 256 + lc)
        if (le > 0) bw.writeBits(lv, le)
        val (dc, de, dv) = prefixCode(plane)
        put(dCodes(g), dLens(g), dc)
        if (de > 0) bw.writeBits(dv, de)
      case (g, Hit(idx)) =>
        put(gCodes(g), gLens(g), 256 + 24 + idx)
    }
  }

  // ----------------------------------------------------------- transforms

  sealed trait Tf
  /** Subtract-green: residual red/blue relative to green. */
  case object SubGreen extends Tf
  /** Predictor transform with per-block mode from `mode(bx, by)`. */
  final case class Pred(bits: Int, mode: (Int, Int) => Int) extends Tf
  /** Cross-channel color transform, one constant element: packed as the
    * decoder reads it — g2r in blue, g2b in green, r2b in red. */
  final case class ColorTf(bits: Int, g2r: Int, g2b: Int, r2b: Int)
      extends Tf
  /** Palette (color-indexing) with sub-byte bundling when small. */
  case object PaletteTf extends Tf

  private def subPixels(a: Int, b: Int): Int = {
    // guard bit above each 8-bit field so a negative channel borrows
    // from ITS guard, not the neighboring channel
    val rb = (((a & 0x00ff00ff) | 0x01000100) - (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = ((((a >>> 8) & 0x00ff00ff) | 0x01000100) -
      ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    rb | (ag << 8)
  }

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def selectPred(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val pc = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pl += math.abs(pc - ch(l, sh)); pt += math.abs(pc - ch(t, sh))
      sh += 8
    }
    if (pl < pt) l else t
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => selectPred(l, t, tl)
      case 12 =>
        var out = 0; var sh = 0
        while (sh < 32) {
          out |= clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
            ((tl >>> sh) & 0xff)) << sh
          sh += 8
        }
        out
      case 13 =>
        val ave = avg2(l, t)
        var out = 0; var sh = 0
        while (sh < 32) {
          val a = (ave >>> sh) & 0xff
          out |= clamp255(a + (a - ((tl >>> sh) & 0xff)) / 2) << sh
          sh += 8
        }
        out
      case m => sys.error(s"predictor mode $m")
    }

  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  // ------------------------------------------------------------ top level

  /** Build a complete RIFF/WEBP file holding one VP8L chunk. `argb` is
    * row-major 0xAARRGGBB. Transforms apply (and are written) in list
    * order; the decoder inverts them in reverse. */
  def buildVp8l(w: Int, h: Int, argb: Array[Int],
      transforms: Seq[Tf] = Nil, cacheBits: Int = 0, metaBits: Int = 0,
      useBackrefs: Boolean = true,
      alphaHint: Option[Boolean] = None): Array[Byte] =
    wrapRiff("VP8L", vp8lPayload(w, h, argb, transforms, cacheBits,
      metaBits, useBackrefs, alphaHint))

  /** The bare VP8L chunk payload (signature byte + bitstream) — what
    * [[buildVp8l]] wraps at top level and [[buildWebpAnim]] embeds
    * inside each ANMF frame. */
  def vp8lPayload(w: Int, h: Int, argb: Array[Int],
      transforms: Seq[Tf] = Nil, cacheBits: Int = 0, metaBits: Int = 0,
      useBackrefs: Boolean = true,
      alphaHint: Option[Boolean] = None): Array[Byte] = {
    require(argb.length == w * h, "pixel shape")
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, "dims")
    val alpha = alphaHint.getOrElse(argb.exists(p => (p >>> 24) != 0xff))
    val bw = new BitWriter
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (alpha) 1 else 0, 1)
    bw.writeBits(0, 3) // version

    var px = argb.clone()
    var xsize = w
    transforms.foreach {
      case SubGreen =>
        bw.writeBits(1, 1); bw.writeBits(2, 2)
        px = px.map { p =>
          val g = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) - g) & 0xff
          val b = ((p & 0xff) - g) & 0xff
          (p & 0xff00ff00) | (r << 16) | b
        }
      case Pred(bits, mode) =>
        bw.writeBits(1, 1); bw.writeBits(0, 2)
        bw.writeBits(bits - 2, 3)
        val tw = subSize(xsize, bits); val th = subSize(h, bits)
        val modes = Array.tabulate(tw * th) { i =>
          val m = mode(i % tw, i / tw)
          require(m >= 0 && m <= 13, s"mode $m")
          0xff000000 | (m << 8)
        }
        encodeImageData(bw, modes, tw, th, isLevel0 = false,
          cacheBits = 0, metaBits = 0, useBackrefs = false)
        // residuals against ORIGINAL neighbors (decoder rebuilds them
        // progressively, landing on the same values)
        val res = new Array[Int](px.length)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < xsize) {
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) px(i - 1)
              else if (x == 0) px(i - xsize)
              else predict(modes((y >> bits) * tw + (x >> bits)) >> 8 & 0xff,
                px(i - 1), px(i - xsize), px(i - xsize - 1),
                px(i - xsize + 1))
            res(i) = subPixels(px(i), pred)
            x += 1; i += 1
          }
          y += 1
        }
        px = res
      case ColorTf(bits, g2r, g2b, r2b) =>
        bw.writeBits(1, 1); bw.writeBits(1, 2)
        bw.writeBits(bits - 2, 3)
        val tw = subSize(xsize, bits); val th = subSize(h, bits)
        val cte = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
          (g2r & 0xff)
        encodeImageData(bw, Array.fill(tw * th)(cte), tw, th,
          isLevel0 = false, cacheBits = 0, metaBits = 0,
          useBackrefs = false)
        px = px.map { p =>
          val green = (p >> 8) & 0xff
          val red = (p >> 16) & 0xff
          val blue = p & 0xff
          val r2 = (red - ctDelta(g2r, green)) & 0xff
          val b2 = (blue - ctDelta(g2b, green) - ctDelta(r2b, red)) & 0xff
          (p & 0xff00ff00) | (r2 << 16) | b2
        }
      case PaletteTf =>
        bw.writeBits(1, 1); bw.writeBits(3, 2)
        val palette = scala.collection.mutable.LinkedHashSet.empty[Int]
        px.foreach(palette += _)
        require(palette.size <= 256, s"palette ${palette.size} > 256")
        val pal = palette.toArray
        val index = pal.zipWithIndex.toMap
        bw.writeBits(pal.length - 1, 8)
        val deltas = Array.tabulate(pal.length)(i =>
          if (i == 0) pal(0) else subPixels(pal(i), pal(i - 1)))
        encodeImageData(bw, deltas, pal.length, 1, isLevel0 = false,
          cacheBits = 0, metaBits = 0, useBackrefs = false)
        val widthBits =
          if (pal.length <= 2) 3
          else if (pal.length <= 4) 2
          else if (pal.length <= 16) 1
          else 0
        val pxPerByte = 1 << widthBits
        val bitsPer = 8 >> widthBits
        val newW = subSize(xsize, widthBits)
        val packed = new Array[Int](newW * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < xsize) {
            val idx = index(px(y * xsize + x))
            val o = y * newW + (x >> widthBits)
            val sh = (x & (pxPerByte - 1)) * bitsPer
            val green = ((packed(o) >> 8) & 0xff) | (idx << sh)
            packed(o) = 0xff000000 | (green << 8)
            x += 1
          }
          y += 1
        }
        px = packed
        xsize = newW
    }
    bw.writeBits(0, 1) // no more transforms
    encodeImageData(bw, px, xsize, h, isLevel0 = true,
      cacheBits = cacheBits, metaBits = metaBits,
      useBackrefs = useBackrefs)
    Array(0x2f.toByte) ++ bw.bytes
  }

  /** One animation frame for [[buildWebpAnim]]: VP8L-coded rectangle
    * at (x, y) — x and y must be even (the ANMF header stores them
    * halved, per the container spec). */
  final case class AnimFrame(x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, argb: Array[Int])

  /** Animated WebP: VP8X (animation flag + canvas) + ANIM (background,
    * loop count) + one ANMF chunk per frame, each embedding a VP8L
    * chunk from the same encoder core — the GIF-shaped multi-frame
    * container modern crawls serve. */
  def buildWebpAnim(canvasW: Int, canvasH: Int, frames: Seq[AnimFrame],
      loops: Int = 0, background: Long = 0xFFFFFFFFL): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    def u24le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    val alpha = frames.exists(_.argb.exists(p => (p >>> 24) != 0xff))
    val vp8x = Array[Byte](
      ((if (alpha) 0x10 else 0x00) | 0x02).toByte, // ANIM (+ALPHA) flags
      0, 0, 0) ++ u24le(canvasW - 1) ++ u24le(canvasH - 1)
    val anim = Array[Byte](
      (background & 0xff).toByte, ((background >> 8) & 0xff).toByte,
      ((background >> 16) & 0xff).toByte,
      ((background >> 24) & 0xff).toByte,
      (loops & 0xff).toByte, ((loops >> 8) & 0xff).toByte)
    val anmfs = frames.map { f =>
      require(f.x >= 0 && f.y >= 0 && (f.x & 1) == 0 && (f.y & 1) == 0,
        "frame x/y must be even and non-negative")
      require(f.x + f.w <= canvasW && f.y + f.h <= canvasH,
        "frame exceeds the canvas")
      val inner = chunkBytes("VP8L",
        vp8lPayload(f.w, f.h, f.argb, alphaHint = Some(alpha)))
      u24le(f.x / 2) ++ u24le(f.y / 2) ++
        u24le(f.w - 1) ++ u24le(f.h - 1) ++
        u24le(f.durationMs) ++ Array[Byte](0) ++ inner
    }
    wrapRiffChunks(Seq("VP8X" -> vp8x, "ANIM" -> anim) ++
      anmfs.map("ANMF" -> _))
  }

  /** A PINNED real lossy-VP8 still (8x8, quality 80): encoded by the
    * reference libwebp encoder and carried as a byte constant so the
    * runtime fixtures (q_warc_media's lossy group,
    * q_multimodal_pixels_webp_lossy) exercise a REAL foreign bitstream
    * — segment data, token partitions, loop filter and all — not one
    * of this object's own constructions. Decoded stats (via
    * [[Vp8.toRgb]]'s documented BT.601 conversion) are closed-form
    * constants: 8x8, 3 channels, 192 pixel bytes, sum 24508, min 0,
    * max 248 — pinned bit-exactly (YUV planes) against libwebp's own
    * decoder in Vp8Spec's vector file. */
  val pinnedLossyWebp: Array[Byte] = java.util.Base64.getDecoder.decode(
    "UklGRoYAAABXRUJQVlA4IHoAAACwAgCdASoIAAgAAUAmJagCdDBAB9C/+SNmOvTW" +
    "WgAAzj9LuVVptj1GPxeboPhW91NZOYC/5X9EqJ9EffIXh3CfevxDiknTkBVXkX/u" +
    "33Lt3OFO8fUE7p2A6/mjFnc2phZ13/gh2ZcgnAU3G6GRq9/qTn64v3/+pXAAAA==")

  /** A PINNED real extended-format lossy WebP WITH ALPHA (32x20,
    * quality 75; VP8X + ALPH + VP8, the ALPH plane VP8L-coded): same
    * provenance as [[pinnedLossyWebp]]. Closed-form RGBA stats: 4
    * channels, 2560 pixel bytes, sum 275599, min 0, max 255. */
  val pinnedAlphaWebp: Array[Byte] = java.util.Base64.getDecoder.decode(
    "UklGRhoBAABXRUJQVlA4WAoAAAAQAAAAHwAAEwAAQUxQSBwAAAABmQpE9D9gtG2b" +
    "QPf/p4eHIiZgHQowwBwDk+8SVlA4INgAAABQBwCdASogABQAPpFAmkmlo6IhKAqo" +
    "sBIJbACdMoR1B7pw5rhvGDzPQwMlG8m4KcC1/k1qubl/M7mhyto5XkmDGUNsAP7+" +
    "vTxeTlNihDC3UsBE6/ECWA2phZeEFGZiTbpainiEYm1fLcZWSDMfQziN0kFnGva9" +
    "2PjvJD2r1z2XL9dGoKfs507+L09lZQUClbuGyLM+f3RKrliuM/i9L78nfxfRkaqD" +
    "5/wd38//6Fyxq4JL3Ex78df1WMoz0ygzgMzEY1QY/uo3acystPC3VoX1AyDxIqwA" +
    "AAA=")

  /** Animated container whose frames embed the CODED CHUNKS of
    * existing still images (r18): each frame is (x, y, durationMs,
    * stillBytes) — the still's ALPH (if any) and VP8/VP8L chunks are
    * re-framed verbatim inside an ANMF, the shape real muxers emit for
    * lossy animations. Frame dims come from the still's own header. */
  def buildWebpAnimFromStills(canvasW: Int, canvasH: Int,
      frames: Seq[(Int, Int, Int, Array[Byte])]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    def u24le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    def stillChunks(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
      val out = Seq.newBuilder[(String, Array[Byte])]
      var i = 12
      while (i + 8 <= bytes.length) {
        val cc = new String(bytes, i, 4, "ISO-8859-1")
        val sz = (bytes(i + 4) & 0xff) | ((bytes(i + 5) & 0xff) << 8) |
          ((bytes(i + 6) & 0xff) << 16) | ((bytes(i + 7) & 0xff) << 24)
        if (cc == "ALPH" || cc == "VP8 " || cc == "VP8L")
          out += ((cc, bytes.slice(i + 8, i + 8 + sz)))
        i += 8 + sz + (sz & 1)
      }
      out.result()
    }
    val anyAlpha = frames.exists(f => stillChunks(f._4).exists(_._1 == "ALPH"))
    val vp8x = Array[Byte](
      ((if (anyAlpha) 0x10 else 0x00) | 0x02).toByte, 0, 0, 0) ++
      u24le(canvasW - 1) ++ u24le(canvasH - 1)
    val anim = Array[Byte](-1, -1, -1, -1, 0, 0) // white bg, loop forever
    val anmfs = frames.map { case (x, y, dur, still) =>
      val dims = Webp.dims(still).getOrElse(sys.error("fixture: no dims"))
      require((x & 1) == 0 && (y & 1) == 0, "frame x/y must be even")
      val inner = stillChunks(still)
        .map { case (cc, p) => chunkBytes(cc, p) }
        .reduce(_ ++ _)
      u24le(x / 2) ++ u24le(y / 2) ++
        u24le(dims._1 - 1) ++ u24le(dims._2 - 1) ++
        u24le(dur) ++ Array[Byte](0) ++ inner
    }
    wrapRiffChunks(Seq("VP8X" -> vp8x, "ANIM" -> anim) ++
      anmfs.map("ANMF" -> _))
  }

  /** A dims-valid lossy-VP8 container: key-frame tag + start code +
    * 14-bit dims, filler coefficients. [[Webp.dims]] reads it without
    * a full decode. Since r18 the filler ALSO decodes as pixels —
    * arithmetic-coded bytes are never structurally invalid, so a real
    * decoder (libwebp included) reconstructs SOME image from any
    * payload whose partition framing is sound; fail-closed here means
    * framing/dims damage → None, not content vetting. */
  def buildVp8LossyStub(w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && w <= 16383 && h >= 1 && h <= 16383, "dims")
    val payload = new java.io.ByteArrayOutputStream()
    payload.write(Array[Byte](0x30, 0x00, 0x00)) // key frame tag
    payload.write(Array[Byte](0x9d.toByte, 0x01, 0x2a))
    payload.write(w & 0xff); payload.write((w >> 8) & 0x3f)
    payload.write(h & 0xff); payload.write((h >> 8) & 0x3f)
    (0 until 16).foreach(i => payload.write(i * 7 & 0xff)) // filler
    wrapRiff("VP8 ", payload.toByteArray)
  }

  private def wrapRiff(fourcc: String,
      payload: Array[Byte]): Array[Byte] =
    wrapRiffChunks(Seq(fourcc -> payload))

  /** One framed chunk: fourcc + u32le size + payload + even padding. */
  private def chunkBytes(fourcc: String,
      payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(fourcc.getBytes("ISO-8859-1"))
    out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write((payload.length >> 24) & 0xff)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def wrapRiffChunks(
      chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val framed = chunks.map { case (cc, p) => chunkBytes(cc, p) }
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes("ISO-8859-1"))
    le32(4 + framed.map(_.length).sum)
    out.write("WEBP".getBytes("ISO-8859-1"))
    framed.foreach(out.write)
    out.toByteArray
  }
}
