package graft.ext

/** REAL WebP decode — pure JVM, no codec libraries (VERDICT r16 #1: a
  * modern crawl's image-mime responses are heavily WebP; the multimodal
  * tier must at least decode the LOSSLESS coding and read dimensions
  * from all container variants).
  *
  * Implements, from the public container/bitstream specifications
  * (RIFF container spec + the WebP Lossless Bitstream Specification,
  * now RFC 9649):
  *
  *   - RIFF container walk: `VP8L` (lossless), `VP8 ` (lossy), `VP8X`
  *     (extended — canvas dims + feature flags) chunks;
  *   - header DIMENSIONS for all three ([[dims]]);
  *   - FULL VP8L pixel decode ([[pixels]]): LSB-first bit reading,
  *     canonical prefix codes (simple 1/2-symbol AND normal codes with
  *     the 19-symbol code-length code, 16/17/18 repeats, and the
  *     optional max_symbol cap), color cache, LZ77 backward references
  *     (both the 120-entry near-neighborhood plane-code table and
  *     direct distances), meta prefix groups via a recursively decoded
  *     entropy image, and ALL FOUR transforms inverted in reverse read
  *     order: PREDICTOR (14 modes incl. Select and the clamped
  *     add/subtract pair), cross-channel COLOR, SUBTRACT_GREEN, and
  *     COLOR_INDEXING (delta-coded palette + sub-byte pixel bundling).
  *
  *   - FULL VP8 (lossy) key-frame pixel decode since r18 — delegated
  *     to [[Vp8]] (RFC 6386: boolean decoder, intra prediction,
  *     iDCT/iWHT, loop filter), bit-exact against libwebp's own YUV
  *     output on pinned real streams — plus the extended format's
  *     `ALPH` alpha plane (raw or headerless-VP8L coded, all four
  *     prediction filters).
  *
  * Hardening contract matches every other decoder in the multimodal
  * tier ([[Multimodal.pngPixels]] doc): adversarial bytes (lying chunk
  * sizes, truncated streams, over-long prefix codes, out-of-range
  * backrefs) return None — never throw, never over-allocate (pixel
  * buffers are bounded by the declared 14-bit dims, ≤ 16384², checked
  * against a sanity budget before allocation).
  *
  * Scale shape: a per-blob CPU kernel — belongs inside the same
  * partition-batched body as the PNG/JPEG kernels (decode-after-dedup
  * in q_warc_media), no shuffle, no driver involvement.
  */
object Webp {

  import Multimodal.RawImage

  private def safely[T](body: => Option[T]): Option[T] =
    try body catch { case scala.util.control.NonFatal(_) => None }

  /** True if the bytes carry the RIFF/WEBP container magic. */
  def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' &&
      bytes(11) == 'P'

  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  /** Top-level chunks as (fourcc, payloadOffset, payloadLength), bounds
    * clamped to the actual byte array (a lying RIFF size must not read
    * out of bounds). */
  private def chunks(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
    if (!isWebp(bytes)) return Seq.empty
    val out = Seq.newBuilder[(String, Int, Int)]
    // LONG walk index: a junk chunk declaring a size near 2^32 must
    // advance past the end and STOP, not overflow Int back into range
    // and throw away the valid chunks already collected (r17 review)
    var i = 12L
    while (i + 8 <= bytes.length) {
      val fourcc = new String(bytes, i.toInt, 4, "ISO-8859-1")
      val sz = u32le(bytes, i.toInt + 4)
      val off = i + 8
      val len = math.min(sz, bytes.length - off)
      if (len < 0) return out.result()
      out += ((fourcc, off.toInt, len.toInt))
      i = off + sz + (sz & 1) // chunks pad to even size
    }
    out.result()
  }

  /** Container-level coding classification from the ACTUAL chunk walk
    * (never substring sniffing — compressed payload bytes can contain
    * any fourcc): `webp-vp8l` when a VP8L chunk is present (still or
    * inside an ANMF frame's subchunks), `webp-lossy` when only
    * VP8/VP8X-coded content exists, `webp` for a container with
    * neither. None for non-WebP bytes. */
  def codedFormat(bytes: Array[Byte]): Option[String] =
    if (!isWebp(bytes)) None
    else safely {
      val cs = chunks(bytes)
      def anmfHasVp8l: Boolean = cs.exists { case (cc, off, len) =>
        cc == "ANMF" && len >= 24 && {
          var i = off + 16
          val end = off + len
          var found = false
          var guard = 0
          while (!found && i + 8 <= end && guard < 64) {
            val sub = new String(bytes, i, 4, "ISO-8859-1")
            val sz = u32le(bytes, i + 4)
            if (sub == "VP8L") found = true
            else if (sz < 0 || i + 8 + sz > end) i = end
            else i += 8 + sz.toInt + (sz.toInt & 1)
            guard += 1
          }
          found
        }
      }
      Some(
        if (cs.exists(_._1 == "VP8L") || anmfHasVp8l) "webp-vp8l"
        else if (cs.exists(c => c._1 == "VP8 " || c._1 == "VP8X"))
          "webp-lossy"
        else "webp")
    }

  /** (width, height, channels) from whichever coded chunk is present.
    * VP8X wins (it declares the full canvas and the alpha flag); else
    * VP8L header bits; else the VP8 key-frame header. */
  def dims(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    safely {
      val cs = chunks(bytes)
      cs.collectFirst {
        case ("VP8X", off, len) if len >= 10 =>
          val alpha = (bytes(off) & 0x10) != 0
          (u24le(bytes, off + 4) + 1, u24le(bytes, off + 7) + 1,
            if (alpha) 4 else 3)
      }.orElse(cs.collectFirst {
        case ("VP8L", off, len) if len >= 5 && (bytes(off) & 0xff) == 0x2f =>
          val b1 = bytes(off + 1) & 0xff; val b2 = bytes(off + 2) & 0xff
          val b3 = bytes(off + 3) & 0xff; val b4 = bytes(off + 4) & 0xff
          val w = 1 + (b1 | ((b2 & 0x3f) << 8))
          val h = 1 + ((b2 >> 6) | (b3 << 2) | ((b4 & 0x0f) << 10))
          val alpha = (b4 & 0x10) != 0
          (w, h, if (alpha) 4 else 3)
      }).orElse(cs.collectFirst {
        // VP8 key frame: 3-byte frame tag, start code 9D 01 2A, then
        // 14-bit width/height in little-endian u16s
        case ("VP8 ", off, len) if len >= 10 &&
            (bytes(off + 3) & 0xff) == 0x9d &&
            (bytes(off + 4) & 0xff) == 0x01 &&
            (bytes(off + 5) & 0xff) == 0x2a =>
          val w = ((bytes(off + 6) & 0xff) |
            ((bytes(off + 7) & 0xff) << 8)) & 0x3fff
          val h = ((bytes(off + 8) & 0xff) |
            ((bytes(off + 9) & 0xff) << 8)) & 0x3fff
          (w, h, 3)
      }).filter(d => d._1 > 0 && d._2 > 0)
    }

  /** Full pixel decode of a STILL image — VP8L (lossless) or, since
    * r18, lossy VP8 key frames ([[Vp8]], RFC 6386) including the
    * extended format's `ALPH` alpha plane; None for animation-only
    * containers or damaged streams. Output channels: VP8L follows the
    * header's alpha-hint bit; lossy is RGB, or RGBA when an ALPH
    * chunk decodes. */
  def pixels(bytes: Array[Byte]): Option[RawImage] =
    safely {
      chunks(bytes).collectFirst {
        case ("VP8L", off, len) if len >= 5 => decodeVp8l(bytes, off, len)
      }.flatten
    }.orElse(lossyPixels(bytes))

  /** Lossy (VP8-coded) still pixels + optional ALPH alpha. A PRESENT
    * but undecodable ALPH chunk fails the whole decode (fail closed —
    * silently dropping transparency would census damaged alpha as a
    * clean RGB image). */
  private def lossyPixels(bytes: Array[Byte]): Option[RawImage] =
    safely {
      val cs = chunks(bytes)
      cs.collectFirst { case ("VP8 ", off, len) if len >= 10 =>
        Vp8.decodePlanes(bytes, off, len).flatMap { yuv =>
          cs.collectFirst {
            case ("ALPH", aOff, aLen) if aLen >= 1 => (aOff, aLen)
          } match {
            case Some((aOff, aLen)) =>
              decodeAlph(bytes, aOff, aLen, yuv.width, yuv.height)
                .map(a => Vp8.toRgb(yuv, Some(a)))
            case None => Some(Vp8.toRgb(yuv, None))
          }
        }
      }.flatten
    }

  /** Decoded planes of the lossy still coding (test hook: Vp8Spec
    * compares these bit-exactly against libwebp's own YUV output on
    * pinned real streams). */
  private[graft] def lossyPlanes(bytes: Array[Byte]): Option[Vp8.Yuv] =
    safely {
      chunks(bytes).collectFirst { case ("VP8 ", off, len) if len >= 10 =>
        Vp8.decodePlanes(bytes, off, len)
      }.flatten
    }

  /** ALPH chunk decode (WebP container spec "Alpha"): header byte =
    * (reserved:2, preprocessing:2, filtering:2, compression:2);
    * compression 0 = raw w*h plane, 1 = a HEADERLESS VP8L stream whose
    * green channel carries alpha; then the inverse of the per-row
    * prediction filter (none/horizontal/vertical/gradient).
    * Preprocessing (level reduction) needs no inverse per spec. */
  private[ext] def decodeAlph(bytes: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[Array[Byte]] =
    safely {
      if (w.toLong * h > (1L << 26)) sys.error("alph: budget")
      val hdr = bytes(off) & 0xff
      val method = hdr & 3
      val filter = (hdr >> 2) & 3
      val plane: Array[Byte] = method match {
        case 0 =>
          if (len - 1 < w * h) sys.error("alph: short raw plane")
          java.util.Arrays.copyOfRange(bytes, off + 1, off + 1 + w * h)
        case 1 =>
          val argb = decodeVp8lBody(
            new Reader(bytes, off + 1, off + len), w, h)
          val out = new Array[Byte](w * h)
          var i = 0
          while (i < out.length) {
            out(i) = ((argb(i) >> 8) & 0xff).toByte; i += 1
          }
          out
        case _ => sys.error("alph: reserved compression method")
      }
      // inverse filters, row-major in place (libwebp filters.c
      // semantics: row 0 seeds horizontal from 0, later rows seed from
      // the pixel above; vertical's row 0 degrades to horizontal)
      def u(i: Int): Int = plane(i) & 0xff
      filter match {
        case 0 => ()
        case 1 => // horizontal
          var y = 0
          while (y < h) {
            var pred = if (y == 0) 0 else u((y - 1) * w)
            var x = 0
            while (x < w) {
              plane(y * w + x) = ((pred + u(y * w + x)) & 0xff).toByte
              pred = u(y * w + x)
              x += 1
            }
            y += 1
          }
        case 2 => // vertical (row 0: horizontal)
          var x = 1
          var pred = 0
          while (x < w) {
            plane(x) = ((u(x - 1) + u(x)) & 0xff).toByte; x += 1
          }
          pred = 0
          var y = 1
          while (y < h) {
            x = 0
            while (x < w) {
              plane(y * w + x) =
                ((u((y - 1) * w + x) + u(y * w + x)) & 0xff).toByte
              x += 1
            }
            y += 1
          }
        case _ => // gradient (row 0: horizontal)
          var x = 1
          while (x < w) {
            plane(x) = ((u(x - 1) + u(x)) & 0xff).toByte; x += 1
          }
          var y = 1
          while (y < h) {
            var topLeft = u((y - 1) * w)
            var left = u((y - 1) * w) // seeds the row like libwebp
            x = 0
            while (x < w) {
              val top = u((y - 1) * w + x)
              val g = left + top - topLeft
              val pred = if (g < 0) 0 else if (g > 255) 255 else g
              left = (pred + u(y * w + x)) & 0xff
              plane(y * w + x) = left.toByte
              topLeft = top
              x += 1
            }
            y += 1
          }
      }
      Some(plane)
    }

  /** One decoded animation frame: geometry on the canvas + duration +
    * the frame's OWN pixels (row-major, `channels` per px). Like
    * [[Multimodal.GifFrame]], disposal/blend compositing is
    * deliberately not applied — each frame decodes independently (the
    * per-frame feature-extraction shape). Lossy (VP8-coded) frames
    * decode for real since r18 (the [[Vp8]] key-frame path, incl. a
    * per-frame ALPH plane). */
  final case class Frame(index: Int, x: Int, y: Int, width: Int,
      height: Int, duration_ms: Int, channels: Int, pixels: Array[Byte])

  /** Animated-WebP frame decode: VP8X (animation flag) + ANMF chunks,
    * each frame's embedded VP8L bitstream decoded by the same core as
    * [[pixels]]. None for still images (use [[pixels]]) and non-WebP
    * bytes; a damaged FRAME fails the whole decode closed (None) —
    * the ingest-gate contract, matching [[Multimodal.gifFrames]]. */
  def frames(bytes: Array[Byte]): Option[Seq[Frame]] =
    safely {
      val cs = chunks(bytes)
      val animated = cs.exists { case (cc, off, len) =>
        cc == "VP8X" && len >= 1 && (bytes(off) & 0x02) != 0 }
      if (!animated) None
      else {
        val anmfs = cs.filter(_._1 == "ANMF")
        if (anmfs.isEmpty) sys.error("webp: animation without frames")
        Some(anmfs.zipWithIndex.map { case ((_, off, len), idx) =>
          if (len < 16) sys.error("webp: short ANMF header")
          val x = u24le(bytes, off) * 2
          val y = u24le(bytes, off + 3) * 2
          val w = u24le(bytes, off + 6) + 1
          val h = u24le(bytes, off + 9) + 1
          val dur = u24le(bytes, off + 12)
          // frame data: standard subchunks after the 16-byte header
          // (an ALPH subchunk, when present, precedes the VP8 one)
          var i = off + 16
          val end = off + len
          var frame: Option[Frame] = None
          var alph: Option[(Int, Int)] = None
          while (frame.isEmpty && i + 8 <= end) {
            val cc = new String(bytes, i, 4, "ISO-8859-1")
            val sz = u32le(bytes, i + 4)
            if (sz < 0 || i + 8 + sz > end) sys.error("webp: ANMF subchunk")
            if (cc == "VP8L") {
              val img = decodeVp8l(bytes, i + 8, sz.toInt)
                .getOrElse(sys.error("webp: damaged VP8L frame"))
              if (img.width != w || img.height != h)
                sys.error("webp: frame dims disagree with ANMF header")
              frame = Some(Frame(idx, x, y, w, h, dur, img.channels,
                img.pixels))
            } else if (cc == "VP8 ") {
              // lossy frames decode for real since r18 (RFC 6386)
              val yuv = Vp8.decodePlanes(bytes, i + 8, sz.toInt)
                .getOrElse(sys.error("webp: damaged VP8 frame"))
              if (yuv.width != w || yuv.height != h)
                sys.error("webp: frame dims disagree with ANMF header")
              // a present-but-damaged per-frame ALPH fails the whole
              // decode closed, like a damaged frame bitstream
              val alpha = alph.map { case (aOff, aLen) =>
                decodeAlph(bytes, aOff, aLen, w, h)
                  .getOrElse(sys.error("webp: damaged ALPH frame")) }
              val img = Vp8.toRgb(yuv, alpha)
              frame = Some(Frame(idx, x, y, w, h, dur, img.channels,
                img.pixels))
            } else {
              if (cc == "ALPH") alph = Some((i + 8, sz.toInt))
              i += 8 + sz.toInt + (sz.toInt & 1)
            }
          }
          frame.getOrElse(sys.error("webp: ANMF without image data"))
        })
      }
    }

  // ---------------------------------------------------------- bit input

  /** LSB-first bit reader over the VP8L payload slice; reading past the
    * end throws (caught by [[safely]] → None, the fail-closed gate). */
  private[ext] final class Reader(bytes: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var cur = 0
    private var nbits = 0
    /** Cumulative prefix-TREE materialization budget (ADVICE r18, low):
      * the 65536 meta-group cap is spec-correct, but group count alone
      * let a crafted file expand kilobytes of RLE-coded code lengths
      * into hundreds of MB of tree entries (each rep-18 run costs ~10
      * bits and yields 138 symbol slots). Real tables cost input BITS
      * roughly in proportion to the entries they declare, so the budget
      * is input-length-proportional with an absolute ceiling: 64
      * entries per encoded byte (≈4× the densest KRAFT-COMPLETE
      * expansion the wire format permits — rep-16 chains top out at 6
      * lengths per 3 bits = 16 entries/byte, and the completeness check
      * in buildTree forbids cheaper zero-runs from materializing), and
      * at most 2²² entries total (≈50 MB of tree heap at this Tree's
      * ~12 B/entry — well inside the decoder's existing 64M-px output
      * budget, never an order above it). The charge is CUMULATIVE
      * across every group and recursive sub-image decoded from this
      * reader, so splitting the attack across groups buys nothing. */
    private var symBudget: Long =
      math.max(1L << 16, math.min(64L * (end - start), 1L << 22))
    private[ext] def chargeTreeSymbols(n: Int): Unit = {
      symBudget -= n
      if (symBudget < 0) sys.error("vp8l: prefix-table budget")
    }
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= end) sys.error("vp8l: EOF")
        cur = bytes(pos) & 0xff; pos += 1; nbits = 8
      }
      val b = cur & 1; cur >>= 1; nbits -= 1; b
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  // ------------------------------------------------------- prefix codes

  /** Canonical prefix-code table. `single` >= 0 marks the 0-bit
    * one-symbol code. Built from (symbol, length) pairs in ASSIGNMENT
    * order — normal codes list symbols ascending, simple 2-symbol codes
    * keep their listed order (first listed symbol gets code 0). */
  private final class Tree(val counts: Array[Int], val syms: Array[Int],
      val single: Int)

  private def buildTree(pairs: Seq[(Int, Int)]): Tree = {
    val used = pairs.filter(_._2 > 0)
    if (used.isEmpty) sys.error("vp8l: empty code")
    if (used.size == 1) return new Tree(null, null, used.head._1)
    val counts = new Array[Int](16)
    used.foreach { case (_, l) =>
      if (l > 15) sys.error("vp8l: length > 15")
      counts(l) += 1
    }
    // completeness (Kraft equality) — a lying code would desync the
    // whole stream, fail closed instead
    var kraft = 0L
    (1 to 15).foreach(l => kraft += counts(l).toLong << (15 - l))
    if (kraft != (1L << 15)) sys.error("vp8l: incomplete code")
    val syms = used.sortBy(_._2).map(_._1).toArray // stable: keeps order
    new Tree(counts, syms, -1)
  }

  private def decodeSym(r: Reader, t: Tree): Int = {
    if (t.single >= 0) return t.single
    var code = 0; var first = 0; var index = 0
    var len = 1
    while (len <= 15) {
      code = (code << 1) | r.readBit()
      val c = t.counts(len)
      if (code - first < c) return t.syms(index + code - first)
      index += c
      first = (first + c) << 1
      len += 1
    }
    sys.error("vp8l: over-long code")
  }

  /** Code-length-code symbol order (spec §"Normal Code Length Code"). */
  private val ClcOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  /** One prefix code: 1 bit simple/normal, then either the 1-2 literal
    * symbols or the RLE-coded length array. */
  private def readCode(r: Reader, alphabetSize: Int): Tree = {
    if (r.readBits(1) == 1) { // simple
      val numSymbols = r.readBits(1) + 1
      val first8 = r.readBits(1)
      val s0 = r.readBits(if (first8 == 1) 8 else 1)
      if (numSymbols == 1) buildTree(Seq((s0, 1)))
      else {
        val s1 = r.readBits(8)
        buildTree(Seq((s0, 1), (s1, 1)))
      }
    } else {
      val numCl = r.readBits(4) + 4
      if (numCl > ClcOrder.length) sys.error("vp8l: clc count")
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClcOrder(i)) = r.readBits(3); i += 1 }
      val clTree = buildTree((0 until 19).map(s => (s, clLens(s)))
        .filter(_._2 > 0))
      // optional cap on the number of symbols READ from the stream
      var maxSymbol =
        if (r.readBits(1) == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = decodeSym(r, clTree)
        if (s < 16) {
          lens(sym) = s; sym += 1
          if (s != 0) prev = s
        } else {
          val (rep, value) = s match {
            case 16 => (3 + r.readBits(2), prev)
            case 17 => (3 + r.readBits(3), 0)
            case _ => (11 + r.readBits(7), 0)
          }
          if (sym + rep > alphabetSize) sys.error("vp8l: repeat overflow")
          var k = 0
          while (k < rep) { lens(sym) = value; sym += 1; k += 1 }
        }
      }
      val used = (0 until alphabetSize).map(s => (s, lens(s)))
        .filter(_._2 > 0)
      r.chargeTreeSymbols(used.size) // cumulative budget, see Reader
      buildTree(used)
    }
  }

  /** The 5 codes of one prefix group: green+length+cache, red, blue,
    * alpha, distance. */
  private final class Group(val green: Tree, val red: Tree,
      val blue: Tree, val alpha: Tree, val dist: Tree)

  private def readGroup(r: Reader, cacheSize: Int): Group =
    new Group(
      readCode(r, 256 + 24 + cacheSize),
      readCode(r, 256), readCode(r, 256), readCode(r, 256),
      readCode(r, 40))

  // ------------------------------------------------- LZ77 value coding

  /** Prefix-coded value (lengths and distances share the scheme): codes
    * 0..3 are literal values 1..4; above, (code-2)>>1 extra bits. */
  private def prefixValue(r: Reader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.readBits(extra) + 1
    }

  /** The 120 near-neighborhood (dx, dy) plane codes, ordered by
    * increasing Euclidean distance (ties: larger dy first, then
    * positive dx before negative) — the spec's close-neighbor table.
    *
    * Domain note (r17 review): the table is EXACTLY the spec LUT's
    * addressable domain — dy in [0, 7], dx in [-7, 8] (each entry is
    * one byte, (dy << 4) | (8 - dx)), dx > 0 on the dy = 0 row — which
    * counts to precisely 8 + 7×16 = 120. The first cut of this
    * generator drew from the wider dy ≤ 8 / dx ≥ -8 square and
    * truncated to 120, which agreed on codes 1..96 but drifted for
    * 97..120 — round trips could not catch it (the fixture encoder
    * only emits code 2), a third-party file using far-neighborhood
    * refs would have decoded wrong pixels. */
  private val Neighbors: Array[(Int, Int)] = {
    val cands = for {
      y <- 0 to 7
      x <- -7 to 8
      if !(y == 0 && x <= 0)
    } yield (x, y)
    val t = cands.sortBy { case (x, y) => (x * x + y * y, -y, -x) }.toArray
    require(t.length == 120, s"plane-code table size ${t.length}")
    t
  }

  /** Spec-assertion hook (WebpSpec pins the table's domain/order). */
  private[graft] def neighborTable: Array[(Int, Int)] = Neighbors

  private[graft] def planeToDist(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = Neighbors(code - 1)
      math.max(1, dy * xsize + dx)
    }

  // -------------------------------------------------------- color cache

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ------------------------------------------------------- entropy core

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decode one entropy-coded ARGB image of w×h (the shared core: the
    * main image at level 0 with optional meta groups, and the
    * transform/entropy/palette sub-images recursively at level > 0). */
  private def decodeEntropy(r: Reader, w: Int, h: Int,
      isLevel0: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
      sys.error("vp8l: dims out of budget")
    val cacheBits = if (r.readBits(1) == 1) r.readBits(4) else 0
    if (cacheBits > 11) sys.error("vp8l: cache bits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (isLevel0 && r.readBits(1) == 1) {
      metaBits = r.readBits(3) + 2
      metaW = subSize(w, metaBits)
      metaImg = decodeEntropy(r, metaW, subSize(h, metaBits),
        isLevel0 = false)
      var mx = 0
      metaImg.foreach { p =>
        val idx = (p >> 8) & 0xffff // (red << 8) | green
        if (idx > mx) mx = idx
      }
      numGroups = mx + 1
      // the group index is (red << 8) | green — a full 16 bits; legal
      // files can use all 65536 groups (r17 ADVICE: a 1024 cap here
      // censused legitimate many-group files as corrupt). Memory stays
      // bounded: the meta image itself and the 64M-px budget gate the
      // group table.
      if (numGroups > 65536) sys.error("vp8l: meta group count")
    }
    val groups = Array.fill(numGroups)(readGroup(r, cacheSize))

    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val out = new Array[Int](w * h)
    var pos = 0
    var x = 0
    val n = w * h
    def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    while (pos < n) {
      val g =
        if (metaImg == null) groups(0)
        else {
          val y = pos / w
          val mi = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          groups((mi >> 8) & 0xffff)
        }
      val s = decodeSym(r, g.green)
      if (s < 256) {
        val green = s
        val red = decodeSym(r, g.red)
        val blue = decodeSym(r, g.blue)
        val alpha = decodeSym(r, g.alpha)
        val px = (alpha << 24) | (red << 16) | (green << 8) | blue
        out(pos) = px; insert(px)
        pos += 1; x += 1; if (x == w) x = 0
      } else if (s < 256 + 24) {
        val length = prefixValue(r, s - 256)
        val distCode = prefixValue(r, decodeSym(r, g.dist))
        val dist = planeToDist(distCode, w)
        if (dist > pos || pos + length > n)
          sys.error("vp8l: backref out of range")
        var k = 0
        while (k < length) {
          val px = out(pos - dist)
          out(pos) = px; insert(px)
          pos += 1; x += 1; if (x == w) x = 0
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize)
          sys.error("vp8l: cache index")
        val px = cache(idx)
        out(pos) = px; insert(px)
        pos += 1; x += 1; if (x == w) x = 0
      }
    }
    out
  }

  // --------------------------------------------------------- transforms

  private sealed trait Transform
  private final case class Predictor(bits: Int, img: Array[Int],
      w: Int) extends Transform
  private final case class ColorT(bits: Int, img: Array[Int],
      w: Int) extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(palette: Array[Int],
      widthBits: Int, fullWidth: Int) extends Transform

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without unpacking: mask the carry bits
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel (a + b) mod 256
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = ((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)
    rb | ((ag & 0x00ff00ff) << 8)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val pc = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pl += math.abs(pc - ch(l, sh))
      pt += math.abs(pc - ch(t, sh))
      sh += 8
    }
    if (pl < pt) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= clamp255(ch(l, sh) + ch(t, sh) - ch(tl, sh)) << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = ch(ave, sh)
      out |= clamp255(a + (a - ch(tl, sh)) / 2) << sh
      sh += 8
    }
    out
  }

  /** Inverse predictor transform, in place. Flat-array addressing gives
    * the spec's edge conventions directly: the top-right neighbor of
    * the last column is the current row's first pixel. */
  private def undoPredictor(argb: Array[Int], w: Int, h: Int,
      bits: Int, img: Array[Int], imgW: Int): Unit = {
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) argb(i - 1) // top row: left
          else if (x == 0) argb(i - w) // left column: top
          else {
            val mode = (img((y >> bits) * imgW + (x >> bits)) >> 8) & 0xff
            val l = argb(i - 1)
            val t = argb(i - w)
            val tl = argb(i - w - 1)
            val tr = argb(i - w + 1) // x=w-1 wraps to this row's col 0
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
              case 11 => select(l, t, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(l, t, tl)
              case _ => sys.error("vp8l: predictor mode")
            }
          }
        argb(i) = addPixels(argb(i), pred)
        x += 1; i += 1
      }
      y += 1
    }
  }

  /** ColorTransformDelta: both operands cast to SIGNED bytes. */
  private def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5

  private def undoColor(argb: Array[Int], w: Int, h: Int,
      bits: Int, img: Array[Int], imgW: Int): Unit = {
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = img((y >> bits) * imgW + (x >> bits))
        val g2r = cte & 0xff          // blue channel
        val g2b = (cte >> 8) & 0xff   // green channel
        val r2b = (cte >> 16) & 0xff  // red channel
        val px = argb(i)
        val green = (px >> 8) & 0xff
        var red = (px >> 16) & 0xff
        var blue = px & 0xff
        red = (red + ctDelta(g2r, green)) & 0xff
        blue = (blue + ctDelta(g2b, green) + ctDelta(r2b, red)) & 0xff
        argb(i) = (px & 0xff00ff00) | (red << 16) | blue
        x += 1; i += 1
      }
      y += 1
    }
  }

  private def undoSubtractGreen(argb: Array[Int]): Unit = {
    var i = 0
    while (i < argb.length) {
      val px = argb(i)
      val g = (px >> 8) & 0xff
      val r = (((px >> 16) & 0xff) + g) & 0xff
      val b = ((px & 0xff) + g) & 0xff
      argb(i) = (px & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Inverse color-indexing: unbundle packed sub-byte indices (when the
    * palette is small) and look every index up; out-of-range indices
    * resolve to transparent black (the fail-soft the spec's reference
    * decoder uses), never out of bounds. */
  private def undoColorIndex(argb: Array[Int], reducedW: Int, h: Int,
      t: ColorIndex): Array[Int] = {
    val w = t.fullWidth
    val out = new Array[Int](w * h)
    val pxPerByte = 1 << t.widthBits
    val bitsPer = 8 >> t.widthBits
    val mask = (1 << bitsPer) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = argb(y * reducedW + (x >> t.widthBits))
        val packed = (src >> 8) & 0xff // green channel holds indices
        val idx =
          if (t.widthBits == 0) packed
          else (packed >> ((x & (pxPerByte - 1)) * bitsPer)) & mask
        out(y * w + x) =
          if (idx < t.palette.length) t.palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------ top level

  private def decodeVp8l(bytes: Array[Byte], off: Int,
      len: Int): Option[RawImage] = {
    if ((bytes(off) & 0xff) != 0x2f) return None
    val r = new Reader(bytes, off + 1, off + len)
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    val alphaHint = r.readBits(1) == 1
    if (r.readBits(3) != 0) return None // version must be 0
    if (w.toLong * h > (1L << 26)) return None // 64M-pixel sanity budget
    val argb = decodeVp8lBody(r, w, h)
    val channels = if (alphaHint) 4 else 3
    val out = new Array[Byte](w * h * channels)
    var i = 0
    var o = 0
    while (i < argb.length) {
      val px = argb(i)
      out(o) = ((px >> 16) & 0xff).toByte
      out(o + 1) = ((px >> 8) & 0xff).toByte
      out(o + 2) = (px & 0xff).toByte
      if (channels == 4) out(o + 3) = ((px >>> 24) & 0xff).toByte
      i += 1; o += channels
    }
    Some(RawImage(w, h, channels, out))
  }

  /** The VP8L bitstream BODY — transforms + entropy-coded image —
    * with dims supplied by the caller: the shape the extended-format
    * `ALPH` chunk's lossless mode embeds (a headerless VP8L stream
    * whose dimensions are the canvas's — WebP container spec §
    * "Alpha"). [[decodeVp8l]] wraps it with the 5-byte still-image
    * header. Throws on damage (callers sit under [[safely]]). */
  private[ext] def decodeVp8lBody(r: Reader, w: Int,
      h: Int): Array[Int] = {
    // transforms, in bitstream order; COLOR_INDEXING reduces the coded
    // width for everything read after it
    var xsize = w
    val transforms = scala.collection.mutable.ListBuffer.empty[Transform]
    var seen = Set.empty[Int]
    while (r.readBits(1) == 1) {
      val ttype = r.readBits(2)
      if (seen(ttype)) sys.error("vp8l: duplicate transform")
      seen += ttype
      ttype match {
        case 0 =>
          val bits = r.readBits(3) + 2
          val tw = subSize(xsize, bits)
          transforms += Predictor(bits,
            decodeEntropy(r, tw, subSize(h, bits), isLevel0 = false), tw)
        case 1 =>
          val bits = r.readBits(3) + 2
          val tw = subSize(xsize, bits)
          transforms += ColorT(bits,
            decodeEntropy(r, tw, subSize(h, bits), isLevel0 = false), tw)
        case 2 =>
          transforms += SubtractGreen
        case _ =>
          val nColors = r.readBits(8) + 1
          val raw = decodeEntropy(r, nColors, 1, isLevel0 = false)
          // palette entries are component-wise delta-coded
          val palette = new Array[Int](nColors)
          var prev = 0
          var i = 0
          while (i < nColors) {
            prev = addPixels(prev, raw(i))
            palette(i) = prev
            i += 1
          }
          val widthBits =
            if (nColors <= 2) 3
            else if (nColors <= 4) 2
            else if (nColors <= 16) 1
            else 0
          transforms += ColorIndex(palette, widthBits, xsize)
          xsize = subSize(xsize, widthBits)
      }
    }

    var argb = decodeEntropy(r, xsize, h, isLevel0 = true)
    // inverse transforms in REVERSE read order; the coded width only
    // widens back at the color-indexing inverse
    transforms.reverseIterator.foreach {
      case Predictor(bits, img, imgW) =>
        undoPredictor(argb, xsize, h, bits, img, imgW)
      case ColorT(bits, img, imgW) =>
        undoColor(argb, xsize, h, bits, img, imgW)
      case SubtractGreen =>
        undoSubtractGreen(argb)
      case t: ColorIndex =>
        argb = undoColorIndex(argb, xsize, h, t)
        xsize = t.fullWidth
    }
    if (xsize != w) sys.error("vp8l: width mismatch after transforms")
    argb
  }
}
