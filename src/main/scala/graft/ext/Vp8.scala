package graft.ext

/** REAL lossy-WebP (VP8) key-frame decode — pure JVM, from the public
  * RFC 6386 specification (VERDICT r17 "What's missing #1": VP8 is the
  * majority coding for real-web `image/webp`, and without it most WebP
  * groups in a crawl census carried no pixel stats).
  *
  * Implements the complete INTRA (key-frame) reconstruction pipeline —
  * the only frame type the WebP container carries (`VP8 ` chunks are
  * single key frames by container contract):
  *
  *   - the boolean arithmetic decoder (§7), including tree-coded
  *     symbols and literal/flag reads;
  *   - the key-frame header: segmentation (per-segment quantizer and
  *     loop-filter deltas, the segment-id tree), loop-filter selection
  *     (simple/normal + sharpness + per-mode/ref deltas), multiple
  *     token partitions, quantizer indices with per-plane deltas, and
  *     token-probability updates against [[Vp8Tables.CoeffUpdateProbs]]
  *     (§9, §13.4);
  *   - intra prediction: 16x16 (DC/V/H/TM with the edge special
  *     cases), chroma 8x8, and all ten 4x4 B_PRED sub-modes with the
  *     above-right continuation rules (§12);
  *   - DCT token decoding over [4 types][8 bands][3 contexts] with the
  *     category extra-bit codes, zigzag placement, per-segment
  *     dequantization (the §14.1 lookup tables, Y2 ×2 / ×155/100 and
  *     chroma-DC 132 clamps), the 4x4 inverse DCT (35468/20091
  *     multiplier form) and the Y2 inverse Walsh–Hadamard (§13, §14);
  *   - the in-place loop filter, both SIMPLE and NORMAL profiles, MB
  *     and subblock edges, with the hev/interior/edge-limit thresholds
  *     from filter level + sharpness (§15).
  *
  * Correctness is gated BIT-EXACTLY: Vp8Spec pins real VP8 streams
  * (produced by the system libwebp encoder across quality levels,
  * segment counts, odd dims, and alpha) and asserts this decoder's
  * Y/U/V planes equal libwebp's own `WebPDecodeYUV` output byte for
  * byte — loop filter, dequant clamps and all.
  *
  * YUV→RGB conversion is NOT part of RFC 6386; [[toRgb]] uses the
  * standard ITU-R BT.601 studio-swing integer approximation with 2x2
  * chroma replication (documented; libwebp's "fancy upsampler"
  * interpolates chroma, so RGB values — not YUV planes — may differ
  * from libwebp by a few counts near chroma edges).
  *
  * Hardening contract matches the other decoders ([[Webp]] doc):
  * adversarial bytes return None — never throw, never over-allocate
  * (dims are 14-bit; buffers checked against the 64M-pixel budget).
  * Scale shape: a per-blob CPU kernel inside partition-batched bodies
  * (decode-after-dedup in q_warc_media), no shuffle, no driver work.
  */
object Vp8 {

  import Multimodal.RawImage

  private def safely[T](body: => Option[T]): Option[T] =
    try body catch { case scala.util.control.NonFatal(_) => None }

  /** Decoded 4:2:0 planes; u/v are ceil(w/2) x ceil(h/2), tight. */
  final case class Yuv(width: Int, height: Int, y: Array[Byte],
      u: Array[Byte], v: Array[Byte])

  // ------------------------------------------------------ bool decoder

  /** RFC 6386 §7 boolean decoder. Reads past the partition end feed
    * zero bytes (the spec's drain behavior); structural damage shows
    * up as dimension/size inconsistencies, not reader faults. */
  private final class Bool(bytes: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value =
      ((byteAt(start) << 8) | byteAt(start + 1)) & 0xffff
    private var pos = start + 2
    private var shift = 0
    private def byteAt(i: Int): Int =
      if (i < end) bytes(i) & 0xff else 0
    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      val ret =
        if (value >= bigSplit) { range -= split; value -= bigSplit; 1 }
        else { range = split; 0 }
      while (range < 128) {
        value <<= 1; range <<= 1; shift += 1
        if (shift == 8) { shift = 0; value |= byteAt(pos); pos += 1 }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }
    /** flag + magnitude + sign (the header's delta fields). */
    def signed(n: Int): Int = {
      val v = literal(n)
      if (bit(128) == 1) -v else v
    }
    /** RFC tree decode: positive entries index the next node, entries
      * <= 0 are leaves (-value). `probs(probOff + node/2)`. */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int,
        startNode: Int = 0): Int = {
      var i = startNode
      do i = t(i + bit(probs(probOff + (i >> 1)))) while (i > 0)
      -i
    }
  }

  // ---------------------------------------------------------- constants

  // DCT token tree (§13.2); tokens 0..4 literal, 5..10 categories,
  // 11 = EOB. After a ZERO token the next decode starts at node 2
  // (EOB cannot follow a zero run).
  private val CoeffTree = Array(
    -11, 2, 0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
    14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  private val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val CoeffBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // §14.1 quantizer lookups (indices clamped to 0..127)
  private val DcQ = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18, 19,
    20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46,
    47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63,
    64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77, 78, 79,
    80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100,
    101, 102, 104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126,
    128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)
  private val AcQ = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
    56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86,
    88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108, 110, 112, 114,
    116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197,
    201, 205, 209, 213, 217, 221, 225, 229, 234, 239, 245, 249, 254,
    259, 264, 269, 274, 279, 284)

  // key-frame mode trees + fixed probabilities (§11.2, §11.5)
  // 16x16 modes: 0=DC 1=V 2=H 3=TM, 4=B_PRED
  private val KfYmodeTree = Array(-4, 2, 4, 6, 0, -1, -2, -3)
  private val KfYmodeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(0, 2, -1, 4, -2, -3)
  private val KfUvModeProbs = Array(142, 114, 183)
  // 4x4 sub-modes: 0=DC 1=TM 2=VE 3=HE 4=LD 5=RD 6=VR 7=VL 8=HD 9=HU
  private val BModeTree = Array(
    0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  // implied 4x4 context mode of a 16x16-coded neighbor (§11.3)
  private val ImpliedBMode = Array(0, 2, 3, 1) // DC→B_DC V→VE H→HE TM→TM
  private val SegTree = Array(2, 4, 0, -1, -2, -3)

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int =
    if (v < 0) 0 else if (v > 127) 127 else v
  private def sclip(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  // ------------------------------------------------------------- decode

  /** Decode the payload of a `VP8 ` chunk (a key frame) to 4:2:0
    * planes, bit-exact per RFC 6386 including the loop filter. None on
    * anything structurally unsound. */
  def decodePlanes(bytes: Array[Byte], off: Int, len: Int): Option[Yuv] =
    safely(decodeImpl(bytes, off, len))

  // decoded state threaded through the helpers. Residual coefficients
  // are deliberately NOT frame-wide: token decode and reconstruction
  // interleave per MB ROW (the partition bool decoders advance
  // independently of the mode partition, and reconstruction of row r
  // needs only row r's residuals + already-reconstructed pixels), so
  // the auxiliary buffer is one row of 25 × 16 shorts per MB — ~800 KB
  // at the 16383-wide extreme instead of ~210 MB of whole-frame
  // coefficients at the 64M-pixel budget (an adversarial-header
  // allocation, not just a big-image one).
  private final class Frame(val mbW: Int, val mbH: Int) {
    val yStride: Int = mbW * 16
    val cStride: Int = mbW * 8
    val yPlane = new Array[Byte](yStride * mbH * 16)
    val uPlane = new Array[Byte](cStride * mbH * 8)
    val vPlane = new Array[Byte](cStride * mbH * 8)
    // per-MB mode data from the first partition
    val ymode = new Array[Byte](mbW * mbH)
    val uvmode = new Array[Byte](mbW * mbH)
    val segment = new Array[Byte](mbW * mbH)
    val skip = new Array[Boolean](mbW * mbH)
    val bmodes = new Array[Byte](mbW * mbH * 16) // B_PRED sub-modes
    // residuals for the CURRENT row: 25 blocks * 16 coeffs per MB
    val rowCoeffs = new Array[Short](mbW * 25 * 16)
    val hasCoeffs = new Array[Boolean](mbW * mbH)
  }

  private def decodeImpl(bytes: Array[Byte], off: Int,
      len: Int): Option[Yuv] = {
    if (len < 10) return None
    def u8(i: Int): Int = bytes(off + i) & 0xff
    val tag = u8(0) | (u8(1) << 8) | (u8(2) << 16)
    if ((tag & 1) != 0) return None // not a key frame
    if (((tag >> 1) & 7) > 3) return None // version
    val part1Len = tag >> 5
    if (u8(3) != 0x9d || u8(4) != 0x01 || u8(5) != 0x2a) return None
    val w = (u8(6) | (u8(7) << 8)) & 0x3fff
    val h = (u8(8) | (u8(9) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > (1L << 26)) return None
    if (10L + part1Len > len) return None
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4

    val bd = new Bool(bytes, off + 10, off + 10 + part1Len)
    bd.literal(1) // color space (must be 0, but tolerate)
    bd.literal(1) // clamping type

    // ---- segmentation (§9.3)
    var segEnabled = false
    var segUpdateMap = false
    var segAbsDelta = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.bit(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.bit(128) == 1
      val updateData = bd.bit(128) == 1
      if (updateData) {
        segAbsDelta = bd.bit(128) == 1
        var i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) segQ(i) = bd.signed(7); i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) segLf(i) = bd.signed(6); i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bit(128) == 1) segTreeProbs(i) = bd.literal(8); i += 1
        }
      }
    }

    // ---- loop filter selection (§9.4)
    val simpleFilter = bd.bit(128) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    if (bd.bit(128) == 1) {
      lfDeltaEnabled = true
      if (bd.bit(128) == 1) { // update
        var i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) refLfDeltas(i) = bd.signed(6); i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) modeLfDeltas(i) = bd.signed(6); i += 1
        }
      }
    }

    // ---- token partitions (§9.5)
    val nParts = 1 << bd.literal(2)
    val sizesAt = off + 10 + part1Len
    if (sizesAt + 3 * (nParts - 1) > off + len) return None
    val partBounds = new Array[(Int, Int)](nParts)
    var dataAt = sizesAt + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) off + len - dataAt
        else (bytes(sizesAt + 3 * pi) & 0xff) |
          ((bytes(sizesAt + 3 * pi + 1) & 0xff) << 8) |
          ((bytes(sizesAt + 3 * pi + 2) & 0xff) << 16)
      if (sz < 0 || dataAt + sz > off + len) return None
      partBounds(pi) = (dataAt, dataAt + sz)
      dataAt += sz
      pi += 1
    }
    val parts = partBounds.map { case (s, e) => new Bool(bytes, s, e) }

    // ---- quantizers (§9.6)
    val yacQi = bd.literal(7)
    def qDelta(): Int = if (bd.bit(128) == 1) bd.signed(4) else 0
    val y1dcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    // per-segment dequant factors [seg][y1dc,y1ac,y2dc,y2ac,uvdc,uvac]
    val deq = Array.tabulate(4) { s =>
      val base =
        if (!segEnabled) yacQi
        else if (segAbsDelta) segQ(s)
        else yacQi + segQ(s)
      val q = clampQ(base)
      val uvdc = DcQ(clampQ(q + uvdcD))
      Array(
        DcQ(clampQ(q + y1dcD)),
        AcQ(q),
        DcQ(clampQ(q + y2dcD)) * 2,
        math.max(8, AcQ(clampQ(q + y2acD)) * 155 / 100),
        if (uvdc > 132) 132 else uvdc,
        AcQ(clampQ(q + uvacD)))
    }

    bd.bit(128) // refresh_entropy_probs (key frame: store-only)

    // ---- token probability updates (§13.4)
    val probs = Vp8Tables.CoeffProbs.clone()
    var t = 0
    while (t < 4 * 8 * 3 * 11) {
      if (bd.bit(Vp8Tables.CoeffUpdateProbs(t)) == 1)
        probs(t) = bd.literal(8)
      t += 1
    }
    val skipEnabled = bd.bit(128) == 1
    val probSkipFalse = if (skipEnabled) bd.literal(8) else 0

    // ---- per-MB prediction records (first partition, raster order)
    val fr = new Frame(mbW, mbH)
    // B-mode context rows: above (per MB column, 4 entries) and left
    val aboveB = new Array[Byte](mbW * 4) // B_DC default
    var mbY = 0
    while (mbY < mbH) {
      val leftB = new Array[Byte](4)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        if (segEnabled && segUpdateMap)
          fr.segment(mi) = bd.tree(SegTree, segTreeProbs, 0).toByte
        if (skipEnabled) fr.skip(mi) = bd.bit(probSkipFalse) == 1
        val ym = bd.tree(KfYmodeTree, KfYmodeProbs, 0)
        fr.ymode(mi) = ym.toByte
        if (ym == 4) { // B_PRED: 16 contextual sub-modes
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val above =
              if (r == 0) aboveB(mbX * 4 + c) else fr.bmodes(mi * 16 + sb - 4)
            val left =
              if (c == 0) leftB(r) else fr.bmodes(mi * 16 + sb - 1)
            val bm = bd.tree(BModeTree, Vp8Tables.KfBModeProbs,
              (above * 10 + left) * 9)
            fr.bmodes(mi * 16 + sb) = bm.toByte
            sb += 1
          }
        } else {
          val ib = ImpliedBMode(ym).toByte
          var i = 0
          while (i < 16) { fr.bmodes(mi * 16 + i) = ib; i += 1 }
        }
        // context rows take the BOTTOM row / RIGHT column sub-modes
        var i = 0
        while (i < 4) {
          aboveB(mbX * 4 + i) = fr.bmodes(mi * 16 + 12 + i)
          leftB(i) = fr.bmodes(mi * 16 + i * 4 + 3)
          i += 1
        }
        fr.uvmode(mi) = bd.tree(UvModeTree, KfUvModeProbs, 0).toByte
        mbX += 1
      }
      mbY += 1
    }

    // ---- residuals + reconstruction, row-interleaved (§12-§14)
    decodeAndReconstruct(fr, parts, probs, deq)

    // ---- loop filter (§15)
    if (filterLevel > 0)
      loopFilter(fr, simpleFilter, filterLevel, sharpness, segEnabled,
        segAbsDelta, segLf, lfDeltaEnabled, refLfDeltas, modeLfDeltas)

    // crop the MB padding to the visible dims
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val y = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(fr.yPlane, r * fr.yStride, y, r * w, w); r += 1
    }
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(fr.uPlane, r * fr.cStride, u, r * cw, cw)
      System.arraycopy(fr.vPlane, r * fr.cStride, v, r * cw, cw)
      r += 1
    }
    Some(Yuv(w, h, y, u, v))
  }

  // --------------------------------------------------- token decoding

  /** Decode one block's tokens into `out` (zigzag applied, dequant by
    * dcQ/acQ); returns the EOB position (> first ⇔ any nonzero — the
    * neighbor context flag, §13.3). */
  private def coeffBlock(bd: Bool, probs: Array[Int], blockType: Int,
      first: Int, ctx0: Int, dcQ: Int, acQ: Int, out: Array[Short],
      outOff: Int): Int = {
    var n = first
    var ctx = ctx0
    var skipEob = false
    while (n < 16) {
      val pOff = (blockType * 8 + CoeffBands(n)) * 3 * 11 + ctx * 11
      // tree walk; after a ZERO token the EOB node is skipped (§13.3:
      // a zero run is never followed by end-of-block)
      var node = if (skipEob) 2 else 0
      do node = CoeffTree(node + bd.bit(probs(pOff + (node >> 1))))
      while (node > 0)
      val token = -node
      if (token == 11) return n // EOB
      if (token == 0) { // zero token: no sign, context 0
        ctx = 0; skipEob = true; n += 1
      } else {
        val v =
          if (token <= 4) token
          else {
            val cat = token - 5
            var extra = 0
            val cp = CatProbs(cat)
            var i = 0
            while (i < cp.length) {
              extra = (extra << 1) | bd.bit(cp(i)); i += 1
            }
            CatBase(cat) + extra
          }
        val signed = if (bd.bit(128) == 1) -v else v
        val q = if (n == 0) dcQ else acQ
        out(outOff + Zigzag(n)) = (signed * q).toShort
        ctx = if (v == 1) 1 else 2
        skipEob = false
        n += 1
      }
    }
    16
  }

  private def decodeAndReconstruct(fr: Frame, parts: Array[Bool],
      probs: Array[Int], deq: Array[Array[Int]]): Unit = {
    val mbW = fr.mbW
    // nonzero context rows (per plane, subblock granularity)
    val aY = new Array[Boolean](mbW * 4)
    val aU = new Array[Boolean](mbW * 2)
    val aV = new Array[Boolean](mbW * 2)
    val aY2 = new Array[Boolean](mbW)
    var mbY = 0
    while (mbY < fr.mbH) {
      val bd = parts(mbY % parts.length)
      val lY = new Array[Boolean](4)
      val lU = new Array[Boolean](2)
      val lV = new Array[Boolean](2)
      var lY2 = false
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        val q = deq(fr.segment(mi))
        val base = mbX * 25 * 16
        java.util.Arrays.fill(fr.rowCoeffs, base, base + 25 * 16,
          0.toShort)
        val isB = fr.ymode(mi) == 4
        if (fr.skip(mi)) {
          // §13.1: skipped MBs zero their contexts; the Y2 context is
          // zeroed only when this MB HAS a Y2 block
          java.util.Arrays.fill(lY, false)
          java.util.Arrays.fill(lU, false)
          java.util.Arrays.fill(lV, false)
          var i = 0
          while (i < 4) { aY(mbX * 4 + i) = false; i += 1 }
          i = 0
          while (i < 2) {
            aU(mbX * 2 + i) = false; aV(mbX * 2 + i) = false; i += 1
          }
          if (!isB) { aY2(mbX) = false; lY2 = false }
          fr.hasCoeffs(mi) = false
        } else {
          var any = false
          var first = 0
          var yType = 3
          if (!isB) { // Y2 block first
            val ctx = (if (aY2(mbX)) 1 else 0) + (if (lY2) 1 else 0)
            val nz = coeffBlock(bd, probs, 1, 0, ctx, q(2), q(3),
              fr.rowCoeffs, base + 24 * 16) > 0
            aY2(mbX) = nz; lY2 = nz; any ||= nz
            first = 1; yType = 0
          }
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val ctx = (if (aY(mbX * 4 + c)) 1 else 0) +
              (if (lY(r)) 1 else 0)
            val nz = coeffBlock(bd, probs, yType, first, ctx, q(0), q(1),
              fr.rowCoeffs, base + sb * 16) > first
            aY(mbX * 4 + c) = nz; lY(r) = nz; any ||= nz
            sb += 1
          }
          var pl = 0
          while (pl < 2) {
            val (aC, lC) = if (pl == 0) (aU, lU) else (aV, lV)
            var b = 0
            while (b < 4) {
              val r = b >> 1; val c = b & 1
              val ctx = (if (aC(mbX * 2 + c)) 1 else 0) +
                (if (lC(r)) 1 else 0)
              val nz = coeffBlock(bd, probs, 2, 0, ctx, q(4), q(5),
                fr.rowCoeffs, base + (16 + pl * 4 + b) * 16) > 0
              aC(mbX * 2 + c) = nz; lC(r) = nz; any ||= nz
              b += 1
            }
            pl += 1
          }
          fr.hasCoeffs(mi) = any
        }
        reconstructMb(fr, mbX, mbY, base)
        mbX += 1
      }
      mbY += 1
    }
  }

  // ------------------------------------------------------- transforms

  /** 4x4 inverse DCT (§14.4), input length-16 row-major, adds into the
    * plane at (px, py). */
  private def idctAdd(coeffs: Array[Short], cOff: Int,
      plane: Array[Byte], stride: Int, pOff: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val ip0 = coeffs(cOff + i)
      val ip4 = coeffs(cOff + 4 + i)
      val ip8 = coeffs(cOff + 8 + i)
      val ip12 = coeffs(cOff + 12 + i)
      val a1 = ip0 + ip8
      val b1 = ip0 - ip8
      val t1 = (ip4 * 35468) >> 16
      val t2 = ip12 + ((ip12 * 20091) >> 16)
      val c1 = t1 - t2
      val t3 = ip4 + ((ip4 * 20091) >> 16)
      val t4 = (ip12 * 35468) >> 16
      val d1 = t3 + t4
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val ip0 = tmp(i * 4)
      val ip1 = tmp(i * 4 + 1)
      val ip2 = tmp(i * 4 + 2)
      val ip3 = tmp(i * 4 + 3)
      val a1 = ip0 + ip2
      val b1 = ip0 - ip2
      val t1 = (ip1 * 35468) >> 16
      val t2 = ip3 + ((ip3 * 20091) >> 16)
      val c1 = t1 - t2
      val t3 = ip1 + ((ip1 * 20091) >> 16)
      val t4 = (ip3 * 35468) >> 16
      val d1 = t3 + t4
      val o = pOff + i * stride
      plane(o) = clamp255((plane(o) & 0xff) + ((a1 + d1 + 4) >> 3)).toByte
      plane(o + 3) =
        clamp255((plane(o + 3) & 0xff) + ((a1 - d1 + 4) >> 3)).toByte
      plane(o + 1) =
        clamp255((plane(o + 1) & 0xff) + ((b1 + c1 + 4) >> 3)).toByte
      plane(o + 2) =
        clamp255((plane(o + 2) & 0xff) + ((b1 - c1 + 4) >> 3)).toByte
      i += 1
    }
  }

  /** Y2 inverse Walsh–Hadamard (§14.3): distributes the 16 outputs to
    * the DC positions of the MB's 16 Y blocks. */
  private def iwht(coeffs: Array[Short], cOff: Int,
      dcOut: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val ip0 = coeffs(cOff + i)
      val ip4 = coeffs(cOff + 4 + i)
      val ip8 = coeffs(cOff + 8 + i)
      val ip12 = coeffs(cOff + 12 + i)
      val a1 = ip0 + ip12
      val b1 = ip4 + ip8
      val c1 = ip4 - ip8
      val d1 = ip0 - ip12
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val ip0 = tmp(i * 4)
      val ip1 = tmp(i * 4 + 1)
      val ip2 = tmp(i * 4 + 2)
      val ip3 = tmp(i * 4 + 3)
      val a1 = ip0 + ip3
      val b1 = ip1 + ip2
      val c1 = ip1 - ip2
      val d1 = ip0 - ip3
      dcOut(i * 4) = (a1 + b1 + 3) >> 3
      dcOut(i * 4 + 1) = (c1 + d1 + 3) >> 3
      dcOut(i * 4 + 2) = (a1 - b1 + 3) >> 3
      dcOut(i * 4 + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  // ----------------------------------------------------- reconstruction

  /** Pixel fetch with the §12.2 edge conventions: row -1 is 127, col
    * -1 is 129, above-left corner 127; beyond the right edge of row -1
    * (and of any reconstructed row, for above-right) the last real
    * pixel repeats. */
  private def px(plane: Array[Byte], stride: Int, width: Int,
      x: Int, y: Int): Int =
    if (y < 0) {
      if (x < 0) 127 else 127
    } else if (x < 0) 129
    else if (x >= width) plane(y * stride + width - 1) & 0xff
    else plane(y * stride + x) & 0xff

  /** Reconstruct ONE macroblock from the current row's residuals
    * (`base` = the MB's offset into [[Frame.rowCoeffs]]). Runs
    * immediately after the MB's tokens decode — see the Frame doc for
    * why reconstruction is row-interleaved. */
  private def reconstructMb(fr: Frame, mbX: Int, mbY: Int,
      base: Int): Unit = {
    val yS = fr.yStride
    val cS = fr.cStride
    val yW = fr.mbW * 16
    val cW = fr.mbW * 8
    val dcTmp = new Array[Int](16)
    val mi = mbY * fr.mbW + mbX
    val x0 = mbX * 16
    val y0 = mbY * 16
    val ym = fr.ymode(mi)

    if (ym == 4) {
      // B_PRED: predict + add residual per subblock, raster order
      var sb = 0
      while (sb < 16) {
        val bx = x0 + (sb & 3) * 4
        val by = y0 + (sb >> 2) * 4
        predictB(fr.yPlane, yS, yW, bx, by, x0,
          fr.bmodes(mi * 16 + sb))
        idctAdd(fr.rowCoeffs, base + sb * 16, fr.yPlane, yS,
          by * yS + bx)
        sb += 1
      }
    } else {
      predict16(fr.yPlane, yS, yW, x0, y0, ym, mbX, mbY)
      // fold the Y2 (iWHT) DCs into the 16 Y blocks
      iwht(fr.rowCoeffs, base + 24 * 16, dcTmp)
      var sb = 0
      while (sb < 16) {
        fr.rowCoeffs(base + sb * 16) = dcTmp(sb).toShort
        idctAdd(fr.rowCoeffs, base + sb * 16, fr.yPlane, yS,
          (y0 + (sb >> 2) * 4) * yS + x0 + (sb & 3) * 4)
        sb += 1
      }
    }

    val uvm = fr.uvmode(mi)
    val cx0 = mbX * 8
    val cy0 = mbY * 8
    predict8(fr.uPlane, cS, cW, cx0, cy0, uvm, mbX, mbY)
    predict8(fr.vPlane, cS, cW, cx0, cy0, uvm, mbX, mbY)
    var b = 0
    while (b < 4) {
      val ox = cx0 + (b & 1) * 4
      val oy = cy0 + (b >> 1) * 4
      idctAdd(fr.rowCoeffs, base + (16 + b) * 16, fr.uPlane, cS,
        oy * cS + ox)
      idctAdd(fr.rowCoeffs, base + (20 + b) * 16, fr.vPlane, cS,
        oy * cS + ox)
      b += 1
    }
  }

  /** Whole-block (16x16 / 8x8) intra prediction (§12.2). */
  private def predictWhole(plane: Array[Byte], stride: Int, width: Int,
      x0: Int, y0: Int, size: Int, mode: Int, hasAbove: Boolean,
      hasLeft: Boolean): Unit = {
    def at(x: Int, y: Int): Int = px(plane, stride, width, x, y)
    mode match {
      case 0 => // DC with edge cases
        var sum = 0
        var n = 0
        if (hasAbove) {
          var i = 0
          while (i < size) { sum += at(x0 + i, y0 - 1); i += 1 }
          n += size
        }
        if (hasLeft) {
          var i = 0
          while (i < size) { sum += at(x0 - 1, y0 + i); i += 1 }
          n += size
        }
        val dc =
          if (n == 0) 128
          else (sum + n / 2) / n
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            plane((y0 + y) * stride + x0 + x) = dc.toByte; x += 1
          }
          y += 1
        }
      case 1 => // V
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            plane((y0 + y) * stride + x0 + x) =
              at(x0 + x, y0 - 1).toByte
            x += 1
          }
          y += 1
        }
      case 2 => // H
        var y = 0
        while (y < size) {
          val l = at(x0 - 1, y0 + y).toByte
          var x = 0
          while (x < size) {
            plane((y0 + y) * stride + x0 + x) = l; x += 1
          }
          y += 1
        }
      case _ => // TM
        val al = at(x0 - 1, y0 - 1)
        var y = 0
        while (y < size) {
          val l = at(x0 - 1, y0 + y)
          var x = 0
          while (x < size) {
            plane((y0 + y) * stride + x0 + x) =
              clamp255(l + at(x0 + x, y0 - 1) - al).toByte
            x += 1
          }
          y += 1
        }
    }
  }

  private def predict16(plane: Array[Byte], stride: Int, width: Int,
      x0: Int, y0: Int, mode: Int, mbX: Int, mbY: Int): Unit =
    predictWhole(plane, stride, width, x0, y0, 16, mode,
      hasAbove = mbY > 0, hasLeft = mbX > 0)

  private def predict8(plane: Array[Byte], stride: Int, width: Int,
      x0: Int, y0: Int, mode: Int, mbX: Int, mbY: Int): Unit =
    predictWhole(plane, stride, width, x0, y0, 8, mode,
      hasAbove = mbY > 0, hasLeft = mbX > 0)

  /** 4x4 B_PRED sub-mode prediction (§12.3). `mbX0` is the MB's left
    * pixel column — above-right pixels for right-column subblocks
    * below the top row come from the MB's own top edge extension
    * (they are not yet reconstructed), the standard continuation. */
  private def predictB(plane: Array[Byte], stride: Int, width: Int,
      bx: Int, by: Int, mbX0: Int, mode: Int): Unit = {
    def at(x: Int, y: Int): Int = px(plane, stride, width, x, y)
    val p = at(bx - 1, by - 1)
    val a = new Array[Int](8) // above + above-right
    var i = 0
    while (i < 4) { a(i) = at(bx + i, by - 1); i += 1 }
    // above-right: right-column subblocks below the MB's top row read
    // from the row above the MB (at the MB's right edge), because the
    // true above-right lies in the not-yet-decoded next MB
    val arY = if ((bx - mbX0) == 12 && (by & 15) != 0) (by & ~15) - 1
      else by - 1
    while (i < 8) { a(i) = at(bx + i, arY); i += 1 }
    val l = new Array[Int](4)
    i = 0
    while (i < 4) { l(i) = at(bx - 1, by + i); i += 1 }
    val out = new Array[Int](16)
    def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    mode match {
      case 0 => // B_DC
        var s = 4
        var k = 0
        while (k < 4) { s += a(k) + l(k); k += 1 }
        val dc = s >> 3
        java.util.Arrays.fill(out, dc)
      case 1 => // B_TM
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) = clamp255(l(y) + a(x) - p); x += 1
          }
          y += 1
        }
      case 2 => // B_VE
        val v0 = avg3(p, a(0), a(1))
        val v1 = avg3(a(0), a(1), a(2))
        val v2 = avg3(a(1), a(2), a(3))
        val v3 = avg3(a(2), a(3), a(4))
        var y = 0
        while (y < 4) {
          out(y * 4) = v0; out(y * 4 + 1) = v1
          out(y * 4 + 2) = v2; out(y * 4 + 3) = v3
          y += 1
        }
      case 3 => // B_HE
        val h0 = avg3(p, l(0), l(1))
        val h1 = avg3(l(0), l(1), l(2))
        val h2 = avg3(l(1), l(2), l(3))
        val h3 = avg3(l(2), l(3), l(3))
        var y = 0
        while (y < 4) {
          val v = Array(h0, h1, h2, h3)(y)
          var x = 0
          while (x < 4) { out(y * 4 + x) = v; x += 1 }
          y += 1
        }
      case 4 => // B_LD (down-left)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val d = x + y
            out(y * 4 + x) =
              if (d == 6) avg3(a(6), a(7), a(7))
              else avg3(a(d), a(d + 1), a(d + 2))
            x += 1
          }
          y += 1
        }
      case 5 => // B_RD (down-right): diagonals over [l3..l0, p, a0..a3]
        val pp = Array(l(3), l(2), l(1), l(0), p, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val d = 3 + x - y
            out(y * 4 + x) = avg3(pp(d), pp(d + 1), pp(d + 2))
            x += 1
          }
          y += 1
        }
      case 6 => // B_VR (vertical-right)
        out(0) = avg2(p, a(0)); out(1) = avg2(a(0), a(1))
        out(2) = avg2(a(1), a(2)); out(3) = avg2(a(2), a(3))
        out(4) = avg3(l(0), p, a(0)); out(5) = avg3(p, a(0), a(1))
        out(6) = avg3(a(0), a(1), a(2)); out(7) = avg3(a(1), a(2), a(3))
        out(8) = avg3(p, l(0), l(1)); out(9) = out(0)
        out(10) = out(1); out(11) = out(2)
        out(12) = avg3(l(0), l(1), l(2)); out(13) = out(4)
        out(14) = out(5); out(15) = out(6)
      case 7 => // B_VL (vertical-left)
        out(0) = avg2(a(0), a(1)); out(1) = avg2(a(1), a(2))
        out(2) = avg2(a(2), a(3)); out(3) = avg2(a(3), a(4))
        out(4) = avg3(a(0), a(1), a(2)); out(5) = avg3(a(1), a(2), a(3))
        out(6) = avg3(a(2), a(3), a(4)); out(7) = avg3(a(3), a(4), a(5))
        out(8) = out(1); out(9) = out(2); out(10) = out(3)
        out(11) = avg3(a(4), a(5), a(6))
        out(12) = out(5); out(13) = out(6); out(14) = out(7)
        out(15) = avg3(a(5), a(6), a(7))
      case 8 => // B_HD (horizontal-down)
        out(0) = avg2(l(0), p); out(1) = avg3(l(0), p, a(0))
        out(2) = avg3(p, a(0), a(1)); out(3) = avg3(a(0), a(1), a(2))
        out(4) = avg2(l(1), l(0)); out(5) = avg3(l(1), l(0), p)
        out(6) = out(0); out(7) = out(1)
        out(8) = avg2(l(2), l(1)); out(9) = avg3(l(2), l(1), l(0))
        out(10) = out(4); out(11) = out(5)
        out(12) = avg2(l(3), l(2)); out(13) = avg3(l(3), l(2), l(1))
        out(14) = out(8); out(15) = out(9)
      case _ => // B_HU (horizontal-up)
        out(0) = avg2(l(0), l(1)); out(1) = avg3(l(0), l(1), l(2))
        out(2) = avg2(l(1), l(2)); out(3) = avg3(l(1), l(2), l(3))
        out(4) = out(2); out(5) = out(3)
        out(6) = avg2(l(2), l(3)); out(7) = avg3(l(2), l(3), l(3))
        out(8) = out(6); out(9) = out(7)
        out(10) = l(3); out(11) = l(3)
        out(12) = l(3); out(13) = l(3); out(14) = l(3); out(15) = l(3)
    }
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        plane((by + y) * stride + bx + x) = out(y * 4 + x).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------- loop filter

  private def loopFilter(fr: Frame, simple: Boolean, level0: Int,
      sharpness: Int, segEnabled: Boolean, segAbs: Boolean,
      segLf: Array[Int], lfDelta: Boolean, refD: Array[Int],
      modeD: Array[Int]): Unit = {
    var mbY = 0
    while (mbY < fr.mbH) {
      var mbX = 0
      while (mbX < fr.mbW) {
        val mi = mbY * fr.mbW + mbX
        var lvl =
          if (!segEnabled) level0
          else if (segAbs) segLf(fr.segment(mi))
          else level0 + segLf(fr.segment(mi))
        if (lfDelta) {
          lvl += refD(0) // key frame: always the INTRA ref delta
          if (fr.ymode(mi) == 4) lvl += modeD(0) // B_PRED mode delta
        }
        if (lvl < 0) lvl = 0
        if (lvl > 63) lvl = 63
        if (lvl > 0) {
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            val cap = 9 - sharpness
            if (interior > cap) interior = cap
          }
          if (interior < 1) interior = 1
          val hev = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbLim = (lvl + 2) * 2 + interior
          val subLim = lvl * 2 + interior
          val inner = fr.hasCoeffs(mi) || fr.ymode(mi) == 4
          if (simple)
            filterMbSimple(fr, mbX, mbY, mbLim, subLim, inner)
          else
            filterMbNormal(fr, mbX, mbY, mbLim, subLim, interior, hev,
              inner)
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  // shared adjust (§15.3): returns the outer F1 used by the subblock
  // p1/q1 nudge
  private def commonAdjust(plane: Array[Byte], o: Int, step: Int,
      useOuter: Boolean): Int = {
    val p1 = (plane(o - 2 * step) & 0xff) - 128
    val p0 = (plane(o - step) & 0xff) - 128
    val q0 = (plane(o) & 0xff) - 128
    val q1 = (plane(o + step) & 0xff) - 128
    var a = (if (useOuter) sclip(p1 - q1) else 0) + 3 * (q0 - p0)
    a = sclip(a)
    val f1 = sclip(a + 4) >> 3
    val f2 = sclip(a + 3) >> 3
    plane(o) = (sclip(q0 - f1) + 128).toByte
    plane(o - step) = (sclip(p0 + f2) + 128).toByte
    f1
  }

  private def simpleThresh(plane: Array[Byte], o: Int, step: Int,
      lim: Int): Boolean = {
    val p1 = plane(o - 2 * step) & 0xff
    val p0 = plane(o - step) & 0xff
    val q0 = plane(o) & 0xff
    val q1 = plane(o + step) & 0xff
    math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= lim
  }

  private def filterMask(plane: Array[Byte], o: Int, step: Int,
      lim: Int, interior: Int): Boolean = {
    def d(i: Int, j: Int): Int =
      math.abs((plane(o + i * step) & 0xff) - (plane(o + j * step) & 0xff))
    simpleThresh(plane, o, step, lim) &&
      d(-4, -3) <= interior && d(-3, -2) <= interior &&
      d(-2, -1) <= interior && d(1, 0) <= interior &&
      d(2, 1) <= interior && d(3, 2) <= interior
  }

  private def isHev(plane: Array[Byte], o: Int, step: Int,
      t: Int): Boolean = {
    val p1 = plane(o - 2 * step) & 0xff
    val p0 = plane(o - step) & 0xff
    val q0 = plane(o) & 0xff
    val q1 = plane(o + step) & 0xff
    math.abs(p1 - p0) > t || math.abs(q1 - q0) > t
  }

  private def subblockEdge(plane: Array[Byte], o: Int, step: Int,
      lim: Int, interior: Int, hevT: Int): Unit =
    if (filterMask(plane, o, step, lim, interior)) {
      val hev = isHev(plane, o, step, hevT)
      val f1 = commonAdjust(plane, o, step, hev)
      if (!hev) {
        val a = (f1 + 1) >> 1
        val q1 = (plane(o + step) & 0xff) - 128
        val p1 = (plane(o - 2 * step) & 0xff) - 128
        plane(o + step) = (sclip(q1 - a) + 128).toByte
        plane(o - 2 * step) = (sclip(p1 + a) + 128).toByte
      }
    }

  private def mbEdge(plane: Array[Byte], o: Int, step: Int, lim: Int,
      interior: Int, hevT: Int): Unit =
    if (filterMask(plane, o, step, lim, interior)) {
      if (isHev(plane, o, step, hevT)) {
        commonAdjust(plane, o, step, useOuter = true)
      } else {
        def gp(i: Int): Int = (plane(o + i * step) & 0xff) - 128
        val w = sclip(sclip(gp(-2) - gp(1)) + 3 * (gp(0) - gp(-1)))
        var a = (27 * w + 63) >> 7
        plane(o) = (sclip(gp(0) - a) + 128).toByte
        plane(o - step) = (sclip(gp(-1) + a) + 128).toByte
        a = (18 * w + 63) >> 7
        plane(o + step) = (sclip(gp(1) - a) + 128).toByte
        plane(o - 2 * step) = (sclip(gp(-2) + a) + 128).toByte
        a = (9 * w + 63) >> 7
        plane(o + 2 * step) = (sclip(gp(2) - a) + 128).toByte
        plane(o - 3 * step) = (sclip(gp(-3) + a) + 128).toByte
      }
    }

  private def filterMbSimple(fr: Frame, mbX: Int, mbY: Int, mbLim: Int,
      subLim: Int, inner: Boolean): Unit = {
    val yS = fr.yStride
    val x0 = mbX * 16
    val y0 = mbY * 16
    var i = 0
    if (mbX > 0) {
      i = 0
      while (i < 16) {
        val o = (y0 + i) * yS + x0
        if (simpleThresh(fr.yPlane, o, 1, mbLim))
          commonAdjust(fr.yPlane, o, 1, useOuter = true)
        i += 1
      }
    }
    if (inner) {
      var c = 4
      while (c < 16) {
        i = 0
        while (i < 16) {
          val o = (y0 + i) * yS + x0 + c
          if (simpleThresh(fr.yPlane, o, 1, subLim))
            commonAdjust(fr.yPlane, o, 1, useOuter = true)
          i += 1
        }
        c += 4
      }
    }
    if (mbY > 0) {
      i = 0
      while (i < 16) {
        val o = y0 * yS + x0 + i
        if (simpleThresh(fr.yPlane, o, yS, mbLim))
          commonAdjust(fr.yPlane, o, yS, useOuter = true)
        i += 1
      }
    }
    if (inner) {
      var r = 4
      while (r < 16) {
        i = 0
        while (i < 16) {
          val o = (y0 + r) * yS + x0 + i
          if (simpleThresh(fr.yPlane, o, yS, subLim))
            commonAdjust(fr.yPlane, o, yS, useOuter = true)
          i += 1
        }
        r += 4
      }
    }
  }

  private def filterMbNormal(fr: Frame, mbX: Int, mbY: Int, mbLim: Int,
      subLim: Int, interior: Int, hevT: Int, inner: Boolean): Unit = {
    val yS = fr.yStride
    val cS = fr.cStride
    val x0 = mbX * 16
    val y0 = mbY * 16
    val cx0 = mbX * 8
    val cy0 = mbY * 8
    var i = 0
    // left MB edge
    if (mbX > 0) {
      i = 0
      while (i < 16) {
        mbEdge(fr.yPlane, (y0 + i) * yS + x0, 1, mbLim, interior, hevT)
        i += 1
      }
      i = 0
      while (i < 8) {
        mbEdge(fr.uPlane, (cy0 + i) * cS + cx0, 1, mbLim, interior, hevT)
        mbEdge(fr.vPlane, (cy0 + i) * cS + cx0, 1, mbLim, interior, hevT)
        i += 1
      }
    }
    // vertical subblock edges
    if (inner) {
      var c = 4
      while (c < 16) {
        i = 0
        while (i < 16) {
          subblockEdge(fr.yPlane, (y0 + i) * yS + x0 + c, 1, subLim,
            interior, hevT)
          i += 1
        }
        c += 4
      }
      i = 0
      while (i < 8) {
        subblockEdge(fr.uPlane, (cy0 + i) * cS + cx0 + 4, 1, subLim,
          interior, hevT)
        subblockEdge(fr.vPlane, (cy0 + i) * cS + cx0 + 4, 1, subLim,
          interior, hevT)
        i += 1
      }
    }
    // top MB edge
    if (mbY > 0) {
      i = 0
      while (i < 16) {
        mbEdge(fr.yPlane, y0 * yS + x0 + i, yS, mbLim, interior, hevT)
        i += 1
      }
      i = 0
      while (i < 8) {
        mbEdge(fr.uPlane, cy0 * cS + cx0 + i, cS, mbLim, interior, hevT)
        mbEdge(fr.vPlane, cy0 * cS + cx0 + i, cS, mbLim, interior, hevT)
        i += 1
      }
    }
    // horizontal subblock edges
    if (inner) {
      var r = 4
      while (r < 16) {
        i = 0
        while (i < 16) {
          subblockEdge(fr.yPlane, (y0 + r) * yS + x0 + i, yS, subLim,
            interior, hevT)
          i += 1
        }
        r += 4
      }
      i = 0
      while (i < 8) {
        subblockEdge(fr.uPlane, (cy0 + 4) * cS + cx0 + i, cS, subLim,
          interior, hevT)
        subblockEdge(fr.vPlane, (cy0 + 4) * cS + cx0 + i, cS, subLim,
          interior, hevT)
        i += 1
      }
    }
  }

  // --------------------------------------------------------- RGB output

  /** BT.601 studio-swing integer conversion with 2x2 chroma
    * replication (see object doc for the libwebp-upsampler caveat).
    * `alpha` (from an ALPH chunk) upgrades the output to RGBA. */
  def toRgb(yuv: Yuv, alpha: Option[Array[Byte]] = None): RawImage = {
    val w = yuv.width
    val h = yuv.height
    val cw = (w + 1) >> 1
    val ch = alpha
    val channels = if (ch.isDefined) 4 else 3
    val out = new Array[Byte](w * h * channels)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = (yuv.y(y * w + x) & 0xff) - 16
        val d = (yuv.u((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        val e = (yuv.v((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        val o = (y * w + x) * channels
        out(o) = clamp255((298 * c + 409 * e + 128) >> 8).toByte
        out(o + 1) =
          clamp255((298 * c - 100 * d - 208 * e + 128) >> 8).toByte
        out(o + 2) = clamp255((298 * c + 516 * d + 128) >> 8).toByte
        if (channels == 4) out(o + 3) = ch.get(y * w + x)
        x += 1
      }
      y += 1
    }
    RawImage(w, h, channels, out)
  }
}
