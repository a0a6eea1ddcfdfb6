package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Mojibake repair — the encoding-cleanup pass a web corpus needs
  * before dedup/scoring: text that went UTF-8 → bytes → misread as
  * windows-1252 (the browser-era default that CAUSED most mojibake)
  * shows as `cafÃ©` / `donâ€™t`, and hash-level dedup then sees the
  * clean and mangled spellings as distinct documents.
  *
  * The fixer is the deterministic inverse: encode the string back to
  * "sloppy" windows-1252 bytes (cp1252 punctuation + latin-1/C1
  * passthrough — any other char means the text is NOT that flavor of
  * mojibake) and strictly decode as UTF-8; accept only if the
  * round-trip succeeds AND shrinks (a genuine multi-byte collapse —
  * ASCII round-trips at equal length and is left alone).
  * Applied iteratively (bounded passes) so double-mangled text
  * (`cafÃƒÂ©`) unwinds fully. No heuristics beyond the strict
  * round-trip, so the DuckDB oracle pins exact outputs.
  */
object Encoding {

  private val MaxPasses = 4

  // "Sloppy" windows-1252 inverse: the 27 cp1252 punctuation chars map
  // to their 0x80-0x9F bytes, and chars ≤ 0xFF map to themselves —
  // INCLUDING the C1 controls at the five bytes cp1252 leaves
  // undefined (0x81/8D/8F/90/9D), which is how latin-1-flavored
  // decoders surface them. The JDK's strict cp1252 encoder rejects
  // those C1 chars (and its decoder turns the undefined bytes into
  // U+FFFD), so `donâ€�t`-style mojibake containing ” (0x9D) is only
  // reversible with this sloppy table — the same choice every
  // production mojibake fixer makes.
  private val cp1252FromChar: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** One repair attempt; None when `s` is not 1252-flavor mojibake. */
  private def unmangleOnce(s: String): Option[String] = {
    if (!s.exists(_ >= 0x80)) return None // pure ASCII: nothing to undo
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte
      else cp1252FromChar.get(c) match {
        case Some(b) => bytes(i) = b.toByte
        case None => return None // not representable → not mojibake
      }
      i += 1
    }
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < s.length) Some(out) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Repair result: the fixed text and how many unwind passes ran
    * (0 = text was clean). */
  final case class Repaired(text: String, passes: Int)

  /** Unwind windows-1252 mojibake up to [[MaxPasses]] times. */
  def fixMojibake(s0: String): Repaired = {
    var s = if (s0 == null) "" else s0
    var p = 0
    var more = true
    while (more && p < MaxPasses) {
      unmangleOnce(s) match {
        case Some(t) => s = t; p += 1
        case None => more = false
      }
    }
    Repaired(s, p)
  }

  /** The ONE NFC kernel (UAX #15 canonical composition via the JDK
    * Normalizer), shared by the typed op and the expression form. */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column form of [[fixMojibake]]'s repaired text, codegen'd
    * ([[graft.functions.MojibakeRepairExpr]]) — for curation chains
    * that gate on the text; the typed op keeps the pass accounting. */
  def repairCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnShim
    shim.column(graft.functions.MojibakeRepairExpr(shim.expression(c)))
  }

  /** Column form of [[nfc]], codegen'd
    * ([[graft.functions.NfcNormalizeExpr]]). */
  def nfcCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnShim
    shim.column(graft.functions.NfcNormalizeExpr(shim.expression(c)))
  }

  /** One NFC-normalized row (codepoint counts, not UTF-16 units). */
  final case class NfcDoc(doc_id: Long, text_nfc: String, changed: Int,
      n_cp_before: Long, n_cp_after: Long)

  /** Unicode NFC normalization over `(doc_id, text)` — the canonical-
    * composition pass that makes `e`+COMBINING ACUTE and precomposed
    * `é` one dedup identity (and one token for the BPE tier). The
    * oracle is genuinely independent here: DuckDB's `nfc_normalize`
    * is utf8proc, ours is the JDK's `java.text.Normalizer` — two
    * unrelated implementations of UAX #15 that must agree
    * byte-for-byte. */
  def nfcNormalized(spark: SparkSession, docs: DataFrame): Dataset[NfcDoc] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t0) =>
        val t = if (t0 == null) "" else t0
        val normalized = nfc(t)
        NfcDoc(id, normalized, if (normalized == t) 0 else 1,
          t.codePointCount(0, t.length).toLong,
          normalized.codePointCount(0, normalized.length).toLong)
      }
  }

  /** One repaired-document row. */
  final case class RepairedDoc(doc_id: Long, text: String,
      was_mojibake: Boolean, n_passes: Long)

  /** Distributed repair over `(doc_id, text)` — scan-fused map, no
    * shuffle, like the rest of the text tier. */
  def repair(spark: SparkSession, docs: DataFrame): Dataset[RepairedDoc] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val r = fixMojibake(t)
        RepairedDoc(id, r.text, r.passes > 0, r.passes.toLong)
      }
  }
}
