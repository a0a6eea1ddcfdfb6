package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Encoding

class EncodingSpec extends AnyFunSuite with SparkTestSupport {

  test("fixMojibake: unwinds cp1252-misread UTF-8, leaves clean text alone") {
    assert(Encoding.fixMojibake("cafÃ©") ==
      Encoding.Repaired("café", 1)) // cafÃ© → café
    // smart quote through the cp1252 C1 range: donâ€™t → don’t
    assert(Encoding.fixMojibake("donâ€™t") ==
      Encoding.Repaired("don’t", 1))
    // double-mangled unwinds twice
    assert(Encoding.fixMojibake("cafÃƒÂ©") ==
      Encoding.Repaired("café", 2))
    // clean text — ASCII, legitimate accents, non-Latin — is untouched
    for (clean <- Seq("plain ascii", "naïve café",
        "Привет", "", "日本語"))
      assert(Encoding.fixMojibake(clean) == Encoding.Repaired(clean, 0),
        clean)
    // null-safe
    assert(Encoding.fixMojibake(null) == Encoding.Repaired("", 0))
    // a genuine round trip: latin-1-misread UTF-8 (the lossless C1
    // flavor — ” lands on 0x9D, which cp1252 proper cannot express)
    val original = "smart “quotes”, dashes — and café"
    val mangled = new String(
      original.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Encoding.fixMojibake(mangled) == Encoding.Repaired(original, 1))
    // the JDK cp1252-misread flavor DESTROYS 0x9D (U+FFFD) — provably
    // not reversible, and the fixer must leave it alone
    val lossy = new String(
      original.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
    assert(Encoding.fixMojibake(lossy) == Encoding.Repaired(lossy, 0))
  }

  test("nfcNormalized: combining sequences and jamo compose; counts in codepoints") {
    val s = spark
    import s.implicits._
    val rows = Encoding.nfcNormalized(s, Seq(
        (1L, "cafe\u0301"), (2L, "caf\u00e9"), (3L, "\u1100\u1161"))
      .toDF("doc_id", "text")).collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).text_nfc == "caf\u00e9" && rows(1L).changed == 1 &&
      rows(1L).n_cp_before == 5 && rows(1L).n_cp_after == 4)
    assert(rows(2L).changed == 0)
    assert(rows(3L).text_nfc == "\uac00" && rows(3L).n_cp_after == 1)
    // the two spellings share one identity after NFC — the dedup point
    assert(rows(1L).text_nfc == rows(2L).text_nfc)
  }

  test("repair: distributed rows; dedup sees one identity after repair") {
    val s = spark
    import s.implicits._
    val rows = Encoding.repair(s, Seq(
        (1L, "cafÃ© menu"),
        (2L, "café menu"),
        (3L, "unrelated"))
      .toDF("doc_id", "text")).collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).text == rows(2L).text) // repaired twin joins clean doc
    assert(rows(1L).was_mojibake && !rows(2L).was_mojibake)
    assert(rows(3L).n_passes == 0)
  }

  test("repairCol / nfcCol expressions bit-identical to the typed kernels") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("cafÃ© menu", "donâ€™t stop", "plain ascii",
      "cafÃƒÂ© twice", "café", "café", "가",
      "", null)
    val got = texts.toDF("t")
      .select(col("t"),
        graft.ext.Encoding.repairCol(col("t")).as("rep"),
        graft.ext.Encoding.nfcCol(col("t")).as("nfc"))
      .collect()
    got.foreach { r =>
      val t = r.getAs[String]("t")
      val wantRep =
        if (t == null) null else graft.ext.Encoding.fixMojibake(t).text
      val wantNfc = if (t == null) null else graft.ext.Encoding.nfc(t)
      assert(r.getAs[String]("rep") == wantRep, s"repair of '$t'")
      assert(r.getAs[String]("nfc") == wantNfc, s"nfc of '$t'")
    }
  }
}
