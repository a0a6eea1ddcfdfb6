package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** Registry-wide physical-plan REGRESSION GATE (VERDICT r16 #3): the
  * r16 PlanAudit run was a one-off manual adjudication; this spec runs
  * the same audit over every registry query at sf0.001 inside
  * `sbt test` and fails on any plan feature appearing OUTSIDE the
  * adjudicated whitelist below — a typed map sneaking into a hot
  * census, a join degrading to cartesian, an SMJ appearing where a
  * broadcast used to be.
  *
  * The whitelist IS the adjudication record (SURVEY §18.11):
  *
  *   - deser = 2, the multimodal/audio/archive codec family: binary
  *     kernels (PNG/JPEG/GIF/TIFF/WebP/WAV decode, LZW, ADPCM) are
  *     partition-batched typed kernels BY DESIGN — a scalar expression
  *     cannot return decoded frames, and the boundary sits behind a
  *     bytes-level scan, not inside a census loop;
  *   - deser = 2, the q_text_* stage queries: the TYPED ops are
  *     registry contracts (per-doc accounting columns like
  *     n_passes/changed);
  *   - deser = 2, q_warc_media: decodes K POST-DEDUP representatives —
  *     bounded rows, not corpus rows;
  *   - smj = 2..4, the dedup pair/label families: both sides are
  *     corpus-sized signature/bucket tables — SMJ is the correct
  *     physical choice (neither side broadcastable);
  *   - cartesian: NEVER (the "nothing here is O(n²)" contract,
  *     Dedup.scala:11-25).
  *
  * Growing the whitelist is allowed but must be a REVIEWED diff here,
  * next to the reason — that's the point.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestSupport {

  /** Queries adjudicated to carry DeserializeToObject boundaries, with
    * the maximum adjudicated count. */
  private val deserWhitelist: Map[String, Int] = Map(
    // binary codec kernels (partition-batched typed kernels by design)
    "q_archive_media" -> 2, "q_archive_members" -> 2,
    "q_archive_samples" -> 2, "q_multimodal_aspect_buckets" -> 2,
    "q_multimodal_audio" -> 2, "q_multimodal_audio_dedup" -> 2,
    "q_multimodal_audio_resample" -> 2, "q_multimodal_audio_trim" -> 2,
    "q_multimodal_audio_windows" -> 2, "q_multimodal_av_meta" -> 2,
    "q_multimodal_content_dedup" -> 2, "q_multimodal_decode_real" -> 2,
    "q_multimodal_features" -> 2, "q_multimodal_gate" -> 2,
    "q_multimodal_image_features" -> 2, "q_multimodal_pixels" -> 2,
    "q_multimodal_pixels_bmp" -> 2, "q_multimodal_pixels_jpeg" -> 2,
    "q_multimodal_pixels_jpeg420" -> 2,
    "q_multimodal_pixels_jpeg_progressive" -> 2,
    "q_multimodal_pixels_tiff" -> 2, "q_multimodal_resize_real" -> 2,
    "q_multimodal_video_frames" -> 2,
    // r17 additions, same codec-kernel adjudication as the family
    "q_multimodal_pixels_webp" -> 2, "q_multimodal_webp_frames" -> 2,
    "q_multimodal_pixels_webp_lossy" -> 2, // r18: same codec family

    // typed-op registry contracts (per-doc accounting columns)
    "q_text_fix_mojibake" -> 2, "q_text_html_extract" -> 2,
    "q_text_json_drift" -> 2, "q_text_json_profile" -> 2,
    "q_text_nfc" -> 2, "q_text_url_canonical" -> 2,
    // bounded post-dedup representative decode
    "q_warc_media" -> 2)

  /** Queries adjudicated to sort-merge join (corpus × corpus sides),
    * with the maximum adjudicated count. */
  private val smjWhitelist: Map[String, Int] = Map(
    "q_dedup_cc" -> 2, "q_dedup_incremental_ngram" -> 4,
    "q_dedup_ngram_pairs" -> 2, "q_dedup_representatives" -> 2,
    "q_dedup_savings" -> 2, "q_dedup_semantic" -> 2,
    "q_snapshot_diff" -> 2, "q_split_leakfree" -> 2)

  test("registry plans: no NEW deser/SMJ/cartesian outside the adjudicated whitelist") {
    val audits = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(audits.nonEmpty)

    val failed = audits.filter(_.error.isDefined)
    assert(failed.isEmpty, "explain failed: " + failed.map(a =>
      s"${a.name}: ${a.error.get}").mkString("; "))

    val cartesian = audits.filter(_.cartesian > 0)
    assert(cartesian.isEmpty, "CARTESIAN PRODUCT in: " +
      cartesian.map(_.name).mkString(", "))

    val newDeser = audits.filter(a =>
      a.deser > deserWhitelist.getOrElse(a.name, 0))
    assert(newDeser.isEmpty,
      "DeserializeToObject outside the adjudicated whitelist " +
        "(a typed map in a hot path? adjudicate + whitelist or fix): " +
        newDeser.map(a => s"${a.name}=${a.deser}").mkString(", "))

    val newSmj = audits.filter(a =>
      a.smj > smjWhitelist.getOrElse(a.name, 0))
    assert(newSmj.isEmpty,
      "SortMergeJoin outside the adjudicated whitelist " +
        "(did a broadcast degrade?): " +
        newSmj.map(a => s"${a.name}=${a.smj}").mkString(", "))

    // the whitelist must not silently rot either: entries whose
    // feature DISAPPEARED should be removed (kept honest both ways)
    val byName = audits.map(a => a.name -> a).toMap
    val staleDeser = deserWhitelist.keys.filter(n =>
      byName.get(n).exists(_.deser == 0))
    assert(staleDeser.isEmpty, "whitelist entries with no deser left " +
      "(remove them): " + staleDeser.mkString(", "))
    val staleSmj = smjWhitelist.keys.filter(n =>
      byName.get(n).exists(_.smj == 0))
    assert(staleSmj.isEmpty, "whitelist entries with no SMJ left " +
      "(remove them): " + staleSmj.mkString(", "))
  }
}
