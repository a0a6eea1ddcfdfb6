package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AudioFixtures, MediaFixtures}
import graft.streaming.MediaGate

/** Ingest-time decodability gate: batch ≡ streaming, real decoders. */
class MediaGateSpec extends AnyFunSuite with SparkTestSupport {

  private def fixtures: Seq[(Long, Array[Byte])] = Seq(
    1L -> MediaFixtures.png1x1,
    2L -> MediaFixtures.jpegGray16x8,
    3L -> MediaFixtures.gifTwoFrames,
    4L -> AudioFixtures.wavSquare,
    5L -> MediaFixtures.jpeg4x2,          // header-only: no scan → drop
    6L -> "junk bytes".getBytes,          // not a container → drop
    7L -> MediaFixtures.pngRgb2x2.dropRight(30), // truncated mid-IDAT → drop
    8L -> MediaFixtures.jpeg420Quad16x16) // 4:2:0: admitted since r10

  private val expected = Set(
    (1L, "png", 1, 1, 4, 1L, 0),
    (2L, "jpeg", 16, 8, 1, 1L, 0),
    (3L, "gif", 4, 2, 3, 2L, 0),
    (4L, "wav", 0, 0, 1, 16L, 8000),
    (8L, "jpeg", 16, 16, 3, 1L, 0))

  test("batch gate admits only fully-decodable blobs with verified metadata") {
    val s = spark
    import s.implicits._
    val got = MediaGate.gate(s,
        fixtures.toDF("media_id", "content")).collect()
      .map(p => (p.media_id, p.kind, p.width, p.height, p.channels,
        p.n_frames, p.sample_rate)).toSet
    assert(got == expected)
  }

  test("streaming content dedup: re-encoded image dropped across micro-batches") {
    // Composition of the stateless content fingerprint (decode IS the
    // normalization) with the streaming exact-dedup operator: the
    // re-encoded twin of an already-seen image — different FILE bytes,
    // same pixels — is dropped even when it arrives in a LATER batch.
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, Array[Byte])]
    val fingerprinted = graft.ext.Multimodal.contentFingerprint(s,
      stream.toDF().toDF("media_id", "content")).toDF()
    val q = graft.streaming.StreamDedup.exact(fingerprinted, Seq("px_md5"))
      .writeStream.format("memory").queryName("media_content_dedup")
      .outputMode("append").start()
    try {
      stream.addData(1L -> MediaFixtures.pngGray3x2,
        3L -> MediaFixtures.jpegGray8x8)
      q.processAllAvailable()
      stream.addData(2L -> MediaFixtures.pngGray3x2Alt, // re-encoded twin
        4L -> MediaFixtures.gifTwoFrames)
      q.processAllAvailable()
      val kept = spark.table("media_content_dedup").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L)) // twin 2 deduped against batch-1's 1
    } finally q.stop()
  }

  test("streaming gate ≡ batch gate row-for-row across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = MediaGate.gate(s, stream.toDF().toDF("media_id", "content"))
      .writeStream.format("memory").queryName("media_gate")
      .outputMode("append").start()
    try {
      stream.addData(fixtures.take(3): _*)
      q.processAllAvailable()
      stream.addData(fixtures.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("media_gate").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getLong(5), r.getInt(6))).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
