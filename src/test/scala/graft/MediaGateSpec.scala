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
    7L -> MediaFixtures.pngRgb2x2.dropRight(30)) // truncated mid-IDAT → drop

  private val expected = Set(
    (1L, "png", 1, 1, 4, 1L, 0),
    (2L, "jpeg", 16, 8, 1, 1L, 0),
    (3L, "gif", 4, 2, 3, 2L, 0),
    (4L, "wav", 0, 0, 1, 16L, 8000))

  test("batch gate admits only fully-decodable blobs with verified metadata") {
    val s = spark
    import s.implicits._
    val got = MediaGate.gate(s,
        fixtures.toDF("media_id", "content")).collect()
      .map(p => (p.media_id, p.kind, p.width, p.height, p.channels,
        p.n_frames, p.sample_rate)).toSet
    assert(got == expected)
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
