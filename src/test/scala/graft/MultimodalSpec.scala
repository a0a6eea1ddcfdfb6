package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestSupport {

  private def media = {
    val s = spark
    import s.implicits._
    Multimodal.mediaFromDocuments(
      Seq((1L, "hello world"), (2L, "x" * 2000)).toDF("doc_id", "text"))
  }

  test("decode: binary → typed metadata via the stubbed decoder") {
    val metas = Multimodal.decode(spark, media).collect()
      .map(m => m.media_id -> m).toMap
    assert(metas(1L).n_bytes == 11L)
    val (w, h, c) = Multimodal.decodeDims(11L)
    assert(metas(1L).width == w && metas(1L).height == h && metas(1L).channels == c)
    assert(metas(2L).n_bytes == 2000L)
  }

  test("decodeMeta expression fast-path ≡ partition-batched decode") {
    val viaExpr = Multimodal.decodeMeta(media).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val viaBatch = Multimodal.decode(spark, media).collect()
      .map(m => (m.media_id, m.kind, m.n_bytes, m.width, m.height,
        m.channels)).toSet
    assert(viaExpr == viaBatch)
  }

  test("resizePlan preserves aspect and never upscales") {
    val s = spark
    import s.implicits._
    val meta = Seq((1L, 2000, 1000), (2L, 100, 50)).toDF("media_id", "width", "height")
    val got = Multimodal.resizePlan(meta, 512).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))).toMap
    assert(got(1L) == ((512, 256)))
    assert(got(2L) == ((100, 50)))
  }

  test("sampleFrames: every stride-th frame with timestamps") {
    val s = spark
    import s.implicits._
    val meta = Seq((1L, 2.0)).toDF("media_id", "duration_sec")
    val frames = Multimodal.sampleFrames(meta, fps = 10, stride = 5)
      .select("frame_index", "ts_sec").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(frames == Seq((0L, 0.0), (5L, 0.5), (10L, 1.0), (15L, 1.5)))
  }

  test("featureExtract: fixed-dim deterministic vectors") {
    val a = Multimodal.featureExtract(spark, media, dim = 8)
      .select("media_id", "features").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val b = Multimodal.featureExtract(spark, media, dim = 8)
      .select("media_id", "features").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(a(1L).length == 8)
    assert(a == b)
    assert(a.values.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }
}
