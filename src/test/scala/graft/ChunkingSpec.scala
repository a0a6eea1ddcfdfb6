package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Chunking, TextStats, Vectors}

/** Chunking, vocabulary, and embedding-quantization semantics (training
  * tier 2); exact values additionally oracle-checked by the driver. */
class ChunkingSpec extends AnyFunSuite with SparkTestSupport {

  test("chunkByTokens windows with overlap; short and empty docs survive") {
    val s = spark
    import s.implicits._
    val doc100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc100), (2L, "only five tokens right here"),
      (3L, "")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "text", "doc_id",
      size = 40, stride = 30).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 3) // ceil((100-40)/30)+1
    assert(d1.map(_._3).toSeq == Seq(40, 40, 40))
    assert(d1(0)._4.startsWith("w1 w2 ") && d1(0)._4.endsWith(" w40"))
    assert(d1(1)._4.startsWith("w31 ") && d1(1)._4.endsWith(" w70"))
    assert(d1(2)._4.startsWith("w61 ") && d1(2)._4.endsWith(" w100"))
    // 10-token overlap between consecutive chunks
    assert(d1(0)._4.split(" ").takeRight(10).toSeq ==
      d1(1)._4.split(" ").take(10).toSeq)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._3 == 5)
    val d3 = out.filter(_._1 == 3L)
    assert(d3.length == 1 && d3(0)._3 == 0 && d3(0)._4 == "")
  }

  test("vocabulary counts tf with multiplicity and df per document") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "apple apple banana"), (2L, "apple cherry"))
      .toDF("doc_id", "text")
    val got = TextStats.vocabulary(df, "text", "doc_id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("apple" -> ((3L, 2L)), "banana" -> ((1L, 1L)),
      "cherry" -> ((1L, 1L))))
  }

  test("int8 quantization bounds, zero-vector safety, dequant error") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(3.0f, 2.0f, -3.0f, 1.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("scale", Vectors.maxAbs(col("embedding")))
      .withColumn("q", Vectors.quantizeInt8(col("embedding"), col("scale")))
      .withColumn("back", Vectors.dequantizeInt8(col("q"), col("scale")))
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(2),
      r.getSeq[Int](3), r.getSeq[Double](4), r.getSeq[Float](1))).toSeq
    rows.foreach { case (_, scale, q, back, orig) =>
      assert(q.forall(v => v >= -127 && v <= 127))
      orig.zip(back).foreach { case (x, xb) =>
        assert(math.abs(x.toDouble - xb) <= scale / 254 + 1e-12,
          s"dequant error too big: $x vs $xb (scale=$scale)")
      }
    }
    val zero = rows.find(_._1 == 2L).get
    assert(zero._2 == 0.0 && zero._3.forall(_ == 0))
    val full = rows.find(_._1 == 3L).get
    assert(full._3.toSeq == Seq(127, 85, -127, 64)) // 2/3*127=84.67→85, 1.5/3*127=63.5→64
  }
}
