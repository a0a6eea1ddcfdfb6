package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.JsonCodec
import graft.model.Review

/** F1/F2/F9/F10 Kafka JSON envelope (reference `summarizer.py:61-63,104`). */
class JsonCodecSpec extends AnyFunSuite with SparkTestSupport {

  test("decode: declared schema applied; JSON booleans coerce to strings") {
    val s = spark
    import s.implicits._
    // The reference wire quirk (SURVEY §1.3): `recommended` is a JSON
    // boolean on the wire but declared StringType — from_json coerces it
    // to the string "true"/"false", which normalize() then thresholds.
    val json =
      """{"index":1,"app_id":10,"app_name":"g","review_id":5,
        |"recommended":true,"sentiment":0.5,"timestamp_created":100}"""
        .stripMargin.replaceAll("\n", "")
    val frames = Seq(json).toDF("value")
    val row = JsonCodec.decode(frames, Review.schema).head()
    assert(row.getAs[Long]("app_id") == 10L)
    assert(row.getAs[String]("recommended") == "true")
    assert(row.getAs[Float]("sentiment") == 0.5f)
    assert(row.getAs[Any]("language") == null) // absent field → null
  }

  test("decode: malformed JSON → all-null row, not a failure") {
    val s = spark
    import s.implicits._
    val row = JsonCodec.decode(Seq("not json{").toDF("value"), Review.schema).head()
    assert(row.getAs[Any]("app_id") == null)
  }

  test("encode/decode roundtrip preserves values; key is stringified") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((7L, "g", 0.25)).toDF("app_id", "app_name", "score")
    val framed = JsonCodec.encode(df, col("app_id"))
    assert(framed.columns.toSeq == Seq("key", "value"))
    val r = framed.head()
    assert(r.getString(0) == "7")
    assert(r.getString(1).contains("\"app_name\":\"g\""))
  }
}
