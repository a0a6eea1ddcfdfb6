package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Transforms

/** F3–F7 normalization semantics (reference `summarizer.py:66-72`). */
class TransformsSpec extends AnyFunSuite with SparkTestSupport {

  private val schema = StructType(Seq(
    StructField("timestamp_created", LongType),
    StructField("author_playtime_at_review", DoubleType),
    StructField("recommended", StringType),
    StructField("sentiment", FloatType)))

  private def mk(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("recommended: 'true'/'false'/junk/null → boolean with otherwise(false)") {
    val df = Transforms.normalize(mk(
      Row(0L, 0.0, "true", 0.5f),
      Row(0L, 0.0, "false", 0.5f),
      Row(0L, 0.0, "maybe", 0.5f),
      Row(0L, 0.0, null, 0.5f)))
    assert(df.select("recommended").collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, false, false, false))
  }

  test("sentiment exactly 0.0 is neither positive nor negative") {
    val df = Transforms.normalize(mk(
      Row(0L, 0.0, "true", 0.3f),
      Row(0L, 0.0, "true", -0.3f),
      Row(0L, 0.0, "true", 0.0f)))
    val got = df.select("is_positive", "is_negative").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(got == Seq((true, false), (false, true), (false, false)))
  }

  test("null sentiment flags coalesce to false (aggregable)") {
    val df = Transforms.normalize(mk(Row(0L, 0.0, "true", null)))
    val r = df.select("is_positive", "is_negative").head()
    assert(!r.getBoolean(0) && !r.getBoolean(1))
  }

  test("epoch seconds → UTC timestamp; minutes → hours") {
    val df = Transforms.normalize(mk(Row(86400L, 120.0, "true", 0.5f)))
    val r = df.select("timestamp_created", "author_playtime_at_review").head()
    assert(r.getTimestamp(0).toInstant.getEpochSecond == 86400L)
    assert(r.getDouble(1) == 2.0)
  }
}
