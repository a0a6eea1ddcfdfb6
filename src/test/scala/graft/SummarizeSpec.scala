package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Summarize, Transforms}

/** A1/A2 daily windowed aggregation (reference `summarizer.py:76-100`). */
class SummarizeSpec extends AnyFunSuite with SparkTestSupport {

  private val schema = StructType(Seq(
    StructField("app_id", LongType),
    StructField("app_name", StringType),
    StructField("timestamp_created", LongType),
    StructField("author_playtime_at_review", DoubleType),
    StructField("recommended", StringType),
    StructField("sentiment", FloatType)))

  private def summarize(rows: Row*) =
    Summarize.dailySummary(Transforms.normalize(
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)))

  test("rows straddling UTC midnight fall into distinct 1-day windows") {
    val df = summarize(
      Row(1L, "g", 86399L, 60.0, "true", 0.5f),   // 1970-01-01 23:59:59
      Row(1L, "g", 86400L, 60.0, "true", 0.5f))   // 1970-01-02 00:00:00
    val times = df.select("time").collect().map(_.getTimestamp(0).toInstant.getEpochSecond).sorted
    assert(times.toSeq == Seq(86400L, 172800L)) // exclusive window ends
  }

  test("six aggregates per (day, app): avg/count/conditional sums") {
    val df = summarize(
      Row(1L, "g", 100L, 60.0, "true", 0.5f),
      Row(1L, "g", 200L, 120.0, "false", -0.5f),
      Row(1L, "g", 300L, 180.0, "junk", 0.0f))
    val r = df.head()
    assert(r.getAs[Long]("T_reviews") == 3L)
    assert(r.getAs[Long]("T_recommendations") == 1L)
    assert(r.getAs[Long]("T_pos_reviews") == 1L)
    assert(r.getAs[Long]("T_neg_reviews") == 1L)
    assert(math.abs(r.getAs[Double]("A_playtime") - 2.0) < 1e-9) // (1+2+3)/3 hours
    assert(math.abs(r.getAs[Double]("A_sentiment") - 0.0) < 1e-9)
  }

  test("null sentiment/playtime are skipped by avg but counted in T_reviews") {
    val df = summarize(
      Row(1L, "g", 100L, null, "true", null),
      Row(1L, "g", 200L, 60.0, "true", 0.8f))
    val r = df.head()
    assert(r.getAs[Long]("T_reviews") == 2L)
    assert(math.abs(r.getAs[Double]("A_playtime") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("A_sentiment") - 0.8) < 1e-6)
  }

  test("separate apps never merge") {
    val df = summarize(
      Row(1L, "g1", 100L, 60.0, "true", 0.5f),
      Row(2L, "g2", 100L, 60.0, "true", 0.5f))
    assert(df.count() == 2)
  }
}
