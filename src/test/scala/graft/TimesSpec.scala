package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.ops.Times

/** Locks the TIMESTAMP_NTZ tolerance of the epoch helpers (the round-6
  * bench regression: the regenerated events fixture surfaces as NTZ and
  * bare unix_micros/numeric casts reject it). Session timezone is UTC
  * (SparkTest builder), so both kinds map to identical instants. */
class TimesSpec extends AnyFunSuite with SparkTestSupport {

  private val isoMicros = "2024-03-01T12:34:56.789012"

  private def oneRow = {
    val s = spark
    import s.implicits._
    Seq(isoMicros).toDF("iso")
      .withColumn("ltz", col("iso").cast(TimestampType))
      .withColumn("ntz", col("iso").cast(TimestampNTZType))
  }

  test("micros agrees across TIMESTAMP and TIMESTAMP_NTZ input") {
    val r = oneRow.select(
      Times.micros(col("ltz")).as("m1"),
      Times.micros(col("ntz")).as("m2")).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) == 1709296496789012L)
  }

  test("seconds agrees across TIMESTAMP, NTZ, and numeric epoch input") {
    val r = oneRow
      .withColumn("num", lit(1709296496L))
      .select(Times.seconds(col("ltz")).as("s1"),
        Times.seconds(col("ntz")).as("s2"),
        Times.seconds(col("num")).as("s3")).head()
    assert(r.getLong(0) == 1709296496L)
    assert(r.getLong(1) == 1709296496L)
    assert(r.getLong(2) == 1709296496L)
  }

  test("bare unix_micros still rejects NTZ (the guarded failure mode)") {
    val e = intercept[Exception] {
      oneRow.select(unix_micros(col("ntz"))).head()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH")
      || e.getMessage.toLowerCase.contains("timestamp_ntz"))
  }
}
