package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Resample

class ResampleSpec extends AnyFunSuite with SparkTestSupport {

  test("dailyForwardFill: gaps materialized, last value carried, per-key spans") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "2026-01-01 09:00:00", 10.0),
      (1L, "2026-01-01 17:00:00", 5.0), // same day → one 15.0 row
      (1L, "2026-01-02 09:00:00", 7.0),
      (1L, "2026-01-05 09:00:00", 1.0), // days 3,4 are gaps
      (2L, "2026-02-10 12:00:00", 2.0)) // disjoint span, single day
      .toDF("user_id", "tss", "value")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"),
        col("value"))
    val got = Resample.dailyForwardFill(ev, "user_id", "ts", "value")
      .select(col("uid"), col("day").cast("string"),
        col("filled").cast("double"), col("is_gap"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, "2026-01-01", 15.0, false),
      (1L, "2026-01-02", 7.0, false),
      (1L, "2026-01-03", 7.0, true), // carried forward
      (1L, "2026-01-04", 7.0, true),
      (1L, "2026-01-05", 1.0, false),
      (2L, "2026-02-10", 2.0, false))) // u2's span is its own min..max
  }
}
