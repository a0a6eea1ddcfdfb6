package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkTestSupport {

  private def fixtures = {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, "2026-01-01 00:10:00"), (2L, "2026-01-01 00:59:59"),
      (3L, "2026-01-01 01:00:00"), (4L, "2026-01-01 05:30:00"),
      (5L, "2026-01-01 23:00:00"))
      .toDF("event_id", "tss")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"))
    val intervals = Seq(
      (100L, "2026-01-01 00:00:00", "2026-01-01 01:00:00"), // half-open: excl. ev 3
      (200L, "2026-01-01 00:30:00", "2026-01-01 06:00:00"), // evs 2,3,4
      (300L, "2026-01-02 00:00:00", "2026-01-02 01:00:00")) // empty
      .toDF("interval_id", "s", "e")
      .select(col("interval_id"), col("s").cast("timestamp").as("start_ts"),
        col("e").cast("timestamp").as("end_ts"))
    (events, intervals)
  }

  test("point-in-interval semantics, half-open bounds, multi-bucket spans") {
    val (ev, iv) = fixtures
    for (bucket <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.intervalJoin(ev, "ts", iv,
        "start_ts", "end_ts", bucket)
        .select("interval_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 1L), (100L, 2L),
        (200L, 2L), (200L, 3L), (200L, 4L)), s"bucket=$bucket")
    }
  }

  test("plans an equi join on the bucket key, not a nested loop") {
    val (ev, iv) = fixtures
    val plan = RangeJoin.intervalJoin(ev, "ts", iv,
      "start_ts", "end_ts", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // control arm: the bare theta join IS the nested loop
    val theta = ev.join(iv,
      col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .queryExecution.executedPlan.toString
    assert(theta.contains("BroadcastNestedLoopJoin"), theta.take(1500))
  }
}
