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

  test("tiered join ≡ naive theta join on a heavy-tailed interval set") {
    val s = spark
    import s.implicits._
    // body: 120 short sessions (~10 min); tail: 4 multi-day windows
    val base = 1767225600L // 2026-01-01 00:00:00 UTC
    val shorts = (0 until 120).map { i =>
      (i.toLong, base + i * 700L, base + i * 700L + 600L)
    }
    val tails = (0 until 4).map { i =>
      (1000L + i, base + i * 20000L, base + i * 20000L + 5 * 86400L)
    }
    val iv = (shorts ++ tails).toDF("interval_id", "s_sec", "e_sec")
      .select(col("interval_id"),
        col("s_sec").cast("timestamp").as("start_ts"),
        col("e_sec").cast("timestamp").as("end_ts"))
    val ev = (0 until 500).map(i => (i.toLong, base - 3600L + i * 1200L))
      .toDF("event_id", "ts_sec")
      .select(col("event_id"), col("ts_sec").cast("timestamp").as("ts"))

    val expected = ev.join(iv,
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("interval_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    val got = RangeJoin.intervalJoinTiered(ev, "ts", iv,
        "start_ts", "end_ts", bucketSec = 600L, longBucketSec = 86400L)
      .select("interval_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)

    // the tier split bounds the explosion: single-tier fine buckets pay
    // span/600 for each 5-day tail interval; tiered pays the max of
    // (86400/600)+1 per short and (span/86400)+1 per tail
    val span = col("end_ts").cast("long") - col("start_ts").cast("long")
    val singleTier = RangeJoin.explodedRows(iv, "start_ts", "end_ts", 600L)
    val tiered =
      RangeJoin.explodedRows(iv.filter(span < 86400L),
        "start_ts", "end_ts", 600L) +
      RangeJoin.explodedRows(iv.filter(span >= 86400L),
        "start_ts", "end_ts", 86400L)
    assert(tiered * 5 < singleTier,
      s"tiered=$tiered singleTier=$singleTier")
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
