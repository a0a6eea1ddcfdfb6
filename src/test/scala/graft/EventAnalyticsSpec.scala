package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite with SparkTestSupport {

  private def ev(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "tss", "event_type")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"),
        col("event_type"))
  }

  test("funnel is ORDER-sensitive: steps out of order don't convert") {
    val events = ev(
      // u1: full ordered funnel
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:05:00", "click"),
      (1L, "2026-01-01 10:10:00", "purchase"),
      // u2: purchase BEFORE click — chain stops at click
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 10:01:00", "purchase"),
      (2L, "2026-01-01 10:02:00", "click"),
      // u3: never viewed — not even step 1
      (3L, "2026-01-01 10:00:00", "click"),
      (3L, "2026-01-01 10:01:00", "purchase"),
      // u4: view only
      (4L, "2026-01-01 10:00:00", "view"))
    val row = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("funnel first-touch: the EARLIEST qualifying event anchors each step") {
    val events = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:01:00", "click"),   // anchors step 2
      (1L, "2026-01-01 10:02:00", "purchase"),
      (1L, "2026-01-01 10:03:00", "click"))
    val users = EventAnalytics.funnelUsers(events, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase")).head()
    assert(users.getLong(2) < users.getLong(3)) // t_2 (click) < t_3 (purchase)
  }

  test("cohortRetention: offsets count distinct users from their first day") {
    val events = ev(
      (1L, "2026-01-01 09:00:00", "view"),
      (1L, "2026-01-03 09:00:00", "click"),  // offset 2
      (2L, "2026-01-01 23:00:00", "view"),
      (2L, "2026-01-01 23:30:00", "click"),  // same day, still offset 0
      (3L, "2026-01-02 09:00:00", "view"))
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2026-01-01", 0) -> 2L, ("2026-01-01", 2) -> 1L,
      ("2026-01-02", 0) -> 1L))
  }
  test("validityIntervals: contiguous per-key history, open current row") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1L, "2026-01-01 10:00:00"),
      (2L, 1L, "2026-01-01 11:00:00"),
      (3L, 1L, "2026-01-01 12:00:00"),
      (4L, 2L, "2026-01-01 10:30:00"))
      .toDF("event_id", "user_id", "tss")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"))
    val got = EventAnalytics.validityIntervals(df, "user_id", "ts", "event_id")
      .select("event_id", "user_id", "valid_from", "valid_to", "is_current")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getBoolean(4))).toMap
    // u1's chain is contiguous: each valid_to == successor's valid_from
    assert(got(1L)._2 == got(2L)._1 && got(2L)._2 == got(3L)._1)
    assert(!got(1L)._3 && !got(2L)._3)
    // latest row per key is open-ended and current
    assert(got(3L) == ((got(3L)._1, -1L, true)))
    assert(got(4L) == ((got(4L)._1, -1L, true)))
  }
}
