package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Serving

/** A3/A4/A5 serving rollups (reference `visualizer.py:193-283`), including
  * the parity mean-of-means semantics (SURVEY §2.5 note). */
class ServingSpec extends AnyFunSuite with SparkTestSupport {

  // Two days for game g in 2024/1: day1 avg=1.0 over 1 review, day2
  // avg=3.0 over 3 reviews. Mean-of-means = 2.0; weighted = (1+9)/4 = 2.5.
  private def view = {
    val s = spark
    import s.implicits._
    Seq(
      ("g", 2024, 1, 1, 1.0, 1L),
      ("g", 2024, 1, 2, 3.0, 3L),
      ("h", 2024, 1, 1, 10.0, 2L),
      ("h", 2024, 2, 1, 20.0, 2L))
      .toDF("app_name", "time_year", "time_month", "time_day",
        "A_value", "T_reviews")
  }

  test("timeSeries: parity mean-of-means over daily rows") {
    val r = Serving.timeSeries(view, "g", "A_value").head()
    assert(r.getAs[Double]("A_value") == 2.0)
    assert(r.getAs[String]("month_label") == "2024/1")
  }

  test("timeSeriesWeighted: true average weighted by row counts") {
    val r = Serving.timeSeriesWeighted(view, "g", "A_value").head()
    assert(r.getAs[Double]("A_value") == 2.5)
  }

  test("ranking: T_* sums, descending, granularity cascade") {
    val all = Serving.ranking(view, "T_reviews")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all == Seq(("g", 4L), ("h", 4L))) // tie → app_name tiebreak
    val feb = Serving.ranking(view, "T_reviews", year = Some(2024), month = Some(2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(feb == Seq(("h", 2L)))
  }

  test("ranking by A_* metric uses mean-of-means") {
    val got = Serving.ranking(view, "A_value", year = Some(2024))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("h", 15.0), ("g", 2.0)))
  }

  test("distinctGames") {
    assert(Serving.distinctGames(view).collect().map(_.getString(0)).toSeq ==
      Seq("g", "h"))
  }
}
