package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based approximate aggregates — the 100 TB substitutes for their
  * exact cousins (HLL++ for COUNT(DISTINCT), KLL-ish quantile sketch for
  * percentile): constant memory per group, one pass, mergeable across
  * partitions. Not DuckDB-oracle-comparable by construction (different
  * sketch families) — bounded-error asserted here instead. */
class AnalyticsSpec extends AnyFunSuite with SparkTestSupport {

  test("approx_count_distinct lands within the configured relative error") {
    val s = spark
    import s.implicits._
    val d = (1L to 20000L).map(i => i % 5000).toDF("u")
    val approx = d.agg(approx_count_distinct(col("u"), rsd = 0.02))
      .head().getLong(0)
    assert(math.abs(approx - 5000.0) / 5000.0 < 0.06,
      s"approx=$approx for true 5000")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val s = spark
    import s.implicits._
    val d = (0 until 10001).map(_.toDouble).toDF("v")
    val Seq(p50, p99) = d
      .agg(expr("approx_percentile(v, array(0.5, 0.99), 10000)"))
      .head().getSeq[Double](0).toSeq
    assert(math.abs(p50 - 5000.0) <= 10.0, s"p50=$p50")
    assert(math.abs(p99 - 9900.0) <= 20.0, s"p99=$p99")
  }
}
