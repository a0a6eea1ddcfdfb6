package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.Bucketing

class BucketingSpec extends AnyFunSuite with SparkTestSupport {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  private val left = df((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
    (5L, "e"), (6L, "f"))
  private val right = df((1L, "x"), (3L, "y"), (5L, "z"), (7L, "w"))
    .withColumnRenamed("k", "rk").withColumnRenamed("v", "rv")

  test("bucketed-bucketed equi join plans with no Exchange; sorted scan " +
      "elides the Sort under the output-ordering knob") {
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val orderingKnob = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bl = Bucketing.ensure(spark, "bspec_left", "k", 4)(left)
      val br = Bucketing.ensure(spark, "bspec_right", "rk", 4)(right)
      val joined = bl.join(br, bl("k") === br("rk"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"), plan.take(2000))
      // co-located plan still returns the right rows
      val got = joined.select(col("k"), col("v"), col("rv"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got == Set((1L, "a", "x"), (3L, "c", "y"), (5L, "e", "z")))
      // Spark ignores write-side sortBy metadata unless this (guarded:
      // only valid with one file per bucket, which writeBucketed
      // guarantees) knob is on — with it, SMJ needs no Sort either.
      spark.conf.set(orderingKnob, "true")
      val plan2 = bl.join(br, bl("k") === br("rk"))
        .queryExecution.executedPlan.toString
      assert(plan2.contains("SortMergeJoin"), plan2.take(2000))
      assert(!plan2.contains("Exchange"), plan2.take(2000))
      assert(!plan2.contains("Sort "), plan2.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
      spark.conf.unset(orderingKnob)
    }
  }

  test("aggregation on the bucket key needs no Exchange") {
    val bl = Bucketing.ensure(spark, "bspec_left", "k", 4)(left)
    val agg = bl.groupBy("k").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(agg.count() == 6)
  }

  test("ensure is idempotent and overwrite-safe within a JVM") {
    val again = Bucketing.ensure(spark, "bspec_left", "k", 4)(
      sys.error("build must not re-run for an ensured table"))
    assert(again.count() == 6)
  }
}
