package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout evidence for the 100 TB design points: bucketed tables
  * co-locate joins (zero Exchange), partitioned layouts prune scans. The
  * operators elsewhere assume these hold; this spec proves the engine
  * actually plans them. */
class ScaleLayoutSpec extends AnyFunSuite with SparkTestSupport {

  test("bucketed tables join with ZERO shuffle Exchange") {
    val s = spark
    import s.implicits._
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(bcast)
    s.conf.set(bcast, "-1") // force a non-broadcast join so bucketing shows
    try {
      (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("bk_left")
      (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("bk_right")
      val joined = s.table("bk_left").join(s.table("bk_right"), "k")
      assert(joined.count() == 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // the same join WITHOUT bucketing must shuffle — the control arm
      val flat = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
        .join((1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb"), "k")
      assert(flat.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      s.conf.set(bcast, prev)
      s.sql("DROP TABLE IF EXISTS bk_left")
      s.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("partitioned parquet layout prunes to the filtered partition") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    (0 until 100).map(i => (i.toLong, s"d${i % 10}", i * 1.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = s.read.parquet(dir).filter(col("day") === "d3").select("id", "v")
    assert(q.count() == 10L)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PartitionFilters:") &&
      formatted.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"),
      s"no partition filter pushed:\n$formatted")
    // the physical proof: only 1 of 10 directories is read
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.exists(_.selectedPartitions.partitionCount == 1),
      s"expected exactly 1 selected partition")
  }
}
