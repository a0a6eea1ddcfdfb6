package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning: when a shuffle join's build side
  * carries a selective filter, Catalyst (InjectRuntimeFilter) builds a
  * bloom filter over the build-side keys and pushes a
  * `might_contain` probe onto the probe side — at 100 TB this skips
  * shuffling fact rows whose keys can't possibly survive the join.
  *
  * The prod thresholds (`applicationSideScanSizeThreshold` 10GB) are sized
  * for clusters; the test lowers them to make the optimization fire on a
  * fixture-sized input and then asserts the probe is actually in the plan —
  * proving the engine's query shapes (selective dim filter + equi-join on
  * the fact key, exactly the q_join_* family) are eligible.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestSupport {

  test("selective dim filter injects a bloom-filter probe on the fact side") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-rtf").toString
    (1L to 20000L).map(i => (i % 500, s"p$i", i * 1.0))
      .toDF("fk", "payload", "v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 500L).map(i => (i, s"d$i", (i % 7).toInt))
      .toDF("dk", "dname", "dflag")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // prod default 10GB — scaled down so the fixture qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast would make runtime filtering moot
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val fact = s.read.parquet(s"$dir/fact")
      val dim = s.read.parquet(s"$dir/dim").filter(col("dflag") === 3)
      val q = fact.join(dim, col("fk") === col("dk"))
        .groupBy("dname").agg(sum("v").as("sv"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom-filter probe injected:\n$optimized")
      // and it still computes the right thing
      assert(q.count() ==
        s.read.parquet(s"$dir/dim").filter(col("dflag") === 3).count())
    } finally {
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }
}
