package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Maintenance

class MaintenanceSpec extends AnyFunSuite with SparkTestSupport {

  test("compactParquet collapses a small-files dataset, preserving rows") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft-smallfiles").toString
    val out = Files.createTempDirectory("graft-compacted").toString
    (1L to 10000L).map(i => (i, s"row $i")).toDF("id", "payload")
      .repartition(20).write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 20)
    val total = Maintenance.parquetBytes(s, in)
    val planned = Maintenance.compactParquet(s, in, out,
      targetFileBytes = (total + 1) / 2)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(planned == 2 && outFiles == 2, s"planned=$planned files=$outFiles")
    assert(s.read.parquet(out).count() == 10000L)
  }

  test("zstd archive compaction round-trips and shrinks repetitive text") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft-hot").toString
    val out = Files.createTempDirectory("graft-cold").toString
    // repetitive text compresses much better under zstd than snappy
    (1L to 2000L).map(i => (i, ("boilerplate chrome nav " * 40) + i))
      .toDF("id", "text")
      .repartition(4).write.mode("overwrite").parquet(in)
    Maintenance.compactParquet(s, in, out,
      targetFileBytes = Long.MaxValue, codec = "zstd")
    val back = s.read.parquet(out)
    assert(back.count() == 2000L)
    assert(back.agg(sum(length(col("text")))).head().getLong(0) ==
      s.read.parquet(in).agg(sum(length(col("text")))).head().getLong(0))
    assert(Maintenance.parquetBytes(s, out) <
      Maintenance.parquetBytes(s, in), "zstd rewrite should be smaller")
    val f = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(f.getName.contains("zstd"), f.getName)
  }

  test("sorted compaction lays rows out by range for stats pruning") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft-unsorted").toString
    val out = Files.createTempDirectory("graft-sorted").toString
    (1L to 1000L).reverse.map(i => (i, i % 7)).toDF("id", "v")
      .repartition(8).write.mode("overwrite").parquet(in)
    Maintenance.compactParquet(s, in, out,
      targetFileBytes = Maintenance.parquetBytes(s, in) / 2,
      sortCols = Seq("id"))
    // each output file covers a disjoint id range → per-file min/max spans
    // don't overlap
    val spans = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val d = s.read.parquet(f.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.min("id"),
            org.apache.spark.sql.functions.max("id")).head()
        (d.getLong(0), d.getLong(1))
      }.sortBy(_._1)
    assert(spans.length >= 2)
    spans.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping ranges: ${spans.mkString(",")}")
    }
  }

  test("snapshotDiff reports added/removed/changed, drops unchanged") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Maintenance.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }
  test("mergePartialAggregates: merged partials equal the full recompute") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 5L),
      ("a", 3L, 1L), ("b", 2L, 2L)).toDF("k", "id", "v")
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.groupBy("k").agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    // split NOT aligned with the group key → the merge must sum partials
    val merged = Maintenance.mergePartialAggregates(
      Seq(agg(rows.filter(col("id") % 2 === 0)),
        agg(rows.filter(col("id") % 2 === 1))), Seq("k"), Seq("sv", "n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val full = agg(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == full && full == Map("a" -> ((31L, 3L)),
      "b" -> ((7L, 2L))))
  }
}
