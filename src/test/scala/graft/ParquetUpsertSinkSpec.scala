package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ParquetUpsertSink

/** Durable streaming upsert: multi-batch keep-latest materialization,
  * idempotent batch replay, and version pruning. */
class ParquetUpsertSinkSpec extends AnyFunSuite with SparkTestSupport {

  private def viewMap(dir: String): Map[String, Double] =
    ParquetUpsertSink.currentView(spark, dir).get
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap

  test("stream materializes keep-latest per key across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val base = Files.createTempDirectory("graft-upsert").toString
    val ckpt = Files.createTempDirectory("graft-upsert-ck").toString
    val stream = MemoryStream[(String, Long, Double)]
    val q = ParquetUpsertSink.start(
      stream.toDF().toDF("k", "seq", "v"),
      base, ckpt, keys = Seq("k"), orderCols = Seq("seq"))
    try {
      stream.addData(("a", 1L, 1.0), ("b", 1L, 10.0))
      q.processAllAvailable()
      assert(viewMap(base) == Map("a" -> 1.0, "b" -> 10.0))

      stream.addData(("a", 2L, 2.0), ("c", 1L, 30.0))
      q.processAllAvailable()
      assert(viewMap(base) == Map("a" -> 2.0, "b" -> 10.0, "c" -> 30.0))

      stream.addData(("a", 0L, -1.0)) // stale seq → must NOT win
      q.processAllAvailable()
      assert(viewMap(base) == Map("a" -> 2.0, "b" -> 10.0, "c" -> 30.0))
    } finally q.stop()
  }

  test("replaying a batchId is idempotent; versions are pruned") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-upsert2").toString
    val merge = ParquetUpsertSink.mergeBatch(s, base,
      keys = Seq("k"), orderCols = Seq("seq")) _
    merge(Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "seq", "v"), 0L)
    merge(Seq(("a", 2L, 5.0)).toDF("k", "seq", "v"), 1L)
    val before = viewMap(base)
    assert(before == Map("a" -> 5.0, "b" -> 2.0))
    // crash-replay of batch 1 (same data, same id) → identical snapshot
    merge(Seq(("a", 2L, 5.0)).toDF("k", "seq", "v"), 1L)
    assert(viewMap(base) == before)
    assert(ParquetUpsertSink.versions(s, base).last == 1L)
    // more batches → old versions pruned to the retention window
    merge(Seq(("c", 1L, 9.0)).toDF("k", "seq", "v"), 2L)
    merge(Seq(("d", 1L, 9.0)).toDF("k", "seq", "v"), 3L)
    val vs = ParquetUpsertSink.versions(s, base)
    assert(vs.length <= 2 && vs.last == 3L, s"versions=$vs")
    assert(viewMap(base) ==
      Map("a" -> 5.0, "b" -> 2.0, "c" -> 9.0, "d" -> 9.0))
  }
}
