package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Curation

/** The batch curation operators composed UNCHANGED on a stream: rule gate
  * (pure projections) + keyed-state fingerprint dedup. */
class CurationSpec extends AnyFunSuite with SparkTestSupport {

  private val clean = "the quick brown fox jumps over the lazy dog and it " +
    "runs far away into the deep dark woods where the old owl is watching " +
    "for the small grey mice that hide in the leaves near the river bank"

  test("streaming curation: gate drops rule-failures, dedup collapses variants") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = Curation.curate(stream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      stream.addData((1L, clean), (2L, "too short"), (3L, clean.toUpperCase))
      q.processAllAvailable()
      // later micro-batch: another formatting variant + a fresh doc
      stream.addData((4L, clean + "!!"), (5L, clean.replace("fox", "cat")))
      q.processAllAvailable()
      val got = spark.table("curated").collect().map(_.getLong(0)).toSet
      // 2 fails too_short; 3 and 4 are fingerprint-dups of 1 (case/punct)
      assert(got == Set(1L, 5L))
    } finally q.stop()
  }

  test("watermark-bounded curation keeps the original schema") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Curation.curateWithinWatermark(
      stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
    assert(out.columns.toSeq == Seq("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("curated_wm")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      stream.addData((1L, t0, clean), (2L, t0, clean))
      q.processAllAvailable()
      assert(spark.table("curated_wm").count() == 1)
    } finally q.stop()
  }
}
