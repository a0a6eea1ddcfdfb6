package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Streaming dedup + sessionization over MemoryStream. */
class StreamDedupSpec extends AnyFunSuite with SparkTestSupport {

  test("exact streaming dedup keeps first occurrence across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamDedup.exact(stream.toDF().toDF("id", "payload"), Seq("id"))
      .writeStream.format("memory").queryName("sd_exact")
      .outputMode("append").start()
    try {
      stream.addData((1L, "a"), (2L, "b"), (1L, "a-dup"))
      q.processAllAvailable()
      stream.addData((2L, "b-dup"), (3L, "c"))
      q.processAllAvailable()
      val got = spark.table("sd_exact").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("fingerprint streaming dedup collapses formatting variants") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamDedup.byFingerprint(
        stream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("sd_fp")
      .outputMode("append").start()
    try {
      stream.addData((1L, "Hello, World!"), (2L, "hello   world"), (3L, "bye"))
      q.processAllAvailable()
      val got = spark.table("sd_fp").collect().map(_.getLong(0)).toSet
      assert(got.size == 2 && got.contains(3L))
    } finally q.stop()
  }

  test("againstReference drops docs already in the static corpus (modulo formatting)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val reference = Seq((100L, "Existing Training Doc!"), (101L, "another one"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val q = StreamDedup.againstReference(
        stream.toDF().toDF("doc_id", "text"), reference, "text")
      .writeStream.format("memory").queryName("sd_ref")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "existing   training doc"), // formatting variant of 100 → dropped
        (2L, "genuinely new content"))
      q.processAllAvailable()
      stream.addData((3L, "ANOTHER ONE"), (4L, "also new"))
      q.processAllAvailable()
      val got = spark.table("sd_ref").collect().map(_.getLong(0)).toSet
      assert(got == Set(2L, 4L))
    } finally q.stop()
  }

  test("watermark-bounded dedup drops dups within the delay") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(Long, Long)] // (id, epochSec)
    val df = stream.toDF().toDF("id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val q = StreamDedup.exactWithinWatermark(df, "ts", "10 minutes", Seq("id"))
      .writeStream.format("memory").queryName("sd_wm")
      .outputMode("append").start()
    try {
      stream.addData((1L, 1000L), (1L, 1010L), (2L, 1020L))
      q.processAllAvailable()
      assert(spark.table("sd_wm").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize merges events within the gap, splits beyond it") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[(String, Long)]
    val df = stream.toDF().toDF("user", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .withWatermark("ts", "1 hour")
    val q = StreamDedup.sessionize(df, "ts", "5 minutes", Seq(col("user")))
      .writeStream.format("memory").queryName("sd_sess")
      .outputMode("append").start()
    try {
      // u1: two events 60s apart (one session), then one 1h later (new
      // session); advance watermark far enough to close both.
      stream.addData(("u1", 1000L), ("u1", 1060L), ("u1", 5000L))
      q.processAllAvailable()
      stream.addData(("wm", 100000L))
      q.processAllAvailable()
      val sessions = spark.table("sd_sess").filter(col("user") === "u1")
        .select("n_events").collect().map(_.getLong(0)).sorted.toSeq
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }
}
