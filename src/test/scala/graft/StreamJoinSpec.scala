package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

class StreamJoinSpec extends AnyFunSuite with SparkTestSupport {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("interval join matches within the time bound, not outside") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF().toDF("user", "cts"),
      views.toDF().toDF("user", "vts"),
      key = "user", leftTime = "cts", rightTime = "vts",
      before = "10 seconds", after = "0 seconds", delay = "5 seconds")
    val rows = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = joined
      .selectExpr("l.user", "CAST(cts AS LONG)", "CAST(vts AS LONG)")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }.start()
    try {
      views.addData((1L, ts(100)), (1L, ts(85)), (2L, ts(100)))
      clicks.addData((1L, ts(105)))   // view@100 within 10s; view@85 too old
      q.processAllAvailable()
    } finally q.stop()
    assert(rows.toList == List((1L, 105L, 100L)),
      s"expected exactly the in-window same-key match, got $rows")
  }
}
