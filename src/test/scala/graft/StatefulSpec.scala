package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stateful
import graft.streaming.Stateful.{AppStats, ReviewEvent, SentimentAlert}

class StatefulSpec extends AnyFunSuite with SparkTestSupport {

  test("runningAppStats accumulates per-key state across triggers") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[ReviewEvent]
    val emitted = mutable.ArrayBuffer.empty[AppStats]
    val q = Stateful.runningAppStats(stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[AppStats], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }.start()
    try {
      stream.addData(ReviewEvent(1L, 1.0), ReviewEvent(1L, 0.0),
        ReviewEvent(2L, -1.0))
      q.processAllAvailable()
      stream.addData(ReviewEvent(1L, 0.5))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = emitted.toList
    assert(byBatch.contains(AppStats(1L, 2L, 0.5)))   // trigger 1: (1+0)/2
    assert(byBatch.contains(AppStats(2L, 1L, -1.0)))
    assert(byBatch.contains(AppStats(1L, 3L, 0.5)))   // trigger 2: (1+0+0.5)/3
    // key 2 untouched in trigger 2 → no re-emission
    assert(byBatch.count(_.app_id == 2L) == 1)
  }

  test("sentimentAlerts emits only on threshold crossings") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[ReviewEvent]
    val emitted = mutable.ArrayBuffer.empty[SentimentAlert]
    val q = Stateful.sentimentAlerts(stream.toDS(), threshold = 0.0)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[SentimentAlert], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }.start()
    try {
      stream.addData(ReviewEvent(1L, 0.5))          // first sight: no alert
      q.processAllAvailable()
      stream.addData(ReviewEvent(1L, -2.0))         // mean → -0.75: drop alert
      q.processAllAvailable()
      stream.addData(ReviewEvent(1L, -0.1))         // stays below: silent
      q.processAllAvailable()
      stream.addData(ReviewEvent(1L, 3.0))          // mean → +0.35: recovery
      q.processAllAvailable()
    } finally q.stop()
    val alerts = emitted.toList.map(a => (a.direction, a.n_reviews))
    assert(alerts == List((-1, 2L), (1, 4L)), s"got $emitted")
  }
}
