package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Guards
import graft.streaming.Guards.{Admitted, HHCandidate, IngestEvent}

/** Streaming admission guards: per-key quota and bounded-state
  * heavy-hitter candidates. */
class GuardsSpec extends AnyFunSuite with SparkTestSupport {

  test("admitQuota caps each key across triggers, exact counts") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[IngestEvent]
    val emitted = mutable.ArrayBuffer.empty[Admitted]
    val q = Guards.admitQuota(stream.toDS(), quota = 3L)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Admitted], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }.start()
    try {
      stream.addData(IngestEvent("a", 1L), IngestEvent("a", 2L),
        IngestEvent("b", 10L))
      q.processAllAvailable()
      stream.addData(IngestEvent("a", 3L), IngestEvent("a", 4L),
        IngestEvent("a", 5L), IngestEvent("b", 11L))
      q.processAllAvailable()
    } finally q.stop()
    val byKey = emitted.toList.groupBy(_.key)
    // key a: 2 admitted in trigger 1, exactly 1 more (cap 3) in trigger 2
    assert(byKey("a").map(_.n_admitted).sorted == List(1L, 2L, 3L))
    assert(byKey("a").count(_.doc_id >= 3L) == 1)
    assert(byKey("b").map(_.doc_id).sorted == List(10L, 11L))
  }

  test("heavyHitterCandidates: hot tokens surface, state stays bounded") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[String]
    val last = mutable.ArrayBuffer.empty[HHCandidate]
    val q = Guards.heavyHitterCandidates(stream.toDS(), buckets = 4, m = 3)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[HHCandidate], _: Long) =>
        last.synchronized { last.clear(); last ++= batch.collect() }
        ()
      }.start()
    try {
      stream.addData(Seq.fill(50)("hot") ++ (0 until 40).map(i => s"n$i"): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(30)("hot") ++ (40 until 80).map(i => s"n$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val cands = last.toList
    assert(cands.exists(_.token == "hot"), s"got $cands")
    // per-bucket summaries bounded by m
    cands.groupBy(_.bucket).foreach { case (_, cs) =>
      assert(cs.length <= 3)
    }
    // MG undercount bound: est >= true_freq - bucket_n/(m+1); "hot" has
    // 80 of its bucket's items, so est must be comfortably positive
    val hot = cands.find(_.token == "hot").get
    assert(hot.est >= 80L - hot.bucket_n / 4)
  }
}
