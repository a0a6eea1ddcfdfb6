package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Shuffling

class ShufflingSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
  }

  test("deterministicShuffle emits a permutation of [0, n)") {
    val pos = Shuffling.deterministicShuffle(docs(100), "doc_id", "e0", 4)
      .select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 100L))
  }

  test("positions equal the single-partition global rank, for any partition count") {
    val d = docs(100)
    val expected = d
      .withColumn("k", md5(concat_ws("|", lit("e0"), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("k", "doc_id")) - 1)
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = Shuffling.deterministicShuffle(d, "doc_id", "e0", parts)
        .select("doc_id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("different seeds give different permutations (epoch re-keying)") {
    val d = docs(50)
    val a = Shuffling.deterministicShuffle(d, "doc_id", "e0", 4)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Shuffling.deterministicShuffle(d, "doc_id", "e1", 4)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a != b)
  }

  test("curriculumOrder: stages strictly ordered, shuffled within, a permutation") {
    val d = docs(90)
    val got = Shuffling.curriculumOrder(d, col("doc_id") % 3, "doc_id",
        "cur0", partitions = 4)
      .select("doc_id", "stage", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq == (0L until 90L))
    // stage blocks are contiguous: every stage-0 pos < every stage-1 pos < ...
    val byStage = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byStage(0L).max < byStage(1L).min)
    assert(byStage(1L).max < byStage(2L).min)
    // within a stage the order is the md5 rank, not id order
    assert(got.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq !=
      got.filter(_._2 == 0L).map(_._1).sorted.toSeq)
  }

  test("interleaveBySource: round-robin while sources last, a permutation") {
    val s = spark
    import s.implicits._
    // sources of unequal size: a×30, b×20, c×10
    val d = ((0 until 30).map(i => (i.toLong, "a")) ++
      (100 until 120).map(i => (i.toLong, "b")) ++
      (200 until 210).map(i => (i.toLong, "c")))
      .toDF("doc_id", "source")
    val got = Shuffling.interleaveBySource(d, "doc_id", "source", "e0", 4)
      .select("doc_id", "source", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3)
    assert(got.map(_._3).toSeq == (0L until 60L))
    // while all 3 sources live (first 30 positions): strict a,b,c cycle
    assert(got.take(30).map(_._2).toSeq ==
      Seq.fill(10)(Seq("a", "b", "c")).flatten)
    // after c exhausts: a,b cycle for the next 20
    assert(got.slice(30, 50).map(_._2).toSeq ==
      Seq.fill(10)(Seq("a", "b")).flatten)
    // tail is pure a
    assert(got.drop(50).forall(_._2 == "a"))
  }
}
