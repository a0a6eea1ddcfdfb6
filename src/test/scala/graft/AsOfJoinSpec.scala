package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkTestSupport {

  private def frames = {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L), (4L, "B", 5L))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", 5L, 100L, 1.0), ("A", 20L, 101L, 2.0), ("A", 20L, 102L, 3.0),
      ("A", 30L, 103L, 4.0), ("B", 50L, 104L, 9.0))
      .toDF("sym", "qts", "qid", "px")
    (trades, quotes)
  }

  private def run(strict: Boolean): Map[Long, Option[Double]] = {
    val (trades, quotes) = frames
    AsOfJoin.asofJoin(trades, quotes, keys = Seq("sym"),
        leftTime = "ts", rightTime = "qts", valueCols = Seq("px"),
        tieBreak = "qid", strict = strict)
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("asof_px")).map(_.asInstanceOf[Double]))
      .toMap
  }

  test("inclusive asof: latest quote at-or-before, max tiebreak on ties") {
    val got = run(strict = false)
    assert(got(1L).contains(1.0))  // ts 10 → quote at 5
    assert(got(2L).contains(3.0))  // ts 20 → simultaneous quotes, qid 102 wins
    assert(got(3L).contains(4.0))  // ts 35 → quote at 30
    assert(got(4L).isEmpty)        // B's only quote is later
  }

  test("strict asof excludes simultaneous right rows") {
    val got = run(strict = true)
    assert(got(2L).contains(1.0))  // ts 20 → only the quote at 5 qualifies
    assert(got(1L).contains(1.0) && got(3L).contains(4.0))
  }

  test("left rows never leak to other keys and survive with no match") {
    val got = run(strict = false)
    assert(got.size == 4)
  }
}
