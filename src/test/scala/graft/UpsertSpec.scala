package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Upsert

/** K2 keyed upsert = keep-latest-per-key (reference `visualizer.py:61-82`).
  * Property-tested: idempotent and last-write-wins under duplication and
  * reordering (SURVEY §5.2.4). */
class UpsertSpec extends AnyFunSuite with SparkTestSupport {

  import org.apache.spark.sql.functions._

  private def df(rows: Seq[(Int, Int, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("key", "seq", "payload")
  }

  private val rowsGen = Gen.nonEmptyListOf(for {
    k <- Gen.choose(0, 5)
    s <- Gen.choose(0, 20)
  } yield (k, s, s"v$k-$s"))

  test("property: result is the max-seq row per key, regardless of order/dupes") {
    val prop = Prop.forAll(rowsGen) { rows =>
      val expect = rows.groupBy(_._1).map { case (k, rs) =>
        (k, rs.map(_._2).max)
      }.toSet
      val got = Upsert.keepLatestPerKey(df(rows), Seq("key"), Seq("seq"))
        .select("key", "seq").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("idempotent: re-applying over its own output is a no-op") {
    val rows = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (1, 2, "b"))
    val once = Upsert.keepLatestPerKey(df(rows), Seq("key"), Seq("seq"))
    val twice = Upsert.keepLatestPerKey(once, Seq("key"), Seq("seq"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("deterministic under exact-tie via secondary order column") {
    val s = spark
    import s.implicits._
    val d = Seq((1, 1, "x"), (1, 1, "y")).toDF("key", "seq", "payload")
      .withColumn("tiebreak", col("payload"))
    val got = Upsert.keepLatestPerKey(d, Seq("key"), Seq("seq", "tiebreak"))
      .select("payload").head().getString(0)
    assert(got == "y")
  }
}
