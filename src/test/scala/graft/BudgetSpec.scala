package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Budget

class BudgetSpec extends AnyFunSuite with SparkTestSupport {

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    // quality descends with id so the expected selection is a prefix by id
    (0 until n).map(i => (i.toLong, 1.0 - i / 100.0, 10L + i % 3))
      .toDF("doc_id", "quality", "n_tokens")
  }

  test("selectByBudget keeps the best-quality prefix within the budget") {
    val d = corpus(50) // tokens 10/11/12 cycling, ~550 total
    val got = Budget.selectByBudget(d, "n_tokens", col("quality").desc,
      "doc_id", budget = 100L, partitions = 4)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // ids 0..8: 10+11+12+10+11+12+10+11+12 = 99 ≤ 100; id 9 would cross
    assert(got.keySet == (0L to 8L).toSet)
    assert(got(8L) == 99L)
  }

  test("matches the single-partition global window for any partition count") {
    val d = corpus(80)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expected = d.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= 300L)
      .select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = Budget.selectByBudget(d, "n_tokens", col("quality").desc,
        "doc_id", budget = 300L, partitions = parts)
        .select("doc_id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("selectByBudgetPerGroup: each group gets its own budgeted prefix") {
    val s = spark
    import s.implicits._
    // two sources: quality descends with id within each
    val d = (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "web" else "book", 1.0 - i / 100.0, 10L)
    }.toDF("doc_id", "source", "quality", "n_tokens")
    val got = Budget.selectByBudgetPerGroup(d, "n_tokens",
        col("quality").desc, "doc_id", "source", budget = 30L)
      .select("source", "doc_id", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // 3 best rows (30 tokens) per source, independently
    assert(got == Set(
      ("web", 0L, 10L), ("web", 2L, 20L), ("web", 4L, 30L),
      ("book", 1L, 10L), ("book", 3L, 20L), ("book", 5L, 30L)))
  }

  test("a budget under the first row's tokens selects nothing") {
    assert(Budget.selectByBudget(corpus(10), "n_tokens",
      col("quality").desc, "doc_id", budget = 5L, partitions = 2)
      .count() == 0)
  }

  test("selectTopPPerGroup: boundary row kept, groups independent") {
    val s = spark
    import s.implicits._
    val d = Seq(
      // group a: masses 50,30,20 (total 100) — p=0.6: keep 50 then 30
      // (excl cum 50 < 60), stop (excl cum 80 >= 60)
      (1L, "a", 50L), (2L, "a", 30L), (3L, "a", 20L),
      // group b: single row always kept (excl cum 0 < threshold)
      (4L, "b", 7L))
      .toDF("doc_id", "source", "mass")
    val got = Budget.selectTopPPerGroup(d, "mass", col("mass").desc,
        "doc_id", "source", p = 0.6)
      .select("doc_id", "cum_mass").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 50L), (2L, 80L), (4L, 7L)))
    // p = 1.0 keeps everything; p = 0.0 keeps nothing
    assert(Budget.selectTopPPerGroup(d, "mass", col("mass").desc,
      "doc_id", "source", 1.0).count() == 4)
    assert(Budget.selectTopPPerGroup(d, "mass", col("mass").desc,
      "doc_id", "source", 0.0).count() == 0)
  }
}
