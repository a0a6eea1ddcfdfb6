package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Profiling

class ProfilingSpec extends AnyFunSuite with SparkTestSupport {

  test("groupBalance: shares, Lorenz cumulative and exact Gini") {
    val s = spark
    import s.implicits._
    // a:1, b:1, c:2 → sorted asc (a,b,c); Σ(i·n)=1+2+6=9, k=3, t=4
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "c")).toDF("id", "g")
    val rows = Profiling.groupBalance(d, "g")
      .orderBy("g").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 1L), ("c", 2L)))
    assert(rows.map(_.getAs[Double]("share")).toSeq ==
      Seq(0.25, 0.25, 0.5))
    assert(rows.map(_.getAs[Long]("cum_n")).toSeq == Seq(1L, 2L, 4L))
    val expectedGini = 2.0 * 9 / (3 * 4) - (3 + 1.0) / 3
    assert(rows.forall(_.getAs[Double]("gini") == expectedGini))
  }

  test("groupBalance: perfectly even mix has gini exactly 0") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("id", "g")
    val g = Profiling.groupBalance(d, "g").select("gini").head().getDouble(0)
    assert(g == 0.0)
  }

  test("histogram: integer edges, every row binned exactly once") {
    val s = spark
    import s.implicits._
    // 0..9 over 5 bins → width (9-0+5) DIV 5 = 2
    val d = (0L until 10L).toDF("v")
    val rows = Profiling.histogram(d, "v", bins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == (0L until 5L).map(b =>
      (b, 2 * b, 2 * b + 1, 2L)))
    assert(rows.map(_._4).sum == 10L)
  }

  test("histogram: degenerate single-value extent still bins (width 1)") {
    val s = spark
    import s.implicits._
    val d = Seq(7L, 7L, 7L).toDF("v")
    val rows = Profiling.histogram(d, "v", bins = 4).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(3)) == ((0L, 7L, 3L)))
  }

  test("robustOutliers: lower-median/MAD flags only the far tail") {
    val s = spark
    import s.implicits._
    // 1..7 + 100: med=4 (rank ceil(8/2)=4), deviations {0:1,1:2,2:2,3:2,
    // 96:1} → MAD=2; threshold 3·2=6 flags only 100
    val d = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L)).toDF("v")
    val rows = Profiling.robustOutliers(d, "v", k = 3).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("v") == 100L)
    assert(r.getAs[Long]("med") == 4L)
    assert(r.getAs[Long]("mad") == 2L)
  }

  test("robustOutliers: immune to the outlier it hunts (vs mean/stddev)") {
    val s = spark
    import s.implicits._
    // the 1e9 point would drag a mean-based z-score's center far off 10;
    // the median stays at 10 and still flags only the planted point
    val d = (Seq.fill(9)(10L) ++ Seq(1000000000L)).toDF("v")
    val rows = Profiling.robustOutliers(d, "v", k = 3).collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq == Seq(1000000000L))
    assert(rows.head.getAs[Long]("med") == 10L)
  }

  test("robustOutliers: high-cardinality domains take the prefix path " +
      "(no single-partition window)") {
    // VERDICT r18 #6: the median window is bounded by the VALUE DOMAIN
    // — fine for doc lengths, a single-task corpus window for id-like
    // columns. Past domainCap the medians must ride Census.prefix:
    // identical answer, per-range windows only.
    val s = spark
    import s.implicits._
    val d = ((1L to 200L) ++ Seq(100000L)).toDF("v") // 201 distinct values
    val viaWindow = Profiling.robustOutliers(d, "v", k = 3)
      .collect().map(_.getAs[Long]("v")).sorted.toSeq
    val guarded = Profiling.robustOutliers(d, "v", k = 3, domainCap = 100)
    assert(guarded.collect().map(_.getAs[Long]("v")).sorted.toSeq
      == viaWindow, "prefix-path medians diverged from the window path")
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(3000))
    assert(!plan.contains("windowspecdefinition(__v#") &&
      !plan.contains("windowspecdefinition(__d#"), plan.take(3000))
  }

  test("keyHeat: top-k by count, integer-exact hot flag") {
    val s = spark
    import s.implicits._
    // hot:16 of 24 rows (k=4 keys, mean 6): 16·4 > 2·24; others cold
    val d = (Seq.fill(16)("hot") ++ Seq.fill(4)("w") ++ Seq.fill(3)("x") ++
      Seq.fill(1)("y")).zipWithIndex.map(_.swap).toDF("id", "k")
    val rows = Profiling.keyHeat(d, "k", topK = 3, hotFactor = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Double]("share"), r.getAs[Boolean]("hot")))
    assert(rows.map(_._1).toSeq == Seq("hot", "w", "x")) // y cut by top-3
    assert(rows.head == (("hot", 16L, 16.0 / 24, true)))
    assert(rows.tail.forall(!_._4))
  }

  test("joinCardinality: exact Σ nl·nr without executing the join") {
    val s = spark
    import s.implicits._
    // left: a×2, b×3, c×1; right: a×4, b×1, d×5 → matches a:8, b:3 → 11
    val l = (Seq.fill(2)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map(_.swap).toDF("id", "k")
    val r = (Seq.fill(4)("a") ++ Seq("b") ++ Seq.fill(5)("d"))
      .zipWithIndex.map(_.swap).toDF("id", "k")
    val row = Profiling.joinCardinality(l, r, "k", "k").head()
    assert(row.getAs[Long]("est_rows") == 11L)
    assert(row.getAs[Long]("max_key_rows") == 8L)
    assert(row.getAs[String]("hot_key") == "a")
    assert(row.getAs[Long]("n_keys") == 2L)
    // the number it predicts is the number the real join produces
    assert(l.join(r, "k").count() == 11L)
  }

  test("joinCardinality hot_key tie resolves to the smallest key") {
    val s = spark
    import s.implicits._
    val l = Seq("a", "b").zipWithIndex.map(_.swap).toDF("id", "k")
    val row = Profiling.joinCardinality(l, l, "k", "k").head()
    assert(row.getAs[String]("hot_key") == "a")
  }
}
