package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Sketches

class SketchesSpec extends AnyFunSuite with SparkTestSupport {

  test("distinctSketch: exact at small cardinality, bounded error at 5k") {
    val s = spark
    import s.implicits._
    val small = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 9L))
      .toDF("g", "v")
    val est = Sketches.estimate(Sketches.distinctSketch(small, Seq("g"), "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 1L)) // HLL is exact when sparse
    val big = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "v")
    val e = Sketches.estimate(Sketches.distinctSketch(big, Seq("g"), "v"))
      .head().getLong(1)
    assert(math.abs(e - 5000L) <= 250, s"estimate $e off by >5%")
  }

  test("mergeSketches: union of disjoint partials equals the whole sketch") {
    val s = spark
    import s.implicits._
    val rows = (1 to 2000).map(i => ("t", i.toLong, i % 3 == 0))
      .toDF("g", "v", "odd")
    def sk(f: org.apache.spark.sql.DataFrame) =
      Sketches.distinctSketch(f, Seq("g"), "v")
    // NOT equality: the direct sketch answers with the order-dependent
    // HIP estimator, the multi-part union with the composite estimator
    // over the merged registers — past sparse mode the two differ by a
    // fraction of a percent on the SAME value set (the r11 scale
    // finding; see the mergeSketches scaladoc). The merge contract is
    // estimator agreement within bounds: both within the sketch
    // tolerance of exact, and within 1% of each other.
    val whole = Sketches.estimate(sk(rows)).head().getLong(1)
    val merged = Sketches.estimate(Sketches.mergeSketches(
        Seq(sk(rows.filter(col("odd"))), sk(rows.filter(!col("odd")))),
        Seq("g"))).head().getLong(1)
    assert(math.abs(merged - whole) <= math.max(1L, (0.01 * 2000).toLong),
      s"merged $merged vs whole $whole drifted past 1%")
    assert(math.abs(merged - 2000L) <= 100, s"merged $merged off exact >5%")
  }

  test("freqSketch: probe never underestimates and stays within eps*N") {
    val s = spark
    import s.implicits._
    // Zipf-ish: token i appears i times; N = 1+2+...+60 = 1830.
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(("g", s"tok$i")))
      .toDF("g", "v")
    val probed = Sketches.probeFreq(
      Sketches.freqSketch(rows, Seq("g"), "v"),
      Seq("tok1", "tok30", "tok60", "absent"), itemCol = "v")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = Map("tok1" -> 1L, "tok30" -> 30L, "tok60" -> 60L,
      "absent" -> 0L)
    val bound = math.ceil(Sketches.CmsEps * 1830).toLong
    exact.foreach { case (k, n) =>
      assert(probed(k) >= n, s"$k underestimated: ${probed(k)} < $n")
      assert(probed(k) <= n + bound, s"$k over by >eps*N: ${probed(k)}")
    }
  }

  test("mergeFreqSketches: disjoint partials merge to the whole sketch") {
    val s = spark
    import s.implicits._
    val rows = (1 to 1000).map(i => ("g", s"t${i % 97}", i % 2 == 0))
      .toDF("g", "v", "even")
    def sk(f: org.apache.spark.sql.DataFrame) =
      Sketches.freqSketch(f, Seq("g"), "v")
    val probes = (0 until 97 by 7).map(i => s"t$i") :+ "missing"
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.probeFreq(df, probes, itemCol = "v")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val whole = est(sk(rows))
    val merged = est(Sketches.mergeFreqSketches(
      Seq(sk(rows.filter(col("even"))), sk(rows.filter(!col("even")))),
      Seq("g")))
    assert(merged == whole) // counter addition is exact, same seed/layout
  }

  test("mergeFreqSketches: incompatible seeds fail loudly") {
    val s = spark
    import s.implicits._
    val rows = Seq(("g", "a")).toDF("g", "v")
    val a = Sketches.freqSketch(rows, Seq("g"), "v", seed = 1)
    val b = Sketches.freqSketch(rows, Seq("g"), "v", seed = 2)
    val ex = intercept[Exception] {
      Sketches.mergeFreqSketches(Seq(a, b), Seq("g")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(e => Option(e.getMessage).exists(m =>
        m.toLowerCase.contains("merge") || m.toLowerCase.contains("incompatible"))),
      s"unexpected failure: $ex")
  }

  test("mergeSketches: overlapping partials don't double count") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => ("t", i.toLong)).toDF("g", "v")
    val b = (51 to 150).map(i => ("t", i.toLong)).toDF("g", "v")
    val merged = Sketches.estimate(Sketches.mergeSketches(
      Seq(Sketches.distinctSketch(a, Seq("g"), "v"),
        Sketches.distinctSketch(b, Seq("g"), "v")), Seq("g")))
      .head().getLong(1)
    assert(merged == 150L) // sparse regime: exact despite the 50-id overlap
  }

  // ------------------------------------------------ histogram quantiles

  test("histSketch: merged partials equal the whole-data sketch exactly") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map(i => (s"g${i % 3}", (i * 7 % 400).toLong))
      .toDF("g", "v")
    val whole = Sketches.histSketch(rows, Seq("g"), "v", 50L)
    val merged = Sketches.mergeHistSketches(
      Seq(Sketches.histSketch(rows.filter(col("v") % 2 === 0), Seq("g"), "v", 50L),
        Sketches.histSketch(rows.filter(col("v") % 2 =!= 0), Seq("g"), "v", 50L)),
      Seq("g"))
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0)
  }

  test("histQuantiles: ceil(q*n) rank over binned values, per group") {
    val s = spark
    import s.implicits._
    // g=a: values 0..9 binned at width 3 -> bins 0,0,0,3,3,3,6,6,6,9.
    // n=10: q=0.25 -> rank 3 -> bin 0; q=0.5 -> rank 5 -> bin 3;
    // q=0.875 -> rank 9 -> bin 6.
    val rows = ((0 until 10).map(i => ("a", i.toLong)) :+ (("b", 100L)))
      .toDF("g", "v")
    val qs = Sketches.histQuantiles(
        Sketches.histSketch(rows, Seq("g"), "v", 3L), Seq("g"),
        Seq(0.25, 0.5, 0.875))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(qs == Map(("a", 0.25) -> 0L, ("a", 0.5) -> 3L, ("a", 0.875) -> 6L,
      ("b", 0.25) -> 99L, ("b", 0.5) -> 99L, ("b", 0.875) -> 99L))
  }

  test("histQuantiles: agrees with exact percentile_disc on binned values") {
    val s = spark
    import s.implicits._
    val rows = (1 to 997).map(i => (s"g${i % 4}", (i * 131 % 1000).toLong))
      .toDF("g", "v")
    val width = 25L
    val got = Sketches.histQuantiles(
        Sketches.histSketch(rows, Seq("g"), "v", width), Seq("g"),
        Seq(0.5, 0.875))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    // Exact reference: per group, sort binned values, take rank ceil(q*n).
    val byG = rows.collect().map(r => r.getString(0) ->
        (r.getLong(1) - r.getLong(1) % width))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; q <- Seq(0.5, 0.875)) {
      val want = vs(math.ceil(q * vs.length).toInt - 1)
      assert(got((g, q)) == want, s"group $g q=$q: ${got((g, q))} != $want")
    }
  }
}
