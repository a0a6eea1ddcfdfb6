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
    val whole = Sketches.estimate(sk(rows)).head().getLong(1)
    val merged = Sketches.estimate(Sketches.mergeSketches(
        Seq(sk(rows.filter(col("odd"))), sk(rows.filter(!col("odd")))),
        Seq("g"))).head().getLong(1)
    assert(merged == whole) // same registers either way — merge is lossless
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
}
