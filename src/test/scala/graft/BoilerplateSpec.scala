package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Boilerplate

class BoilerplateSpec extends AnyFunSuite with SparkTestSupport {

  test("stripRepeatedLines: per-group frequency, order kept, empty docs") {
    val s = spark
    import s.implicits._
    val got = Boilerplate.stripRepeatedLines(s, Seq(
        (1L, "d1", "NAV\nalpha\nFOOT\nbeta"),
        (2L, "d1", "NAV\ngamma\nFOOT"),
        (3L, "d2", "NAV\nsolo page"),
        (4L, "d1", "NAV\nFOOT"))
      .toDF("doc_id", "group", "text"), minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3),
        r.getLong(4)))).toMap
    // interior position preserved: alpha then beta, FOOT gone between
    assert(got(1L) == (("alpha\nbeta", 2L, 2L)))
    assert(got(2L) == (("gamma", 1L, 2L)))
    // d2's NAV has df=1 in ITS group — survives
    assert(got(3L) == (("NAV\nsolo page", 2L, 0L)))
    // all-boilerplate page keeps an empty row, not a missing one
    assert(got(4L) == (("", 0L, 2L)))
    // blank lines never count toward boilerplate frequency
    val blanky = Boilerplate.stripRepeatedLines(s, Seq(
        (1L, "g", "a\n\nb"), (2L, "g", "c\n\nd"))
      .toDF("doc_id", "group", "text"), minDocs = 2).collect()
    assert(blanky.forall(_.getLong(4) == 0L)) // nothing dropped
  }

  test("anti-join strategy is semantics-free: broadcast ≡ shuffle ≡ auto") {
    val s = spark
    import s.implicits._
    // enough groups/lines that both join strategies do real work
    val docs = (1L to 60L).map { i =>
      val g = s"dom${i % 7}"
      (i, g, s"NAV $g\nunique body $i\nFOOTER $g\nextra ${i % 3}")
    }.toDF("doc_id", "group", "text")
    val modes = Seq(Some(true), Some(false), None).map { m =>
      Boilerplate.stripRepeatedLines(s, docs, minDocs = 2,
        broadcastBoiler = m).collect().map(_.toSeq).toSet
    }
    assert(modes(0) == modes(1), "broadcast vs forced-shuffle differ")
    assert(modes(0) == modes(2), "broadcast vs auto differ")
  }
}
