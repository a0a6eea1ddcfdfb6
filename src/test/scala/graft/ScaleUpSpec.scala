package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** tools/ScaleUp writes the bench-only sf1-equivalent fixture set; the
  * bench numbers it produces are only meaningful if the replication is
  * FK-CONSISTENT (joins resolve within a replica exactly as in the
  * base) and duplicate-rate-preserving (replica texts de-correlated).
  * This spec runs the replication at factor 2 over sf0.001 and locks
  * both properties. */
class ScaleUpSpec extends AnyFunSuite with SparkTestSupport {

  test("2x replication is FK-consistent and duplicate-rate-preserving") {
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("graft-scaleup")
      .toString
    graft.tools.ScaleUp.replicateTo(s, "/root/testdata/sf0.001", out, 2)
    def t(dir: String, name: String) = Tables(s, dir, name)
    val base = "/root/testdata/sf0.001"

    // row counts: dims copied once, facts doubled
    assert(t(out, "region").count() == t(base, "region").count())
    assert(t(out, "nation").count() == t(base, "nation").count())
    for (tbl <- Seq("customer", "orders", "lineitem", "documents",
        "embeddings", "events"))
      assert(t(out, tbl).count() == 2 * t(base, tbl).count(), tbl)

    // FK consistency: every lineitem resolves to an order and the
    // joined row count is exactly 2x the base join (no cross-replica
    // bleed), and the same for orders -> customer
    val joinBase = t(base, "lineitem").join(t(base, "orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val joinOut = t(out, "lineitem").join(t(out, "orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joinOut == 2 * joinBase)
    assert(t(out, "lineitem").join(t(out, "orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(t(out, "orders").join(t(out, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)

    // duplicate-rate preservation: exact-dup pairs (same normalized
    // text) must be exactly 2x the base count — replicas are vowel-
    // translated, so no doc gains a cross-replica twin
    def dupPairs(dir: String): Long = {
      val fp = t(dir, "documents").select(col("doc_id"),
        md5(graft.ext.Dedup.normalizedText(col("text"))).as("fp"))
      fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id")).count()
    }
    assert(dupPairs(out) == 2 * dupPairs(base))

    // embeddings: rotation preserves the norm (cosine structure within
    // a replica is rigid)
    val norms = t(out, "embeddings")
      .select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x * x).as("n2"))
    val basePairs = norms.filter(col("vec_id") < 10000000L)
      .join(norms.filter(col("vec_id") >= 10000000L)
          .select((col("vec_id") - 10000000L).as("vec_id"),
            col("n2").as("n2b")), Seq("vec_id"))
    assert(basePairs.filter(abs(col("n2") - col("n2b")) > 1e-3)
      .count() == 0)
  }
}
