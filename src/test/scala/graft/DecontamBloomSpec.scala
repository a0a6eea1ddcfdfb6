package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Decontam

/** The bloom-pre-filtered decontamination path must return the EXACT
  * answer of the broadcast-join path (the bloom only admits candidates),
  * and the probe must actually sit in the plan as a scan-side filter. */
class DecontamBloomSpec extends AnyFunSuite with SparkTestSupport {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("bloom path equals exact path on the fixture split") {
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    val exact = Decontam.contaminationHits(train, "text", "doc_id",
        eval_, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontam.contaminationHitsBloom(spark, train, "text",
        "doc_id", eval_, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact)
    assert(exact.values.sum > 0, "fixture split should have some hits")
  }

  test("tiny bloom (high fpp) still exact — verify join kills false positives") {
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    val exact = Decontam.contaminationHits(train, "text", "doc_id",
        eval_, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 512 bits for thousands of grams → fpp near 1; answer must not change
    val bloom = Decontam.contaminationHitsBloom(spark, train, "text",
        "doc_id", eval_, "text", n = 5,
        estimatedItems = 64, numBits = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact)
  }

  test("probe is in the plan as a filter; empty eval set returns zeros") {
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    val q = Decontam.contaminationHitsBloom(spark, train, "text", "doc_id",
      eval_, "text", n = 5)
    // the expression prints its internal prettyName, not the graft alias
    assert(q.queryExecution.optimizedPlan.toString
      .contains("might_contain"))
    val none = Decontam.contaminationHitsBloom(spark, train, "text",
        "doc_id", eval_.filter(lit(false)), "text", n = 5)
      .agg(sum("n_hits")).head().getLong(0)
    assert(none == 0L)
  }
}
