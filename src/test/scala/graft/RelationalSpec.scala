package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shape + semantics locks for the relational-surface registry
  * (QueriesRelational); exact values are oracle-checked by the driver. */
class RelationalSpec extends AnyFunSuite with SparkTestSupport {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Queries.queries(name)(spark, dir)

  test("pivot emits the static five-type wide schema") {
    val df = q("q_pivot_monthly")
    assert(df.columns.toSeq ==
      Seq("ym", "click", "error", "purchase", "signup", "view"))
    assert(df.count() > 0)
  }

  test("set ops agree with the equivalent semi/anti joins") {
    val s = spark
    val cust = Tables(s, dir, "customer")
    val ords = Tables(s, dir, "orders")
    val exceptRows = q("q_set_except").count()
    val antiRows = cust.join(ords, col("c_custkey") === col("o_custkey"),
      "left_anti").select("c_custkey").distinct().count()
    assert(exceptRows == antiRows)
    val interRows = q("q_set_intersect").count()
    val semiRows = cust.filter(col("c_acctbal") > 5000.0)
      .join(ords, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").distinct().count()
    assert(interRows == semiRows)
  }

  test("top-k per group emits at most k rows per group, correctly ranked") {
    val df = q("q_topk_per_group").cache()
    try {
      val perGroup = df.groupBy("l_returnflag").count().collect()
      assert(perGroup.nonEmpty)
      assert(perGroup.forall(_.getLong(1) <= 3))
      // rank 1 really is the group max price
      val s = spark
      val maxes = Tables(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(max("l_extendedprice").as("mx")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      df.filter(col("rk") === 1).collect().foreach { r =>
        assert(r.getAs[Double]("l_extendedprice") ==
          maxes(r.getAs[String]("l_returnflag")))
      }
    } finally df.unpersist()
  }
}
