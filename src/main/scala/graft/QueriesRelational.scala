package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational-surface queries the reference's dashboards imply but never
  * materialize as single statements: pivot (wide metric matrices), set
  * operations (cohort algebra), and per-group top-k (leaderboards beyond
  * the global ranking of §2.5 A4).
  *
  * Scale notes per query:
  *   - pivot with an EXPLICIT value list is one shuffle (groupBy ym) with
  *     map-side combine; without the list Spark first runs a distinct
  *     scan to discover pivot values — at 100 TB always pass the list.
  *   - except/intersect compile to left-anti / left-semi hash joins on
  *     the deduplicated inputs — same cost class as the join tier, no
  *     row-by-row set machinery.
  *   - per-group top-k is a window row_number + filter: one Exchange on
  *     the group key, one sort; AQE handles the skewed-group case. For
  *     tiny k over huge groups a two-phase (per-partition top-k, then
  *     merge) cuts the sort, but the window form is exact and simple —
  *     the two-phase variant only wins when k ≪ group size and spill is
  *     observed.
  */
object QueriesRelational {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables(s, dir, name)

  private def round4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000) + lit(0.5)) / lit(10000)

  /** Pivot value list — fixed as part of the query contract (the fixture's
    * five event types). Passing the list explicitly skips Spark's
    * values-discovery job AND makes the output schema static. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[QueryCase] = Seq(

    // Month × event_type sum matrix. Exact DECIMAL sums per cell, one
    // double cast + portable rounding at the end (Queries scaladoc).
    QueryCase("q_pivot_monthly",
      (s, dir) => t(s, dir, "events")
        .withColumn("ym", date_format(col("ts"), "yyyy-MM"))
        .groupBy("ym")
        .pivot("event_type", EventTypes)
        .agg(round4(sum(col("value").cast(DecimalType(20, 2))).cast("double"))),
      Some {
        val cells = EventTypes.map { et =>
          s"""floor(CAST(sum(CASE WHEN event_type = '$et'
             |   THEN CAST(value AS DECIMAL(20,2)) END) AS DOUBLE)
             |   * 10000 + 0.5) / 10000 AS "$et"""".stripMargin
        }.mkString(",\n ")
        s"""SELECT strftime(ts, '%Y-%m') AS ym,
           | $cells
           |FROM events GROUP BY 1""".stripMargin
      }),

    // Cohort EXCEPT: registered customers who never placed an order.
    // Compiles to a left-anti hash join over deduplicated keys.
    QueryCase("q_set_except",
      (s, dir) => t(s, dir, "customer").select("c_custkey")
        .except(t(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin)),

    // Cohort INTERSECT: high-balance customers who did order.
    // Compiles to a left-semi hash join over deduplicated keys.
    QueryCase("q_set_intersect",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_acctbal") > lit(5000.0))
        .select("c_custkey")
        .intersect(t(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin)),

    // Per-group top-k: 3 most expensive lineitems per return flag.
    // Total order inside each group (price DESC, then key columns) makes
    // row_number deterministic across engines.
    QueryCase("q_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))
        t(s, dir, "lineitem")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("l_returnflag", "rk", "l_orderkey", "l_linenumber",
            "l_extendedprice")
      },
      Some("""SELECT l_returnflag, rk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |      FROM lineitem)
        |WHERE rk <= 3""".stripMargin)),

    // Z-order (Morton) key (ops/ZOrder): the multi-dimension clustering
    // key behind zorderCompact, exposed as a query so the bit-interleave
    // arithmetic itself is oracle-checked (same mask+shift ladder as SQL).
    QueryCase("q_zorder_key",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.ZOrder.zvalue(col("l_partkey"), col("l_suppkey"))
            .as("zval")),
      Some(s"""SELECT l_orderkey, l_linenumber,
        | ${graft.ops.ZOrder.zvalueSql("l_partkey", "l_suppkey")} AS zval
        |FROM lineitem""".stripMargin))
  )
}
