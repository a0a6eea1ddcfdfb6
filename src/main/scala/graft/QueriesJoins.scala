package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join-operator registry over the TPC-H-ish fixture star schema.
  *
  * The reference surface has no joins (SURVEY §2.4); these demonstrate the
  * join capability the engine inherits and the physical strategies a
  * 100 TB deployment leans on:
  *
  *   - dimension enrichment → `broadcast()` hash join (no shuffle of the
  *     fact side; the explicit hint documents intent even where the
  *     autoBroadcastJoinThreshold would pick it anyway),
  *   - fact-to-fact → shuffle join on the key (sort-merge / shuffled-hash
  *     picked by the planner+AQE; both sides hash-partition once),
  *   - existence checks → left_semi / left_anti (no payload duplication,
  *     build side reduced to the key set).
  *
  * Float discipline: every summed measure is 2-decimal in the fixture, so
  * sums go through exact DECIMAL and only the final projection converts to
  * double (same as [[Queries]]).
  */
object QueriesJoins {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables(s, dir, name)

  private def round4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000) + lit(0.5)) / lit(10000)

  val all: Seq[QueryCase] = Seq(

    // Broadcast dimension join: events enriched with the customer dim,
    // aggregated per market segment.
    QueryCase("q_join_broadcast",
      (s, dir) => t(s, dir, "events")
        .join(broadcast(t(s, dir, "customer")),
          col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_v"),
          count(lit(1)).as("n_events"))
        .select(col("c_mktsegment"), round4(col("sum_v")).as("sum_value"),
          col("n_events")),
      Some("""SELECT c_mktsegment,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000
        |   AS sum_value,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)),

    // Fact-to-fact shuffle join: lineitem x orders, revenue per priority.
    QueryCase("q_join_fact",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(20, 2)) *
            (lit(1).cast(DecimalType(3, 2)) -
              col("l_discount").cast(DecimalType(3, 2)))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .select(col("o_orderpriority"), round4(col("revenue")).as("revenue"),
          col("n_items")),
      Some("""SELECT o_orderpriority,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) * 10000 + 0.5) / 10000
        |   AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)),

    // Multi-way broadcast chain up the dimension hierarchy.
    QueryCase("q_join_snowflake",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(DecimalType(20, 2))).cast("double")
            .as("sum_bal"))
        .select(col("r_name"), col("n_customers"),
          round4(col("sum_bal")).as("sum_acctbal")),
      Some("""SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
        | floor(CAST(sum(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000
        |   AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)),

    // Existence joins: customers with / without event activity.
    QueryCase("q_join_semi",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "events"), col("c_custkey") === col("user_id"),
          "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT user_id FROM events)""".stripMargin)),

    QueryCase("q_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "events"), col("c_custkey") === col("user_id"),
          "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT user_id FROM events)""".stripMargin)),

    // Skew-safe salted join (ops/Skew.saltedJoin): the big side is salted,
    // the dim replicated ×32, the join runs on (key, salt) — the hot key's
    // rows spread over 32 reduce tasks instead of one. Must be EXACTLY the
    // plain join (oracle computes the unsalted form); aggregation goes
    // through exact DECIMAL so salt-dependent partial order can't perturb
    // the double sum.
    QueryCase("q_join_salted",
      (s, dir) => graft.ops.Skew.saltedJoin(
          t(s, dir, "events"),
          t(s, dir, "customer").withColumnRenamed("c_custkey", "user_id"),
          keys = Seq("user_id"), saltBuckets = 32)
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_v"),
          count(lit(1)).as("n_events"))
        .select(col("c_mktsegment"), round4(col("sum_v")).as("sum_value"),
          col("n_events")),
      Some("""SELECT c_mktsegment,
        | floor(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) * 10000 + 0.5) / 10000
        |   AS sum_value,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)),

    // As-of join (union-window form, ops/AsOfJoin): every order annotated
    // with the same customer's most recent STRICTLY-PRIOR order total —
    // one Exchange + one sort, no key-group² candidate explosion. The
    // oracle brute-forces the asof semantics with a correlated subquery.
    // asof_o_totalprice carries parquet values verbatim (no arithmetic),
    // so raw doubles compare exactly.
    QueryCase("q_join_asof",
      (s, dir) => {
        val o = t(s, dir, "orders")
        graft.ops.AsOfJoin.asofJoin(
          o.select("o_orderkey", "o_custkey", "o_orderdate"),
          o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
          keys = Seq("o_custkey"),
          leftTime = "o_orderdate", rightTime = "o_orderdate",
          valueCols = Seq("o_totalprice"), tieBreak = "o_orderkey",
          strict = true)
      },
      Some("""SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
        |  (SELECT p.o_totalprice FROM orders p
        |   WHERE p.o_custkey = o.o_custkey AND p.o_orderdate < o.o_orderdate
        |   ORDER BY p.o_orderdate DESC, p.o_orderkey DESC LIMIT 1)
        |    AS asof_o_totalprice
        |FROM orders o""".stripMargin)),

    // Point-in-interval (range) join: bucketized time turns the theta
    // join Spark would nested-loop into an equi join on the bucket key
    // (ops/RangeJoin). Intervals = 2-hour windows opened by every 199th
    // event; half-open [start, end).
    QueryCase("q_join_range",
      (s, dir) => {
        val events = t(s, dir, "events")
        val iv = events.filter(col("event_id") % 199 === 0)
          .select(col("event_id").as("interval_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
        graft.ops.RangeJoin.intervalJoin(
            events.select("event_id", "ts"), "ts",
            iv, "start_ts", "end_ts", bucketSec = 3600L)
          .select("interval_id", "event_id")
      },
      Some("""WITH iv AS (SELECT event_id AS interval_id, ts AS start_ts,
        |       ts + INTERVAL 2 HOUR AS end_ts
        |     FROM events WHERE event_id % 199 = 0)
        |SELECT iv.interval_id, e.event_id
        |FROM events e JOIN iv
        |  ON e.ts >= iv.start_ts AND e.ts < iv.end_ts""".stripMargin)),

    // Heavy-tailed interval set through the TIERED bucketized range join
    // (ops/RangeJoin.intervalJoinTiered): 2-hour session windows (fine
    // tier, 1-hour buckets) + 3-day campaign windows (coarse tier, 1-day
    // buckets) — a single fine-bucket join would pay span/bucket ≈ 72
    // exploded rows per tail interval.
    QueryCase("q_join_range_tiered",
      (s, dir) => {
        val events = t(s, dir, "events")
        val iv = events.filter(col("event_id") % 199 === 0)
          .select(col("event_id").as("interval_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
          .unionByName(events.filter(col("event_id") % 1009 === 0)
            .select(col("event_id").as("interval_id"),
              col("ts").as("start_ts"),
              (col("ts") + expr("INTERVAL 3 DAYS")).as("end_ts")))
        graft.ops.RangeJoin.intervalJoinTiered(
            events.select("event_id", "ts"), "ts",
            iv, "start_ts", "end_ts",
            bucketSec = 3600L, longBucketSec = 86400L)
          .select("interval_id", "event_id")
      },
      Some("""WITH iv AS (
        |  SELECT event_id AS interval_id, ts AS start_ts,
        |         ts + INTERVAL 2 HOUR AS end_ts
        |  FROM events WHERE event_id % 199 = 0
        |  UNION ALL
        |  SELECT event_id, ts, ts + INTERVAL 3 DAY
        |  FROM events WHERE event_id % 1009 = 0)
        |SELECT iv.interval_id, e.event_id
        |FROM events e JOIN iv
        |  ON e.ts >= iv.start_ts AND e.ts < iv.end_ts""".stripMargin)),

    // BUCKETED co-located join (ops/Bucketing): both sides land as
    // bucketed+sorted parquet tables on the join key, so the join plans
    // with NO Exchange on either side — the pay-the-shuffle-once-at-
    // write-time layout a 100 TB warehouse runs on (BucketingSpec locks
    // the no-Exchange plan; this query hash-checks the co-located
    // plan's RESULTS against a plain DuckDB join). The one-time table
    // write happens on first run per JVM; bench min-of-retries measures
    // the steady-state co-located read.
    QueryCase("q_join_bucketed",
      (s, dir) => {
        // Tag = the full sanitized dir path, not a 32-bit hash: the
        // per-JVM bucketed-table cache key must uniquely identify the
        // source data (two sf dirs colliding on hashCode would silently
        // serve the first dir's buckets for the second).
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val bd = graft.ops.Bucketing.ensure(s, s"g_bdocs_$tag", "doc_id", 8)(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"))
        val be = graft.ops.Bucketing.ensure(s, s"g_bembs_$tag", "vec_id", 8)(
          t(s, dir, "embeddings").select(col("vec_id"), col("label"),
            size(col("embedding")).cast("long").as("dim")))
        bd.join(be, bd("doc_id") === be("vec_id"))
          .groupBy("source", "label")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("dim")).as("sum_dim"))
      },
      Some("""SELECT d.source, e.label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(e.embedding)) AS BIGINT) AS sum_dim
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY 1, 2""".stripMargin))
  )
}
