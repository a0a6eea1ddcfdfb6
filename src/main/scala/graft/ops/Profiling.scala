package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max — the
  * data-quality monitoring pass a pipeline runs on every new snapshot
  * (null-rate spikes and cardinality collapses are how upstream breakage
  * shows up before any model metric moves).
  *
  * ONE aggregation pass computes every column's stats side by side
  * (Spark evaluates the aggregate list in a single scan; distinct counts
  * add one expand), then the wide row melts to long format
  * (column, metric rows) — cheap: the melt runs on a 1-row frame.
  * Exact `count_distinct` is the fixture/oracle configuration; at 100 TB
  * swap `approxDistinct = true` for the HLL sketch (±2%, no expand).
  * min/max surface as strings so one schema covers every column type. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    // names are spliced into selectExpr below — refuse anything that
    // could parse as more than an identifier
    require(cols.nonEmpty && cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profile needs plain identifier column names, got: ${cols.mkString(", ")}")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __n_$c, __nn_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) AS " +
      "(column, n_rows, n_nonnull, n_distinct, min_value, max_value)")
  }

  /** Source-mix balance diagnostics: per-group count, share, Lorenz
    * cumulative count, and the Gini coefficient of the group-size
    * distribution (0 = perfectly even mix, →1 = one group dominates).
    * A training-data mix drifting toward gini≈1 means one crawl/source
    * is swamping the corpus — this is the dashboard number that catches
    * it. Formula (groups sorted ascending by size, i = 1-based rank,
    * k = #groups, t = total rows): G = 2·Σ(i·nᵢ)/(k·t) − (k+1)/k.
    * All sums are exact longs; the three double ops at the end
    * (multiply, divide, subtract) are IEEE-exact-rounded, so the value
    * is deterministic cross-engine.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus to
    * a #groups-row frame; the partition-less windows below run on THAT
    * frame only — bounded by the dimension cardinality, never the data
    * (same justification as the census frame in [[Census]]). */
  def groupBalance(df: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n"), col(groupCol))
    val wAll = Window.orderBy(col("n"), col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("__i", row_number().over(w))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("n")).over(wAll))
      .withColumn("share", col("n").cast("double") / col("__t"))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("gini",
        lit(2.0) * sum(col("__i") * col("n")).over(wAll)
          / (col("__k") * col("__t"))
          - (col("__k") + lit(1.0)) / col("__k"))
      .drop("__i", "__k", "__t")
  }

  /** Equi-width histogram of an integer-valued column: `bins` buckets of
    * width ceil((max−min+1)/bins), all edges integer so the binning is
    * exact cross-engine. Scale shape: the min/max pass reduces to ONE
    * broadcast row, then one map-side-combined groupBy — no sort, no
    * window, two corpus scans (Spark cannot fuse a global extent into
    * the same pass that consumes it). */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val bounds = df.agg(
      min(col(valueCol)).cast("long").as("__lo"),
      max(col(valueCol)).cast("long").as("__hi"))
    df.select(col(valueCol).cast("long").as("__v"))
      .crossJoin(broadcast(bounds))
      .withColumn("__w", expr(s"(__hi - __lo + $bins) DIV $bins"))
      .withColumn("bin", expr("(__v - __lo) DIV __w"))
      .withColumn("lo_edge", col("__lo") + col("bin") * col("__w"))
      .withColumn("hi_edge", col("__lo") + (col("bin") + 1) * col("__w") - 1)
      .groupBy("bin", "lo_edge", "hi_edge")
      .agg(count(lit(1)).as("n"))
  }

  /** Lower median from a pre-aggregated (value, count) frame: the
    * smallest value whose cumulative count reaches ceil(n/2). Rank-based
    * (never averages the two middle values), so the result stays in the
    * value domain and integer-exact. The partition-less window runs on
    * the counts frame — bounded by the value DOMAIN's cardinality
    * (e.g. distinct document lengths), not the corpus. */
  private def lowerMedianOfCounts(counts: DataFrame, v: String, c: String,
      outName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(v))
    val tot = counts.agg(sum(col(c)).as("__n"))
    counts.withColumn("__cum", sum(col(c)).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("__cum") >= expr("(__n + 1) DIV 2"))
      .agg(min(col(v)).as(outName))
  }

  /** [[lowerMedianOfCounts]]' scale twin for value domains too big for
    * a partition-less window: the identical lower median read off
    * [[Census.prefix]]'s range-partitioned running sum — one range
    * shuffle of the counts frame, per-range windows only. */
  private def lowerMedianViaPrefix(counts: DataFrame, v: String, c: String,
      outName: String): DataFrame = {
    val parts = counts.sparkSession.sessionState.conf.numShufflePartitions
    // rename away from prefix's own working columns (__v/__pid/…)
    val in = counts.select(col(v).as("__mval"), col(c).as("__mcnt"))
    Census.prefix(in, Seq(col("__mval").asc), col("__mcnt"), parts)
      .filter(col("__off") + col("__run") >= expr("(__n + 1) DIV 2"))
      .agg(min(col("__mval")).as(outName))
  }

  /** Robust outlier detection by median/MAD: flags rows where
    * |x − median| > k·MAD (MAD = median of |x − median|). Unlike
    * mean/stddev z-scores, both statistics are rank-based and immune to
    * the outliers they hunt; with integer input EVERYTHING here is
    * integer arithmetic — no float tolerance needed in the oracle.
    *
    * Scale shape: ONE corpus aggregation (groupBy value) collapses to a
    * value-domain-bounded counts frame; median AND MAD both derive from
    * that same small frame (the |x−med| recount is a re-aggregation of
    * counts, not a second corpus scan). The final filter joins two
    * broadcast 1-row thresholds against the corpus — embarrassingly
    * parallel.
    *
    * Cardinality guard (VERDICT r18 #6): "value-domain-bounded" is a
    * DATA-dependent claim — doc-length-like columns have small domains,
    * but ids/offsets degrade the partition-less median window to a
    * single task over millions of rows. The domain is therefore counted
    * first (one job on the counts frame); past `domainCap` both medians
    * switch to [[Census.prefix]]'s range-partitioned rank — identical
    * values, no single-partition window anywhere in the plan
    * (ProfilingSpec's plan arm). */
  def robustOutliers(df: DataFrame, valueCol: String, k: Int = 3,
      domainCap: Long = 1L << 20): DataFrame = {
    val counts = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val median: (DataFrame, String, String, String) => DataFrame =
      if (counts.count() <= domainCap) lowerMedianOfCounts
      else lowerMedianViaPrefix
    val med = median(counts, "__v", "__c", "med")
    val devCounts = counts.crossJoin(broadcast(med))
      .groupBy(abs(col("__v") - col("med")).as("__d"))
      .agg(sum(col("__c")).as("__c"))
    val mad = median(devCounts, "__d", "__c", "mad")
    df.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .filter(abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Key-heat report: the `topK` hottest values of a prospective
    * grouping/join key, each with its count, corpus share, and a `hot`
    * flag (count > `hotFactor`× the mean per-key count — evaluated by
    * integer cross-multiplication `cnt·k > hotFactor·n`, so the flag is
    * exact). This is the pre-flight check before keying a shuffle at
    * 100 TB: a key that holds 10% of the corpus makes [[Skew]] salting
    * or AQE skew handling mandatory, and you want to know BEFORE the
    * stage runs, from a cheap aggregate, not from a straggling task.
    *
    * Plan: map-side-combined groupBy → top-k heap
    * (TakeOrderedAndProject) — never a global sort. */
  def keyHeat(df: DataFrame, keyCol: String, topK: Int,
      hotFactor: Int = 4): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share", col("cnt").cast("double") / col("__n"))
      .withColumn("hot",
        col("cnt") * col("__k") > lit(hotFactor) * col("__n"))
      .drop("__n", "__k")
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }

  /** Exact join-output cardinality WITHOUT running the join:
    * Σ over matching keys of n_left(key)·n_right(key), plus the single
    * worst key's contribution and (deterministically, smallest such key)
    * its identity. The pre-flight guard for join explosion — a
    * many-to-many key that multiplies two row sets detonates at the
    * SHUFFLE, after the cluster is already committed; this computes the
    * same number from the two per-key count frames, which are bounded by
    * key cardinality, not corpus size.
    *
    * Returns one row: est_rows, max_key_rows, hot_key, n_keys. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val l = left.groupBy(col(leftKey).as("__key"))
      .agg(count(lit(1)).as("__cl"))
    val r = right.groupBy(col(rightKey).as("__key"))
      .agg(count(lit(1)).as("__cr"))
    val prod = l.join(r, "__key")
      .select(col("__key"), (col("__cl") * col("__cr")).as("__p"))
    val stats = prod.agg(sum(col("__p")).as("est_rows"),
      max(col("__p")).as("max_key_rows"),
      count(lit(1)).as("n_keys"))
    val hot = prod
      .crossJoin(broadcast(prod.agg(max(col("__p")).as("__mx"))))
      .filter(col("__p") === col("__mx"))
      .agg(min(col("__key")).as("hot_key"))
    stats.crossJoin(broadcast(hot)).select("est_rows", "max_key_rows",
      "hot_key", "n_keys")
  }
}
