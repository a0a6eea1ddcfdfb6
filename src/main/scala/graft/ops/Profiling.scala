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
}
