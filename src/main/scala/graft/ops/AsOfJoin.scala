package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the LATEST right
  * row with the same key and `rightTime` ≤ (inclusive) or < (strict)
  * `leftTime` — the time-series primitive (event → latest dimension
  * version, trade → last quote) that plain equi-joins can't express.
  *
  * Spark has no asof operator; the naive encoding is a key-equality join
  * with a time-inequality filter — at corpus scale that materializes
  * |key group|² candidate rows per key BEFORE filtering. This
  * implementation is the UNION-WINDOW form instead: tag both inputs,
  * union them (schema-aligned, right payload nulled on left rows), and
  * run ONE window per key ordered by (time, side, tiebreak) taking the
  * running `last(payload, ignoreNulls)`. Cost = one hash Exchange on the
  * key + one sort — the same price as a single shuffle join, linear in
  * |left| + |right|, no candidate explosion, AQE-skew-splittable.
  *
  * Strictness is encoded purely in the sort: on equal times the right row
  * sorts BEFORE the left row for inclusive semantics (so the running
  * `last` sees it) and AFTER for strict. Ties among right rows at one
  * time resolve to the greatest `tieBreak` (deterministic output).
  */
object AsOfJoin {

  /** Left rows + `asof_<valueCol>` columns. `tieBreak` is a right-side
    * column ordering simultaneous right rows (e.g. a sequence id). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tieBreak: String, strict: Boolean = false): DataFrame = {
    val (lMark, rMark) = if (strict) (0, 1) else (1, 0)
    val rightSel = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(rMark).as("__mark"),
        col(tieBreak).cast("long").as("__tb")) ++
      valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val leftSel = left.select(
      left.columns.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(lMark).as("__mark"),
        lit(null).cast("long").as("__tb")): _*)
    val unioned = leftSel.unionByName(rightSel, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__mark").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__mark") === lMark)
      .drop("__t", "__mark", "__tb")
      .drop(valueCols.map(c => s"__v_$c"): _*)
  }
}
