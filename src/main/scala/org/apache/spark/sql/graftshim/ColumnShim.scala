package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 moved `Column` to a ColumnNode representation
  * and made the Expression⇄Column adapters `private[sql]`
  * (`classic.ExpressionUtils`); a custom `Expression` that wants to ride
  * a DataFrame plan WITHOUT a per-session FunctionRegistry round-trip
  * needs this one-hop shim in the sql namespace — the same pattern every
  * Spark-native extension library uses. Kept to exactly these two
  * forwarders; everything else in graft sticks to public API. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
