package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Timestamp-kind tolerance for event-time ops.
  *
  * Spark 4 surfaces parquet TIMESTAMP(isAdjustedToUTC=false) as
  * TIMESTAMP_NTZ, and `unix_micros` / numeric casts reject NTZ with
  * DATATYPE_MISMATCH (the round-6 bench regression on the regenerated
  * `events` fixture). Every op that needs epoch arithmetic goes through
  * these helpers: an up-front cast to TimestampType is a no-op for
  * TIMESTAMP input and interprets NTZ's naive datetime in the session
  * timezone (engine-wide UTC — GraftSession/Verify/Bench all pin it), so
  * both kinds map to the same instant the DuckDB oracle reads. The cast
  * folds into the surrounding projection; no extra plan node. */
object Times {

  /** Exact epoch MICROSECONDS from TIMESTAMP or TIMESTAMP_NTZ input. */
  def micros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Epoch seconds (long, floored) from TIMESTAMP, TIMESTAMP_NTZ, or an
    * already-numeric epoch column (long→timestamp→long round-trips). */
  def seconds(c: Column): Column = c.cast(TimestampType).cast("long")
}
