package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state.
  *
  * Joining two live streams requires both sides to buffer rows until the
  * other side can no longer produce a match; without time bounds that
  * buffer is unbounded. [[intervalJoin]] encodes the standard recipe:
  * watermark BOTH sides, then join on key equality AND an event-time
  * interval — Spark derives the state retention from the watermark + the
  * interval, so each side's buffer holds only the join window. This is
  * the enrichment pattern (clicks ⋈ impressions, review ⋈ app-event)
  * at 100 TB/day: state is O(rate × window), not O(stream).
  */
object StreamJoin {

  /** Inner interval join: rows match when keys are equal and the right
    * event time lies in [leftTime − `before`, leftTime + `after`].
    * Both inputs must carry their event-time column; watermarks are
    * applied here with `delay` lateness. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      before: String, after: String, delay: String): DataFrame = {
    val l = left.withWatermark(leftTime, delay).alias("l")
    val r = right.withWatermark(rightTime, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime") + expr(s"INTERVAL $after"))
  }
}
