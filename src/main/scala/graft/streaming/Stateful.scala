package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `KeyValueGroupedDataset` — the tier
  * below the built-in windowed aggregates: arbitrary per-key state
  * machines that `groupBy().agg()` can't express.
  *
  * Two operators over the reference's review stream domain:
  *
  *   - [[runningAppStats]] (`mapGroupsWithState`): per-app lifetime
  *     running stats (count / mean sentiment), one updated row per key
  *     per trigger — the streaming dual of a grand aggregate, with
  *     explicit state the caller can bound via `idleTimeout`.
  *   - [[sentimentAlerts]] (`flatMapGroupsWithState`): edge-triggered
  *     alerts — emits ONLY when a key's running mean crosses the
  *     threshold (0..1 rows per key per trigger), the pattern for
  *     monitors/notifications where update-mode re-emission would spam.
  *
  * State size is O(live keys) × a few scalars; with the RocksDB provider
  * ([[graft.GraftSession]]) that holds at 100 TB key cardinalities, and
  * `idleTimeout` (processing-time) evicts abandoned keys — the knob the
  * watermark-free reference semantics lack.
  */
object Stateful {

  /** One review event on the stream (subset of the reference schema). */
  final case class ReviewEvent(app_id: Long, sentiment: Double)

  /** Persistent per-app state. */
  final case class AppState(n: Long, sum: Double, wasAboveThreshold: Boolean)

  /** Emitted running stats row. */
  final case class AppStats(app_id: Long, n_reviews: Long, mean_sentiment: Double)

  /** Emitted alert: the running mean crossed `threshold` (direction ±1). */
  final case class SentimentAlert(app_id: Long, direction: Int,
      mean_sentiment: Double, n_reviews: Long)

  private def fold(old: Option[AppState], events: Iterator[ReviewEvent],
      wasAbove: Boolean): AppState = {
    var n = old.map(_.n).getOrElse(0L)
    var sum = old.map(_.sum).getOrElse(0.0)
    events.foreach { e => n += 1; sum += e.sentiment }
    AppState(n, sum, wasAbove)
  }

  /** Per-app running (count, mean sentiment); one row per touched key per
    * trigger. `idleTimeout` (e.g. "30 minutes") evicts state for keys
    * with no traffic — pass None for reference-faithful unbounded state. */
  def runningAppStats(reviews: Dataset[ReviewEvent],
      idleTimeout: Option[String] = None): Dataset[AppStats] = {
    implicit val stateEnc = Encoders.product[AppState]
    implicit val outEnc = Encoders.product[AppStats]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    reviews.groupByKey(_.app_id)
      .mapGroupsWithState[AppState, AppStats](timeoutConf) {
        (appId: Long, events: Iterator[ReviewEvent], state: GroupState[AppState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            AppStats(appId, s.n, if (s.n > 0) s.sum / s.n else 0.0)
          } else {
            val s = fold(state.getOption, events,
              state.getOption.exists(_.wasAboveThreshold))
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            AppStats(appId, s.n, if (s.n > 0) s.sum / s.n else 0.0)
          }
      }
  }

  /** Edge-triggered sentiment alerts: a row ONLY when a key's running
    * mean crosses `threshold` (direction +1 = recovered above,
    * −1 = dropped below). Keys that merely stay on one side emit
    * nothing — flatMap's 0..n contract, inexpressible with agg(). */
  def sentimentAlerts(reviews: Dataset[ReviewEvent],
      threshold: Double): Dataset[SentimentAlert] = {
    implicit val stateEnc = Encoders.product[AppState]
    implicit val outEnc = Encoders.product[SentimentAlert]
    implicit val keyEnc = Encoders.scalaLong
    reviews.groupByKey(_.app_id)
      .flatMapGroupsWithState[AppState, SentimentAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (appId: Long, events: Iterator[ReviewEvent], state: GroupState[AppState]) =>
          val old = state.getOption
          val wasAbove = old.map(_.wasAboveThreshold).getOrElse(true)
          val folded = fold(old, events, wasAbove)
          val mean = if (folded.n > 0) folded.sum / folded.n else 0.0
          val isAbove = mean >= threshold
          state.update(folded.copy(wasAboveThreshold = isAbove))
          if (old.nonEmpty && isAbove != wasAbove)
            Iterator.single(SentimentAlert(appId,
              if (isAbove) 1 else -1, mean, folded.n))
          else Iterator.empty
      }
  }
}
