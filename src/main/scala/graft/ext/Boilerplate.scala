package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inter-document repeated-line removal — the boilerplate filter web
  * corpora run after HTML extraction (C4's "dedupe repeated lines"
  * rule): a line that appears in ≥ `minDocs` DISTINCT documents of the
  * same group (domain) is navigation/footer furniture, not content,
  * and is stripped from every document in that group while the same
  * words in a lone document elsewhere survive.
  *
  * Pure built-in-function plan (posexplode → groupBy → left_anti →
  * order-preserving rebuild via `array_sort(collect_list(struct))`),
  * fully inside whole-stage codegen except the aggregations.
  *
  * == Anti-join strategy at scale ==
  * The (group, line) frequency table is small relative to the corpus
  * (boilerplate repeats by definition) but NOT absolutely small: it
  * grows with the number of groups (≈ domains × boilerplate lines per
  * domain — billions of rows on a full web crawl), so an unconditional
  * broadcast is a driver/executor-memory scale-killer. The join is
  * therefore size-gated via `broadcastBoiler`:
  *
  *  - `None` (default): no hint — Catalyst picks by its size estimate
  *    and AQE re-plans at runtime from the TRUE post-aggregation size,
  *    broadcasting only under `spark.sql.autoBroadcastJoinThreshold`.
  *    This is the production setting.
  *  - `Some(true)`: force broadcast — the right plan when the group
  *    count is known-bounded (a per-site or per-tenant run).
  *  - `Some(false)`: force the shuffle anti-join — the at-scale path.
  *    The exploded corpus is pre-partitioned ONCE on (group, line) and
  *    BOTH consumers (the frequency aggregation and the anti-join's
  *    probe side) read that same exchange (ReusedExchange), so forcing
  *    the shuffle strategy adds no extra corpus-side shuffle over the
  *    broadcast plan — it trades the broadcast build for partition-
  *    local hash lookups. (HashPartitioning(group, line) satisfies the
  *    distinct-aggregate's ClusteredDistribution(group, line, doc_id),
  *    so the countDistinct runs exchange-free on top of it too.)
  *
  * Either way the only other corpus-sized shuffle is the per-document
  * rebuild, keyed by doc — the minimal shape for a line-level global
  * filter. PlanShapeSpec locks exactly this invariant (bounded
  * corpus-side exchange count, exchange reuse on the forced-shuffle
  * path) rather than mandating a join strategy.
  */
object Boilerplate {

  /** Strip lines repeated across ≥ `minDocs` docs per group. Output:
    * (doc_id, group, text, n_lines_kept, n_lines_dropped) with each
    * document's surviving lines rejoined in original order.
    *
    * `broadcastBoiler`: Some(true) = force broadcast anti-join,
    * Some(false) = force shuffle anti-join (shared single exchange),
    * None = let Catalyst/AQE size-gate (default; production). */
  def stripRepeatedLines(spark: SparkSession, docs: DataFrame,
      minDocs: Int, broadcastBoiler: Option[Boolean] = None): DataFrame = {
    val rawLines = docs
      .select(col("doc_id"), col("group"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    def boilerFrom(lines: DataFrame): DataFrame = lines
      .filter(trim(col("line")) =!= "")
      .groupBy("group", "line")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("group", "line")
    val keys = Seq("group", "line")
    val kept = broadcastBoiler match {
      case Some(true) =>
        rawLines.join(broadcast(boilerFrom(rawLines)), keys, "left_anti")
      case Some(false) =>
        // One shared exchange: partition the exploded corpus on the
        // join key, derive the frequency table FROM the partitioned
        // frame, and hint the hash join — EnsureRequirements finds both
        // join children already distributed on (group, line) and
        // ReuseExchange collapses the two reads of the repartition.
        val linesP = rawLines.repartition(col("group"), col("line"))
        linesP.join(boilerFrom(linesP).hint("shuffle_hash"), keys,
          "left_anti")
      case None =>
        rawLines.join(boilerFrom(rawLines), keys, "left_anti")
    }
    val rebuilt = kept.groupBy("doc_id", "group")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"),
            col("line")))), x => x.getField("line")),
          "\n").as("text"),
        count(lit(1)).as("n_lines_kept"))
    // docs that lost every line still get a row (empty text)
    docs.select(col("doc_id"), col("group"),
        (size(split(col("text"), "\n"))).cast("long").as("n_lines_in"))
      .join(rebuilt.drop("group"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("group"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("n_lines_in") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"))
  }
}
