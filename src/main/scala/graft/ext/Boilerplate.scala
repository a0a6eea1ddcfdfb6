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
  * fully inside whole-stage codegen except the two aggregations. At
  * corpus scale the (group, line) frequency table is tiny relative to
  * the corpus (boilerplate is by definition repetitive), so the
  * anti-join side broadcasts; the only corpus-sized shuffle is the
  * per-document rebuild, keyed by doc — the minimal shape for a
  * line-level global filter.
  */
object Boilerplate {

  /** Strip lines repeated across ≥ `minDocs` docs per group. Output:
    * (doc_id, group, text, n_lines_kept, n_lines_dropped) with each
    * document's surviving lines rejoined in original order. */
  def stripRepeatedLines(spark: SparkSession, docs: DataFrame,
      minDocs: Int): DataFrame = {
    val lines = docs
      .select(col("doc_id"), col("group"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .filter(trim(col("line")) =!= "")
      .groupBy("group", "line")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("group", "line")
    val kept = lines.join(broadcast(boiler), Seq("group", "line"),
      "left_anti")
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
