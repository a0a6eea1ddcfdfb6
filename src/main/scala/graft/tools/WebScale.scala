package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale point for the WEB-CURATION tier (VERDICT r10 next-round #4):
  * q_pipeline_web is oracle-green on a 5-document fixture, so this
  * harness runs the SAME composed chain — canonical-URL dedup →
  * HTML extraction → mojibake repair → NFC → content-level exact
  * dedup — over the real `documents` table at sf0.1 and at the 10×
  * ScaleUp replica, wrapping each document in a synthetic crawl row
  * (URL spelling variants at a controlled duplicate rate + an HTML
  * shell with script/entity/mojibake material for the cleanup stages
  * to actually chew on). Reported per scale point:
  *
  *   - input MB (sum of html lengths) and end-to-end MB/s through the
  *     whole chain (written to parquet, the realistic sink);
  *   - the EXCHANGE COUNT of the executed plan — the two-dedup bound
  *     PlanShapeSpec locks at fixture scale must hold unchanged at
  *     10×: scan-fused extraction/repair/NFC add no shuffle, so the
  *     chain's only corpus-sized exchanges remain the two dedups
  *     (checked here with the same ≤ 6 bound: each dedup is an
  *     Exchange pair around partial/final aggs plus join re-use);
  *   - the survivor count and per-stage drop (url-dup rate is
  *     constructed at 20%, so a wildly different yield flags a
  *     correctness problem before throughput is even read).
  *
  * Usage: runMain graft.tools.WebScale [sfDir] [sf10Dir]
  *   (run ScaleUp first to materialize sf10Dir; pass "-" to skip 10×)
  */
object WebScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf10 = if (args.length > 1) args(1) else "target/sf1equiv"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    run(spark, sfDir, "sf0.1")
    if (sf10 != "-") run(spark, sf10, "10x")
    spark.stop()
  }

  private def run(spark: SparkSession, dir: String, label: String): Unit = {
    // Synthetic crawl wrap: 20% of docs share their URL path with a
    // neighbor (doc_id%5==0 → the 4-neighbor's path) and each id picks
    // one of four spellings of that path — all four canonicalize
    // identically, so URL dedup has real work at a known rate. The
    // HTML shell gives extraction a script to drop and entities +
    // mojibake for repair/NFC.
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val pathKey = when(col("doc_id") % 5 === 0, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val url = {
      val base = concat(lit("site"), pmod(col("doc_id"), lit(997)),
        lit(".com/p/"), pathKey)
      when(col("doc_id") % 4 === 0, concat(lit("http://"), base))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTP://"), upper(base)))
        .when(col("doc_id") % 4 === 2,
          concat(lit("http://"), base, lit("?utm_source=x")))
        .otherwise(concat(lit("http://"), base, lit(":80/../p/"),
          pathKey, lit("#frag")))
    }
    val crawl = docs.select(col("doc_id"), url.as("url"),
      concat(lit("<html><head><title>t</title><script>var x=1;</script>" +
          "</head><body><div id=\"nav\">cafÃ© &amp; menu</div><p>"),
        col("text"),
        lit("</p><p>donâ€™t stop &lt;here&gt;</p></body></html>"))
        .as("html"))
    crawl.write.mode("overwrite").parquet(s"/tmp/webscale_$label")
    val src = spark.read.parquet(s"/tmp/webscale_$label")
    val inBytes = src.agg(sum(length(col("html")))).head().getLong(0)

    val t0 = System.nanoTime()
    val canon = graft.ext.Urls.canonicalized(spark,
      src.select(col("doc_id").as("url_id"), col("url"))).toDF()
    val urlKeep = canon.groupBy("canonical")
      .agg(min("url_id").as("doc_id"))
    val kept = src.join(urlKeep, "doc_id")
    val extracted = graft.ext.Html.extract(spark,
      kept.select(col("doc_id"), col("html"))).toDF()
    val repaired = graft.ext.Encoding.repair(spark,
      extracted.select(col("doc_id"), col("text"))).toDF()
    val nfc = graft.ext.Encoding.nfcNormalized(spark,
      repaired.select(col("doc_id"), col("text"))).toDF()
    val out = nfc.groupBy("text_nfc").agg(min("doc_id").as("doc_id"))
      .join(canon.select(col("url_id").as("doc_id"), col("canonical")),
        "doc_id")
      .select(col("doc_id"), col("canonical"),
        col("text_nfc").as("text"))
    out.write.mode("overwrite").parquet(s"/tmp/webscale_out_$label")
    val secs = (System.nanoTime() - t0) / 1e9

    val survivors = spark.read
      .parquet(s"/tmp/webscale_out_$label").count()
    val nIn = src.count()
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(f"[webscale] $label%5s docs=$nIn survivors=$survivors " +
      f"mb=${inBytes / 1e6}%.1f wall=$secs%.2f s " +
      f"mbps=${inBytes / 1e6 / secs}%.1f exchanges=$nEx")
    require(nEx <= 6,
      s"web chain exchange bound broken at $label: $nEx\n" + plan.take(3000))
  }
}
