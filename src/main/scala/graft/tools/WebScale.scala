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
    val rep = if (args.length > 2) args(2).toInt else 1
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
    // optional bulk point: the 10× docs replicated `rep`× more
    // (vowel-translated + id-offset, the ScaleUp de-correlation), so
    // MB/s is measured where the kernels dominate job overhead
    if (sf10 != "-" && rep > 1) run(spark, sf10, s"10x_$rep", rep)
    spark.stop()
  }

  private val vowelMaps = Seq("aeiou", "eioua", "iouae", "ouaei",
    "uaeio", "aeiuo", "eioau", "oiaue", "uoiea", "euoia", "ioeua",
    "oueai")

  private def run(spark: SparkSession, dir: String, label: String,
      rep: Int = 1): Unit = {
    // Synthetic crawl wrap: 20% of docs share their URL path with a
    // neighbor (doc_id%5==0 → the 4-neighbor's path) and each id picks
    // one of four spellings of that path — all four canonicalize
    // identically, so URL dedup has real work at a known rate. The
    // HTML shell gives extraction a script to drop and entities +
    // mojibake for repair/NFC.
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val docs =
      if (rep <= 1) base
      else (0 until rep).map { i =>
        if (i == 0) base
        else base.select(
          // offset far above ScaleUp's replica range (i·10⁷) so bulk
          // replica ids never collide with the 10× fixture's
          (col("doc_id") + lit(1000000000000L * i)).as("doc_id"),
          translate(col("text"), "aeiou",
            vowelMaps(i % vowelMaps.size)).as("text"))
      }.reduce(_ unionByName _)
    val pathKey = when(col("doc_id") % 5 === 0, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val url = {
      // host derives from pathKey too, so the %5 neighbors really do
      // share a canonical URL; the four spellings stay inside the
      // documented canonicalization set (scheme/host case, default
      // port, fragment, tracking params — path case is PRESERVED by
      // design, so variants never touch it)
      val host = concat(lit("site"), pmod(pathKey, lit(997)),
        lit(".com"))
      val path = concat(lit("/p/"), pathKey)
      when(col("doc_id") % 4 === 0,
          concat(lit("http://"), host, path))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTP://"), upper(host), path))
        .when(col("doc_id") % 4 === 2,
          concat(lit("http://"), host, path, lit("?utm_source=x")))
        .otherwise(
          concat(lit("http://"), host, lit(":80"), path, lit("#frag")))
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

    def chain(): org.apache.spark.sql.DataFrame = {
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
      nfc.groupBy("text_nfc").agg(min("doc_id").as("doc_id"))
        .join(canon.select(col("url_id").as("doc_id"), col("canonical")),
          "doc_id")
        .select(col("doc_id"), col("canonical"),
          col("text_nfc").as("text"))
    }
    // min of 2 runs: the first pays codegen/JIT warmup, which at
    // fixture scale can exceed the chain itself
    val secs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      chain().write.mode("overwrite").parquet(s"/tmp/webscale_out_$label")
      (System.nanoTime() - t0) / 1e9
    }.min

    val survivors = spark.read
      .parquet(s"/tmp/webscale_out_$label").count()
    val nIn = src.count()
    val out = chain()
    out.collect() // drive AQE to the final plan before counting
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // Count shuffle-exchange NODES from the final-plan tree section:
    // " Exchange (" matches the bare shuffle node (BroadcastExchange /
    // ReusedExchange spell it inside a longer word), and slicing at
    // "== Initial Plan ==" keeps the executed tree only — the initial
    // tree would double-count every shuffle. (The r10 counter matched
    // the SIMPLE-mode spelling "Exchange hashpartitioning", which never
    // occurs in formatted output — the bound was vacuous.)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val nEx = " Exchange \\(".r.findAllIn(finalPlan).length
    println(f"[webscale] $label%6s docs=$nIn survivors=$survivors " +
      f"mb=${inBytes / 1e6}%.1f wall=$secs%.2f s " +
      f"mbps=${inBytes / 1e6 / secs}%.1f exchanges=$nEx")
    // ≤ 6: the two dedup shuffles + the two doc_id re-attach joins
    // (each side shuffles once the build side outgrows broadcast —
    // at fixture scale those joins broadcast and the count is 4).
    // The extraction/repair/NFC stages must add none at ANY scale.
    require(nEx >= 1 && nEx <= 6,
      s"web chain exchange bound broken at $label: $nEx\n" + plan.take(3000))
  }
}
