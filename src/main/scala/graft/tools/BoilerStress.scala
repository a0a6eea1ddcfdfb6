package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Boilerplate

/** Anti-join strategy regime measurement for
  * [[graft.ext.Boilerplate.stripRepeatedLines]] (VERDICT r10 #1): the
  * (group, line) frequency table scales with the NUMBER OF GROUPS, not
  * the corpus/repetition ratio, so "boilerplate is small relative to
  * the corpus" does NOT make it broadcastable — at web scale
  * (~10⁸ domains × a handful of furniture lines each) the broadcast
  * build must materialize billions of rows on the driver and every
  * executor. This harness sweeps the group count with everything else
  * held fixed and, per point, runs the forced-broadcast and
  * forced-shuffle paths over the SAME generated corpus:
  *
  *   - exactness is REQUIRED: the two strategies must agree on an
  *     order-independent XOR-fold checksum + row count (a mismatch
  *     fails the run) — strategy is a physical choice, never semantics;
  *   - per point it prints boiler-table rows (the broadcast payload),
  *     wall seconds per strategy, and the ratio — the regime evidence
  *     that the size gate in `broadcastBoiler = None` is pointed the
  *     right way (broadcast wins while the table is genuinely small,
  *     stops being the obvious winner as groups grow, and is
  *     structurally unrunnable at the web-scale extrapolation).
  *
  * Usage: runMain graft.tools.BoilerStress [maxGroupsLog10]
  */
object BoilerStress {

  def main(args: Array[String]): Unit = {
    val maxLog = if (args.length > 0) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def xorSum(df: DataFrame): Long = {
      val h = xxhash64(df.columns.map(col): _*)
      val r = df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    // G groups × 4 docs each; every group contributes 3 boilerplate
    // lines (df=4 ≥ minDocs) + 3 unique body lines per doc. Boiler
    // table rows = 3·G — grows with G while the repetition RATIO and
    // per-doc shape stay fixed (the point under test).
    def corpus(groups: Long): DataFrame =
      spark.range(groups * 4).select(
        col("id").as("doc_id"),
        concat(lit("dom"), (col("id") % groups).cast("string"))
          .as("group"),
        concat_ws("\n",
          concat(lit("NAV|"), (col("id") % groups).cast("string")),
          concat(lit("body-a-"), col("id").cast("string")),
          concat(lit("PROMO banner "), (col("id") % groups).cast("string")),
          concat(lit("body-b-"), col("id").cast("string")),
          concat(lit("(c) site "), (col("id") % groups).cast("string")),
          concat(lit("body-c-"), col("id").cast("string"))).as("text"))

    println("[boilstress] groups boiler_rows bc_sec sh_sec sh/bc")
    (3 to maxLog).foreach { lg =>
      val g = math.pow(10, lg).toLong
      val docs = corpus(g)
      docs.write.mode("overwrite")
        .parquet(s"/tmp/boilstress_docs_$lg")
      val src = spark.read.parquet(s"/tmp/boilstress_docs_$lg")
      def run(mode: Option[Boolean]): (Double, (Long, Long)) = timed {
        val out = Boilerplate.stripRepeatedLines(spark, src, minDocs = 2,
          broadcastBoiler = mode)
        (xorSum(out.withColumn("text", xxhash64(col("text")))), out.count())
      }
      val (bcS, (bcSum, bcN)) = run(Some(true))
      val (shS, (shSum, shN)) = run(Some(false))
      require(bcSum == shSum && bcN == shN,
        s"strategy changed semantics at groups=$g")
      println(f"[boilstress] $g%8d ${3 * g}%11d $bcS%6.2f $shS%6.2f " +
        f"${shS / bcS}%5.2f  EXACT n=$bcN")
    }
    println("[boilstress] both strategies exact at every point; " +
      "broadcast payload rows grow 3·G — unbroadcastable at web-scale G")
    spark.stop()
  }
}
