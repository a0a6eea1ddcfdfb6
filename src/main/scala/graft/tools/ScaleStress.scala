package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Profiling, Resample, Sampling, Shuffling}

/** Corpus-growth stress for the ordering/diagnostic operator family:
  * replicate the sf0.1 tables 1×/2×/4×/8× (documents with perturbed ids —
  * per-source row counts grow; events with offset user ids — the KEY
  * population grows, spans stay constant, which is how an event log
  * actually scales) and report warm min-of-3 wall-clock per operator.
  *
  * Honest sinks: `count()` lets Catalyst PRUNE unused projections — a
  * window or census rank that nothing consumes is never computed (the
  * round-6 q_ntile 0.14 s mirage). Every measurement here forces the
  * operator's real output column through an aggregate.
  *
  * Usage: runMain graft.tools.ScaleStress [sfDir] [factors]
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factors = (if (args.length > 1) args(1) else "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String, reps: Int = 3)(body: => Long): Unit = {
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      spark.catalog.clearCache()
      graft.ops.Caches.releaseAll()
      val best = samples.map(_._1).min
      println(f"[stress] $label%-28s min=$best%6.2f s rows=${samples.head._2}")
    }

    factors.foreach { k =>
      // materialize the scaled tables to parquet so every op pays a real
      // multi-split scan, not an in-memory union
      val docs0 = Tables(spark, sfDir, "documents")
      val docs = (0 until k).map(i => docs0
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text",
            when(lit(i) === 0, col("text"))
              .otherwise(concat(col("text"), lit(s" stressvariant$i")))))
        .reduce(_ unionByName _)
      val ev0 = Tables(spark, sfDir, "events")
      val ev = (0 until k).map(i => ev0
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      val dDir = java.nio.file.Files
        .createTempDirectory(s"stress_docs_$k").toString
      val eDir = java.nio.file.Files
        .createTempDirectory(s"stress_ev_$k").toString
      docs.repartition(32).write.mode("overwrite").parquet(dDir)
      ev.repartition(32).write.mode("overwrite").parquet(eDir)
      val d = spark.read.parquet(dDir)
      val e = spark.read.parquet(eDir)
      println(s"[stress] ===== factor ${k}x: docs=${d.count()} events=${e.count()} =====")

      timed(s"interleaveBySource ${k}x") {
        Shuffling.interleaveBySource(d.select("doc_id", "source"),
            "doc_id", "source", seed = "st", partitions = 32)
          .agg(sum(col("pos"))).head(); d.count()
      }
      timed(s"capPerGroup ${k}x") {
        Sampling.capPerGroup(d.select("doc_id", "source"),
          "doc_id", "source", cap = 1000).count()
      }
      timed(s"groupBalance ${k}x") {
        Profiling.groupBalance(d, "source")
          .agg(sum(col("gini"))).head(); d.count()
      }
      timed(s"robustOutliers ${k}x") {
        Profiling.robustOutliers(d, "n_chars", k = 2).count()
      }
      timed(s"keyHeat ${k}x") {
        Profiling.keyHeat(d, "lang", topK = 10, hotFactor = 2).count()
      }
      timed(s"joinCardinality ${k}x") {
        Profiling.joinCardinality(e, e, "user_id", "user_id").head()
        e.sparkSession.emptyDataFrame.count() + 1
      }
      timed(s"resample_ffill ${k}x") {
        Resample.dailyForwardFill(e, "user_id", "ts", "value")
          .agg(sum(col("filled").cast("double"))).head(); e.count()
      }
      // Span dedup under the ADVERSARIAL regime: every replica is a full
      // near-dup of its original, so at k× every span is repeated in k
      // docs — matched positions are the WHOLE corpus (coverage's join +
      // explode run at maximum pressure, k× corpus × k spans of census
      // growth). Linear-in-matched wall-clock here is the claim.
      timed(s"spanCensus ${k}x") {
        graft.ext.Spans.spanCensus(d, "text", "doc_id", 8)
          .agg(sum(col("n_occ"))).head(); d.count()
      }
      timed(s"spanCoverage ${k}x") {
        graft.ext.Spans.coverage(d, "text", "doc_id", 8)
          .agg(sum(col("covered_tokens"))).head(); d.count()
      }
      // Bucketed vs shuffled equi join at k×: same join, same data — the
      // only difference is whether the shuffle was paid at write time.
      val stats = d.groupBy("doc_id").agg(sum(col("n_chars")).as("sc"))
      val bd = graft.ops.Bucketing.ensure(spark, s"stress_bd_$k",
        "doc_id", 32)(d.select("doc_id", "source", "n_chars"))
      val bs = graft.ops.Bucketing.ensure(spark, s"stress_bs_$k",
        "doc_id", 32)(stats)
      timed(s"shuffledJoin ${k}x") {
        d.select("doc_id", "source", "n_chars").join(stats, Seq("doc_id"))
          .agg(sum(col("sc"))).head(); d.count()
      }
      timed(s"bucketedJoin ${k}x") {
        bd.join(bs, Seq("doc_id"))
          .agg(sum(col("sc"))).head(); bd.count()
      }
    }
    spark.stop()
  }
}
