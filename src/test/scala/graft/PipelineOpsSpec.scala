package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{Decontam, TextStats}
import graft.ops.{Packing, Sampling}

/** Training-pipeline hygiene operators: repetition metrics, PII scrub,
  * deterministic sampling, decontamination, sequence packing. */
class PipelineOpsSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionStats: duplicate lines and looping bigrams score high") {
    val d = docs(
      (1L, "spam line\nspam line\nspam line\nunique line"),
      (2L, "buy now buy now buy now"),
      (3L, "all lines here are different\nsecond line"))
    val got = TextStats.repetitionStats(d, "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("dup_line_frac"), r.getAs[Double]("top_bigram_frac"))))
      .toMap
    assert(math.abs(got(1L)._1 - 0.5) < 1e-12)       // 2 of 4 lines dup
    assert(got(2L)._2 > 0.5)                          // "buy now" loop
    assert(got(3L)._1 == 0.0 && got(3L)._2 <= 0.2)
  }

  test("piiScrub counts and redacts urls, emails, phones") {
    val d = docs(
      (1L, "mail me at a.user@example.com or see https://example.com/x?q=1 now"),
      (2L, "call +1 (415) 555-0199 today"),
      (3L, "nothing sensitive here"))
    val got = TextStats.piiScrub(d, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Int]("n_emails") == 1)
    assert(got(1L).getAs[Int]("n_urls") == 1)
    val red1 = got(1L).getAs[String]("redacted")
    assert(red1.contains("<EMAIL>") && red1.contains("<URL>"))
    assert(!red1.contains("example.com"))
    assert(got(2L).getAs[Int]("n_phones") == 1)
    assert(got(2L).getAs[String]("redacted").contains("<PHONE>"))
    assert(got(3L).getAs[String]("redacted") == "nothing sensitive here")
  }

  test("hashSample: deterministic, partition-independent, ≈rate") {
    val s = spark
    import s.implicits._
    val d = (0L until 2000L).toDF("id")
    val kept1 = Sampling.hashSample(d, "id", 0.3).collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.hashSample(d.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)                            // stable under repartition
    assert(math.abs(kept1.size / 2000.0 - 0.3) < 0.05)
    // nested property: a 0.1 sample is a subset of the 0.3 sample
    val kept01 = Sampling.hashSample(d, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(kept01.subsetOf(kept1))
  }

  test("stratifiedSample applies per-stratum rates") {
    val s = spark
    import s.implicits._
    val d = (0L until 1000L).map(i => (i, if (i % 2 == 0) "keep" else "drop"))
      .toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(d, "id", "stratum",
      Map("keep" -> 1.0, "drop" -> 0.0), defaultRate = 0.5)
      .collect().map(_.getLong(0))
    assert(kept.length == 500 && kept.forall(_ % 2 == 0))
  }

  test("sampling rate-table paths: CASE chain ≡ broadcast join, and 1e5 strata run") {
    val s = spark
    import s.implicits._
    // Result identity across the size gate (caseGate=0 forces the
    // broadcast-join path; the default keeps the CASE chain at 3 strata).
    val d = (0L until 3000L)
      .map(i => (i, s"src${i % 3}")).toDF("id", "stratum")
    val rates = Map("src0" -> 0.9, "src1" -> 0.2, "src2" -> 0.0)
    val viaCase = Sampling.stratifiedSample(d, "id", "stratum", rates,
      defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    val viaJoin = Sampling.stratifiedSample(d, "id", "stratum", rates,
      defaultRate = 0.5, caseGate = 0).collect().map(_.getLong(0)).toSet
    assert(viaCase == viaJoin && viaCase.nonEmpty)
    // defaultRate arm: an unlisted stratum samples at the default on
    // BOTH paths (left join + coalesce vs the fold's otherwise).
    val d2 = (0L until 2000L).map(i => (i, "unlisted")).toDF("id", "stratum")
    val defCase = Sampling.stratifiedSample(d2, "id", "stratum", rates, 0.5)
      .collect().map(_.getLong(0)).toSet
    val defJoin = Sampling.stratifiedSample(d2, "id", "stratum", rates, 0.5,
      caseGate = 0).collect().map(_.getLong(0)).toSet
    assert(defCase == defJoin && defCase.nonEmpty)
    val tmCase = Sampling.temperatureMix(d, "id", "stratum", 0.3)
      .collect().map(_.getLong(0)).toSet
    val tmJoin = Sampling.temperatureMix(d, "id", "stratum", 0.3,
      caseGate = 0).collect().map(_.getLong(0)).toSet
    assert(tmCase == tmJoin && tmCase.nonEmpty)
    // The stress point the gate exists for: 1e5 domain-level strata —
    // a CASE chain of that depth breaks JVM codegen limits (64 KB
    // method / constant pool); the joined rate table must plan and run.
    val nStrata = 100000
    val big = (0L until 200000L).map(i => (i, s"d${i % nStrata}"))
      .toDF("id", "stratum")
    val bigRates = (0 until nStrata)
      .map(i => s"d$i" -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    val kept = Sampling.stratifiedSample(big, "id", "stratum", bigRates,
      defaultRate = 0.0).collect().map(_.getLong(0))
    assert(kept.length == 100000 && kept.forall(_ % 2 == 0))
    // temperatureMix at 1e5 sources: plans, runs, lands near target.
    val tmBig = Sampling.temperatureMix(big, "id", "stratum", 0.5)
    assert(math.abs(tmBig.count() / 200000.0 - 0.5) < 0.05)
    // The rates-as-DATA variant (stratum domain too big for any
    // driver-side Map): identical kept set for identical rates.
    val ratesDf = rates.toSeq.toDF("stratum", "rate")
    val viaTable = Sampling.stratifiedSampleByTable(d, "id", "stratum",
      ratesDf, defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    assert(viaTable == viaCase)
    val defTable = Sampling.stratifiedSampleByTable(d2, "id", "stratum",
      ratesDf, defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    assert(defTable == defCase)
    // guards: duplicate stratum rows must not fan the sample out, and a
    // wider rates frame must be rejected instead of silently picking a
    // column as the rate
    val dupRates = (rates.toSeq ++ Seq("src0" -> 0.9)).toDF("stratum", "rate")
    val viaDup = Sampling.stratifiedSampleByTable(d, "id", "stratum",
      dupRates, defaultRate = 0.5).collect().map(_.getLong(0))
    assert(viaDup.length == viaDup.distinct.length && // no duplicates
      viaDup.toSet == viaTable)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSampleByTable(d, "id", "stratum",
        rates.toSeq.map { case (k, r) => (k, r, "note") }
          .toDF("stratum", "rate", "comment"), 0.5)
    }
    // a df that already carries __rate must be refused up front with a
    // clear precondition error, not an ambiguous-column
    // AnalysisException at join time (ADVICE r13)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSampleByTable(d.withColumn("__rate", lit(1.0)),
        "id", "stratum", ratesDf, 0.5)
    }
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSample(d.withColumn("__rate", lit(1.0)),
        "id", "stratum", rates, 0.5, caseGate = 0) // joined path
    }
  }

  test("contaminationHits counts distinct shared n-grams, 0 for clean") {
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training text with other words"))
    val eval = docs((100L, "quick brown fox jumps over something"))
    val got = Decontam.contaminationHits(train, "text", "doc_id",
        eval, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L) // "quick brown fox jumps over" is the shared 5-gram
    assert(got(2L) == 0L)
  }

  test("packByOrder: bins advance at the budget boundary, per shard") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a", 400L), (2L, "a", 500L), (3L, "a", 300L), (4L, "a", 900L),
      (5L, "b", 950L), (6L, "b", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val got = Packing.packByOrder(d, "n_tokens", "doc_id", "source", 1000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"))))
      .toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 400L)))
    assert(got(3L) == ((0L, 900L)))   // starts at 900, overflows bin 0
    assert(got(4L) == ((1L, 200L)))   // cum 1200 → bin 1
    assert(got(5L) == ((0L, 0L)))     // shard b packs independently
    assert(got(6L) == ((0L, 950L)))
  }

  // local reimplementation of Dedup.hex32 for oracle-style spot checks
  private def hex32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("weightedSample: matches the A-ES formula computed locally") {
    val s = spark
    import s.implicits._
    val rows = (0L until 500L).map(i => (i, 1L + i % 50))
    val d = rows.toDF("id", "w")
    val got = Sampling.weightedSample(d, "id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    val want = rows.map { case (id, w) =>
      val u = (hex32Local(s"$id#w1") + 1.0) / 4294967296.0
      id -> math.pow(u, 1.0 / w)
    }.sortBy(-_._2).take(40).map(_._1).toSet
    assert(got == want)
    // stable under repartitioning (pure function of key+weight)
    val got7 = Sampling.weightedSample(d.repartition(7), "id", col("w"), 40)
      .collect().map(_.getLong(0)).toSet
    assert(got7 == got)
  }

  test("weightedSample: heavy weights dominate the sample") {
    val s = spark
    import s.implicits._
    val d = (0L until 1000L).map(i => (i, if (i < 500) 100L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(d, "id", col("w"), k = 100)
      .collect().map(_.getLong(0))
    assert(got.length == 100)
    assert(got.count(_ < 500L) >= 90) // w=100 rows ~99% of the sample
  }

  test("temperatureMix: tail sources upsampled, head capped near target") {
    val s = spark
    import s.implicits._
    // 9:1 skewed two-source corpus
    val d = (0L until 2000L).map(i => (i, if (i < 1800) "head" else "tail"))
      .toDF("id", "source")
    val kept = Sampling.temperatureMix(d, "id", "source", targetFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // α=0.5 flattening: tail kept-rate strictly above head kept-rate
    val headRate = bySource.getOrElse("head", 0) / 1800.0
    val tailRate = bySource.getOrElse("tail", 0) / 200.0
    assert(tailRate > headRate)
    // overall volume near target (hash noise + cap undershoot tolerated)
    assert(math.abs(kept.length / 2000.0 - 0.3) < 0.06)
    // deterministic and repartition-stable
    val kept7 = Sampling.temperatureMix(d.repartition(7), "id", "source", 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept7.toSet == kept.toSet)
  }

  test("capPerGroup: at most cap rows per group, repartition-stable choice") {
    val s = spark
    import s.implicits._
    val d = ((0 until 50).map(i => (i.toLong, "big")) ++
      (100 until 103).map(i => (i.toLong, "small")))
      .toDF("id", "grp")
    val kept = Sampling.capPerGroup(d, "id", "grp", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "big") == 10)
    assert(kept.count(_._2 == "small") == 3) // under cap: untouched
    val kept7 = Sampling.capPerGroup(d.repartition(7), "id", "grp", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept7.toSet == kept.toSet)
  }

  test("leakFreeSplit: no duplicate class straddles train/eval") {
    val s = spark
    import s.implicits._
    // 10 chained classes of 3 (ids 3c, 3c+1, 3c+2) + singletons 100-149
    val ids = (0L until 30L) ++ (100L until 150L)
    val d = ids.toDF("doc_id")
    val pairs = (0 until 10).flatMap { c =>
      Seq((3L * c, 3L * c + 1), (3L * c + 1, 3L * c + 2))
    }.toDF("id_a", "id_b")
    val got = Sampling.leakFreeSplit(d, pairs, "doc_id", evalFrac = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[String]("split")))
    assert(got.length == ids.length)
    // every member of a class gets the class's split
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == 1)
    }
    // chained classes actually collapsed to one component (min id)
    assert(got.filter(_._1 < 30L).groupBy(_._2).keySet ==
      (0 until 10).map(c => 3L * c).toSet)
    val bySplit = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.getOrElse("eval", 0) > 0 && bySplit.getOrElse("train", 0) > 0)
  }
}
