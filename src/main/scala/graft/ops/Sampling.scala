package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — repartition
  * the corpus and the sample changes, and no external engine can reproduce
  * it. These operators decide membership from a HASH OF THE ROW KEY alone:
  * the sample is a pure row-wise filter (scan-fused, no shuffle, no RNG
  * state), stable under any partitioning/ordering, reproducible in any
  * md5-capable engine (the DuckDB oracle recomputes it), and consistent
  * across tables — joining two hash-samples of the same key space keeps
  * matching rows together, which row-RNG sampling cannot do.
  */
object Sampling {

  /** Keep-probability threshold: row survives iff
    * hex32(key || "#" || salt) < rate · 2³². hex32 is uniform on [0, 2³²)
    * (md5 avalanche), so the kept fraction converges to `rate`. */
  private def keep(key: Column, rate: Column, salt: String): Column =
    Dedup.hex32(concat(key.cast("string"), lit("#" + salt))) <
      (rate * lit(4294967296.0)).cast("long")

  /** Deterministic Bernoulli(rate) sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "s1"): DataFrame =
    df.filter(keep(col(keyCol), lit(rate), salt))

  /** Above this stratum count the rate lookup becomes a broadcast join
    * instead of a literal CASE chain: a when/otherwise tree is the
    * fastest shape at human-scale config sizes (scan-fused, no join
    * operator at all — the q_mix_temperature / q_sample_stratified plan
    * locks assert exactly that), but it is O(#strata) EXPRESSION DEPTH,
    * and it blows the JVM 64 KB method limit / constant pool long
    * before the data is big. Honesty bound: both Map-based paths
    * materialize the rate table on the DRIVER (the API takes a Scala
    * Map) and broadcast it — comfortable to ~10⁶-10⁷ strata, NOT to
    * 10⁸ (driver heap + the 8 GB broadcast ceiling). Rate tables at
    * data scale are data, not config: pass them as a DataFrame via
    * [[stratifiedSampleByTable]], which never touches the driver and
    * lets Catalyst/AQE choose broadcast vs shuffle join. */
  private val maxCaseStrata = 128

  /** [[stratifiedSample]] with the rate table AS DATA: `rates` is a
    * DataFrame with columns (`stratumCol`, rate Double). No driver
    * materialization, no forced broadcast — the join strategy is left
    * to Catalyst/AQE, which is the only correct answer once the
    * stratum domain is itself data-scale (10⁷+ registrable domains).
    * Same kept set as the other paths for the same rates: membership
    * is hex32(key#salt) < floor(rate·2³²) either way. Strata absent
    * from `rates` keep at `defaultRate`; a null stratum keeps at
    * `defaultRate` (no join match). */
  def stratifiedSampleByTable(df: DataFrame, keyCol: String,
      stratumCol: String, rates: DataFrame, defaultRate: Double,
      salt: String = "s1"): DataFrame = {
    // exactly (stratum, rate): a wider frame would silently pick an
    // arbitrary column as the rate (review r13)
    require(rates.columns.length == 2 &&
      rates.columns.contains(stratumCol),
      s"rates must be exactly ($stratumCol, <rate>); got " +
        rates.columns.mkString(", "))
    // the synthetic rate column must not collide with either input
    // (ADVICE r13: a df that already carries __rate produced an
    // ambiguous-column AnalysisException at join time instead of a
    // clear precondition error — leakFreeSplit's guard, mirrored)
    require(!df.columns.contains("__rate") && stratumCol != "__rate",
      "stratifiedSampleByTable adds a `__rate` column; input already has one")
    val rateCol = rates.columns.filterNot(_ == stratumCol).head
    // collapse duplicate stratum entries BEFORE the join: a duplicated
    // stratum row would fan every matching corpus row out N ways —
    // duplicate "sample" rows no Map path can produce (review r13).
    // max() makes the pick deterministic; rate tables are expected
    // unique per stratum, this is a guard not a feature.
    val r = rates.groupBy(stratumCol)
      .agg(max(col(rateCol)).as("__rate"))
    df.join(r, Seq(stratumCol), "left")
      .filter(keep(col(keyCol),
        coalesce(col("__rate"), lit(defaultRate)), salt))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Broadcast-joined rate lookup: keeps `df`'s schema and row identity
    * (left join on the stratum column + coalesce to the default), so
    * the kept set is IDENTICAL to the CASE chain's for the same rates —
    * both are pure functions of (key, stratum rate, salt). */
  private def keepByRateTable(df: DataFrame, keyCol: String,
      stratumCol: String, rates: Seq[(String, Double)],
      defaultRate: Double, salt: String): DataFrame = {
    require(!df.columns.contains("__rate") && stratumCol != "__rate",
      "rate-table sampling adds a `__rate` column; input already has one")
    val spark = df.sparkSession
    val rateDf = spark.createDataFrame(rates).toDF(stratumCol, "__rate")
    df.join(broadcast(rateDf), Seq(stratumCol), "left")
      .filter(keep(col(keyCol),
        coalesce(col("__rate"), lit(defaultRate)), salt))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Stratified deterministic sample: per-stratum keep rates (domain
    * mixing — e.g. downweight Common-Crawl-ish sources, keep all of a
    * curated set), `defaultRate` for unlisted strata. Size-gated rate
    * lookup: a scan-fused literal CASE chain at config-scale stratum
    * counts, a broadcast-joined rate table above [[maxCaseStrata]]
    * (identical kept set — see [[keepByRateTable]]); `caseGate`
    * overrides the gate (tests pin each path). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "s1", caseGate: Int = maxCaseStrata): DataFrame =
    if (rates.size > caseGate)
      keepByRateTable(df, keyCol, stratumCol, rates.toSeq.sortBy(_._1),
        defaultRate, salt)
    else {
      val rate = rates.foldRight(lit(defaultRate): Column) {
        case ((stratum, r), alt) =>
          when(col(stratumCol) === stratum, lit(r)).otherwise(alt)
      }
      df.filter(keep(col(keyCol), rate, salt))
    }

  /** Temperature-flattened source mixing (the multilingual-corpus
    * sampling rule of the mT5/XLM-R line): source s is kept at a rate
    * ∝ c_s^½ / c_s, which upsamples tail sources relative to their raw
    * share — α = 0.5 flattening of the source multinomial. Two passes:
    * a per-source count agg whose result is driver-collected (#sources
    * is human-scale config, not data-scale), then one scan-fused CASE
    * filter with the same hash-threshold keep rule as [[hashSample]] —
    * no shuffle of the corpus, stable under repartitioning.
    *
    * Determinism: per-source weights are INTEGER-quantized
    * (floor(sqrt(c)·2²⁰)) so the weight sum is order-independent exact
    * integer arithmetic, and sqrt (unlike pow/ln) is IEEE-754
    * correctly-rounded — every rate literal is reproduced bit-for-bit
    * by the DuckDB oracle. Sources whose rate caps at 1.0 make the
    * sample undershoot `targetFrac` slightly; there is deliberately no
    * iterative renormalization (bit-determinism beats the last 1-2 % of
    * target accuracy). */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
      targetFrac: Double, salt: String = "tm1",
      caseGate: Int = maxCaseStrata): DataFrame = {
    // null-source rows get no CASE arm below → rate 0 → dropped; filter
    // them out of the rate table rather than NPE-ing the sort
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("cnt"))
      .collect().filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val ws = counts.map { case (_, c) =>
      math.floor(math.sqrt(c.toDouble) * 1048576.0).toLong }
    val sw = ws.sum
    // association mirrors the oracle SQL exactly: ((f*n)*w)/sw/c
    val rates = counts.zip(ws).map { case ((src, c), w) =>
      src -> math.min(1.0, targetFrac * n * w / sw / c)
    }
    if (rates.length > caseGate)
      // Size-gated like [[stratifiedSample]]: the same integer-quantized
      // rate VALUES ride a broadcast-joined table instead of a CASE
      // chain (identical kept set; unlisted = null source → no match →
      // dropped, the defaultRate-0 twin of the fold's lit(0.0) base).
      keepByRateTable(df, keyCol, sourceCol, rates.toSeq, 0.0, salt)
    else {
      val rate = rates.foldRight(lit(0.0): Column) { case ((src, r), alt) =>
        when(col(sourceCol) === src, lit(r)).otherwise(alt)
      }
      df.filter(keep(col(keyCol), rate, salt))
    }
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each row draws u = uniform(0,1] from md5(key#salt)
    * and gets priority u^(1/w); the k largest priorities ARE a weighted
    * sample without replacement — P(row enters before any given subset)
    * ∝ its weight. Same determinism contract as [[hashSample]]: the
    * sample is a pure function of (key, weight, salt), stable under
    * repartitioning and reproducible by the DuckDB oracle.
    *
    * Scale: the priority is a scan-fused projection and the selection is
    * `orderBy(desc).limit(k)` → TakeOrderedAndProject (per-partition
    * top-k heaps + driver merge of #partitions·k rows, no global sort,
    * no shuffle of the corpus).
    *
    * Cross-engine note: pow/ln are ~1-ulp libm functions, not bit-pinned
    * like the integer hash math used elsewhere — membership at the k-th
    * boundary is only decided identically because adjacent order
    * statistics at corpus sizes sit ~1e-9 apart, ~7 decades above ulp
    * noise. The priority column itself is therefore DROPPED from the
    * output (only membership is cross-engine exact, not the float).
    * Weights must be >= 1; callers clamp (`greatest(w, 1)`). */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      k: Int, salt: String = "w1"): DataFrame = {
    val u = (Dedup.hex32(concat(col(keyCol).cast("string"),
      lit("#" + salt))).cast("double") + lit(1.0)) / lit(4294967296.0)
    df.withColumn("__pri", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("__pri").desc)
      .limit(k)
      .drop("__pri")
  }

  /** Per-group volume cap: keep at most `cap` rows of each group, the
    * batch twin of the streaming admission quota
    * ([[graft.streaming.Guards.admitQuota]]) — "no crawl domain
    * contributes more than N docs". WHICH rows survive is a
    * deterministic hash lottery (md5 rank within the group), not
    * arrival order, so the kept set is stable under repartitioning and
    * reproducible cross-engine. One partitioned window — groups are
    * independent, so this is the scale-correct plan; a skewed
    * mega-group costs one task, same bound as any per-group agg. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      cap: Int, salt: String = "cap1"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    df.withColumn("__k", Dedup.hex32(concat(col(keyCol).cast("string"),
        lit("#" + salt))))
      .withColumn("__r", row_number().over(
        w.partitionBy(groupCol).orderBy(col("__k"), col(keyCol))))
      .filter(col("__r") <= cap)
      .drop("__k", "__r")
  }

  /** Leakage-free train/eval split: a near-duplicate of a training row
    * in the eval set inflates every metric it touches, so the split must
    * be decided per DUPLICATE CLASS, not per document. Labels each row
    * with its connected component over the near-dup `pairs` graph
    * ([[Dedup.assignComponents]] — singletons label themselves) and
    * hash-routes the whole class: eval iff
    * hex32(component#salt) < evalFrac·2³². Every member of a class lands
    * in the same split by construction.
    *
    * Scale: the pairs graph is the already-materialized dedup artifact;
    * the component join shuffles ids only, and the split decision is a
    * scan-fused projection on the labeled rows. */
  def leakFreeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
      evalFrac: Double, salt: String = "sp1"): DataFrame = {
    require(!df.columns.contains("component") && !df.columns.contains("split"),
      "leakFreeSplit adds `component` and `split`; input already has one")
    df.join(Dedup.assignComponents(df, pairs, idCol), Seq(idCol))
      .withColumn("split",
        when(keep(col("component"), lit(evalFrac), salt), lit("eval"))
          .otherwise(lit("train")))
  }
}
