package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered prefix aggregation — the shared core of every
  * "global rank / running total over the whole corpus" operator
  * ([[Shuffling.deterministicShuffle]], [[Budget.selectByBudget]], exact
  * ntile binning). The naive encoding (`sum()/row_number() OVER (ORDER BY
  * …)`) plans to a SINGLE-partition window: the whole corpus through one
  * task. This computes the identical answer with bounded parallelism:
  *
  *   1. range-repartition by `order` (`partitions` contiguous ranges of
  *      the global order);
  *   2. census: aggregate `value` per range — a `partitions`-row table —
  *      and cumsum it to per-range exclusive offsets (`__off`) plus the
  *      grand total (`__n`) with a window over those few rows;
  *   3. intra-range running aggregate (window partitioned by range id)
  *      + broadcast-join the census: global inclusive prefix
  *      = `__off` + `__run`.
  *
  * Consistency without persist(): the range partitioner SAMPLES its
  * boundaries, so the census pass and the rank pass MUST read one
  * physical partitioning — two independent executions of the same
  * `repartitionByRange` can sample DIFFERENT boundaries and return
  * silently wrong prefix sums. Catalyst's exchange reuse is NOT a
  * reliable pin here: column pruning gives the census branch a narrower
  * schema than the per-row branch, the canonical plans diverge, and the
  * reuse silently doesn't fire (observed: two separate rangepartitioning
  * stages). Instead the partitioning is pinned by RDD IDENTITY: one
  * `.rdd` barrier after the exchange, shared by both branches — Spark
  * core deduplicates the ShuffleDependency by object identity, so the
  * range shuffle is computed exactly once and both passes read the same
  * physical partitions. That is a scheduler guarantee, not an optimizer
  * heuristic. vs the persist() alternative at 100 TB: no executor
  * storage pinned, no cache to leak, and the shuffle files already exist
  * for fault recovery. The price is one InternalRow↔Row conversion per
  * branch read and a codegen fence at the barrier — small next to the
  * corpus shuffle itself. CensusSpec asserts both branch scans share one
  * RDD lineage.
  */
object Census {

  /** Adds to `df`:
    *   - `__off` — exclusive prefix sum of `value` over all preceding
    *     ranges of the global `order`;
    *   - `__run` — inclusive running sum of `value` within the row's
    *     range (ties broken by `order`, so pass a unique tie-break
    *     column for deterministic results);
    *   - `__n`   — grand total of `value` over the whole input.
    *
    * Global inclusive prefix sum = `__off + __run`; with `value =
    * lit(1L)` that is the global 1-based rank. `gate` (given `__off`)
    * lets callers drop whole ranges BEFORE the per-row window runs —
    * e.g. a token-budget selection prunes every range whose offset
    * already exceeds the budget on the broadcast census, so at 100 TB
    * most of the corpus short-circuits without window evaluation.
    *
    * `value` is aggregated as LONG (exact, order-independent sums).
    */
  def prefix(df: DataFrame, order: Seq[Column], value: Column,
      partitions: Int, gate: Column => Column = _ => lit(true)): DataFrame = {
    // NOTE repartitionByRange picks its boundaries from a SAMPLING pass
    // over `df` and the shuffle then evaluates `df` again — when the
    // input lineage is expensive (regex-heavy quality scoring is the
    // registry's common case), CALLERS should persist it first
    // (Caches.track at the query sites). prefix itself stays
    // persist-free: the census-op contract (CensusSpec) is that only
    // the dedup family holds tracked state.
    val ranged = df.repartitionByRange(partitions, order: _*)
    // RDD-identity barrier: ONE range shuffle feeding both passes (see
    // object doc). Both branches below reference this same RDD object.
    val pinned = df.sparkSession.createDataFrame(ranged.rdd, ranged.schema)
    val parted = pinned
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    // census frame: ≤ `partitions` rows, so the partition-less windows
    // below are bounded by the range count, never by the data
    val w = Window.orderBy("__pid")
    val census = parted.groupBy("__pid").agg(sum("__v").as("__t"))
      .withColumn("__off", coalesce(sum("__t").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__t").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__n")
    parted.join(broadcast(census), Seq("__pid"))
      .filter(gate(col("__off")))
      .withColumn("__run", sum("__v").over(
        Window.partitionBy("__pid").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__pid", "__v")
  }

  /** Exact `a DIV b` for non-negative longs via double division of an
    * exactly-divisible numerator — exact while `a + b < 2^53` (9·10^15
    * rows, far past any corpus). `floor(a / b)` alone is NOT safe: the
    * inexact quotient can round across an integer boundary. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Exact discrete quantiles of `valueCol` — `percentile_disc`
    * semantics: for each q, the value at global rank ceil(q·n) of the
    * (`valueCol`, `tieBreak`) ascending order. The classic encodings are
    * both scale-hostile: `percentile()` collects all values per group,
    * and a global sort is single-partition; this reads the value off
    * [[prefix]]'s distributed rank in one pass (the q-explode multiplies
    * rows only through a fused filter, no extra shuffle).
    *
    * Float discipline: pick DYADIC qs (k/2^m — 0.25, 0.5, 0.875, …).
    * ceil(q·n) is then exact in ANY engine's double arithmetic; a q like
    * 0.99 can land on either side of an integer boundary depending on
    * the engine's rounding (0.2·5 = 1.0000000000000002 in IEEE). */
  def quantilesDisc(df: DataFrame, valueCol: String, tieBreak: Column,
      qs: Seq[Double], partitions: Int): DataFrame =
    prefix(df, Seq(col(valueCol).asc, tieBreak), lit(1L), partitions)
      .withColumn("q", explode(typedLit(qs)))
      .filter(col("__off") + col("__run") ===
        ceil(col("q") * col("__n")).cast("long"))
      .select(col("q"), col(valueCol).as("value"))

  /** SQL `ntile(k)` bucket from a global 1-based `rank` and total row
    * count `n`: the first `n % k` buckets hold `n DIV k + 1` rows, the
    * rest `n DIV k` — identical to the window function, computed from
    * [[prefix]]'s distributed rank instead of a single-partition sort. */
  def ntileBucket(rank: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val q = idiv(n, kL)            // base bucket size
    val rem = pmod(n, kL)          // this many leading buckets get q+1
    val cut = rem * (q + lit(1L))  // rows living in the fat buckets
    when(rank <= cut, idiv(rank + q, q + lit(1L)))
      .otherwise(rem + idiv(rank - cut + q - lit(1L), q))
      .cast("int")
  }
}
