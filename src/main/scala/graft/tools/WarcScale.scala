package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ext.WarcFixtures
import graft.sources.Warc

/** WARC reader throughput at scale: the registry queries prove
  * correctness on ~5k-document fixtures; this measures the two read
  * paths where their 100 TB designs differ —
  *
  *   - '''many-shards streaming''' (`readWet` over per-record-gzip
  *     shard files): parallelism = files, the production crawl shape
  *     (Common Crawl: ~64–90k files/crawl, so a cluster's cores stay
  *     busy as long as files ≫ cores).
  *   - '''one-fat-file streaming''': the pathological input for the
  *     per-file path — a single archive is ONE task no matter how many
  *     cores wait. This is the arm the splittable path exists for.
  *   - '''one-fat-file splittable''' (`readWetSplittable` on the
  *     uncompressed twin): Hadoop delimiter splits re-widen the same
  *     bytes across tasks — the measured gap between this arm and the
  *     previous one is the whole argument for keeping a decompressed
  *     staging copy of fat archives.
  *
  * The corpus is `documents.parquet` replicated `replicas`× with
  * distinct doc ids (deterministic — no RNG), written once as gz
  * shards and once as a single plain `.wet`. All arms must agree on
  * record count and on a content checksum (bit_xor of text hashes) —
  * a throughput number for a reader that dropped records is
  * meaningless.
  *
  * Usage: runMain graft.tools.WarcScale [sfDir] [replicas] [shards]
  *   (defaults /root/testdata/sf0.1, 40, 64 → ~200k records ≈ 57 MB
  *   of text; arms are re-run `reps` times and the min wall is
  *   reported, same discipline as Bench)
  */
object WarcScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 40
    val shards = if (args.length > 2) args(2).toInt else 64
    val reps = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft_warcscale_").toString
    // replicate with disjoint id ranges; text perturbed per replica so
    // gzip can't trivially collapse repeats (suffix, not re-generation)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source", $"text")
    val maxId = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val big = docs0
      .crossJoin(spark.range(replicas).toDF("rep"))
      .select(($"doc_id" + $"rep" * maxId).as("doc_id"), $"source",
        concat($"text", lit(" rep "), $"rep").as("text"))
    val stage = s"$base/stage"
    big.write.parquet(s"$stage/documents.parquet")
    val nDocs = spark.read.parquet(s"$stage/documents.parquet").count()
    val textBytes = spark.read.parquet(s"$stage/documents.parquet")
      .agg(sum(octet_length($"text"))).head().getLong(0)
    println(s"[warcscale] corpus: $nDocs records, " +
      f"${textBytes / 1e6}%.1f MB text")

    WarcFixtures.writeWetShards(spark, stage, s"$base/shards", shards,
      gzip = true)
    WarcFixtures.writeWetShards(spark, stage, s"$base/fat", 1,
      gzip = false)
    val fat = new java.io.File(s"$base/fat").listFiles()
      .filter(_.getName.endsWith(".warc.wet")).head.getAbsolutePath
    def du(dir: String): Long = new java.io.File(dir).listFiles()
      .map(_.length()).sum
    println(f"[warcscale] on disk: shards-gz ${du(s"$base/shards") / 1e6}%.1f MB" +
      f" in $shards files, fat-plain ${du(s"$base/fat") / 1e6}%.1f MB in 1 file")

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64($"url", $"text")))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    def arm(name: String)(df: => org.apache.spark.sql.DataFrame): (Long, Long) = {
      var best = Double.MaxValue
      var sum: (Long, Long) = null
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        sum = checksum(df)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val mbps = textBytes / 1e6 / best
      val krps = sum._1 / 1e3 / best
      println(f"[warcscale] $name%-22s wall=$best%6.2f s  " +
        f"$mbps%7.1f MB/s  $krps%6.1f krec/s  rows=${sum._1}")
      sum
    }

    val a = arm("shards-gz streaming")(Warc.readWet(spark, s"$base/shards"))
    val b = arm("fat-file streaming")(Warc.readWet(spark, fat))
    val c = arm("fat-file splittable")(
      Warc.readWetSplittable(spark, fat).filter($"error".isNull))
    require(a == b && b == c,
      s"arms disagree: shards=$a fatStream=$b fatSplit=$c")

    // the sibling corpus format: same documents as .jsonl.zst shards
    // through CompressedText (url synthesized identically so the
    // checksum is comparable across formats)
    import graft.sources.CompressedText
    val zstDir = s"$base/zst"
    val forZst = spark.read.parquet(s"$stage/documents.parquet")
      .select(concat(lit("https://"), $"source",
          lit(".example.org/docs/"), $"doc_id",
          lit("?utm_source=fixture&v=1")).as("url"), $"text")
      .repartitionByRange(shards, $"url")
    CompressedText.writeJsonlZstdShards(forZst, zstDir)
    println(f"[warcscale] on disk: shards-zst ${du(zstDir) / 1e6}%.1f MB " +
      s"in $shards files")
    val zschema = StructType(Seq(StructField("url", StringType),
      StructField("text", StringType)))
    val d = arm("shards-zst jsonl")(
      CompressedText.readJsonl(spark, zschema, zstDir)._1)
    require(d == a, s"zst arm disagrees: $d vs $a")
    val parts = Warc.readWetSplittable(spark, fat).rdd.getNumPartitions
    println(s"[warcscale] all arms agree (count+checksum); " +
      s"splittable used $parts input splits vs 1 task for fat streaming")
    spark.stop()
  }
}
