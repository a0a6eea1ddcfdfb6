package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CompressedText

/** Pure-JVM compressed text-corpus I/O: zstd (incl. multi-frame) and
  * concatenated-member gzip line reading, codec-damage quarantine, the
  * JSONL quarantine split, and the zstd shard writer round trip. */
class CompressedTextSpec extends AnyFunSuite with SparkTestSupport {

  private def tmpDir(): String =
    Files.createTempDirectory("ctspec_").toString

  private def zst(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bo, 3)
    z.setChecksum(true) // what writeJsonlZstdShards emits
    z.write(s.getBytes(UTF_8)); z.close()
    bo.toByteArray
  }

  private def gz(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes(UTF_8)); g.close()
    bo.toByteArray
  }

  test("readLines: mixed dir of zst / multi-frame zst / concat-gz / plain") {
    val dir = tmpDir()
    Files.write(Paths.get(s"$dir/a.jsonl.zst"), zst("a1\na2\n"))
    // two independent zstd FRAMES back-to-back (block-parallel
    // compressors and simple concatenation both produce this)
    Files.write(Paths.get(s"$dir/b.jsonl.zst"), zst("b1\n") ++ zst("b2\n"))
    // two gzip MEMBERS back-to-back — GZIPInputStream would stop at one
    Files.write(Paths.get(s"$dir/c.jsonl.gz"), gz("c1\n") ++ gz("c2\n"))
    Files.write(Paths.get(s"$dir/d.jsonl"), "d1\nd2".getBytes(UTF_8))
    val rows = CompressedText.readLines(spark, dir).collect()
    assert(rows.forall(_.getAs[String]("error") == null))
    assert(rows.map(_.getAs[String]("line")).sorted.toSeq
      == Seq("a1", "a2", "b1", "b2", "c1", "c2", "d1", "d2"))
    // line numbers are per-file ordinals
    assert(rows.filter(_.getAs[String]("file").endsWith("c.jsonl.gz"))
      .map(r => r.getAs[Long]("line_no") -> r.getAs[String]("line"))
      .sortBy(_._1).toSeq == Seq(0L -> "c1", 1L -> "c2"))
  }

  test("codec damage quarantines the remainder; strict throws") {
    val dir = tmpDir()
    // checksummed frame with a flipped payload byte → detected at the
    // frame checksum (a checksum-LESS frame can decode silently wrong —
    // that is the zstd format's limit and why the writer sets checksums)
    val broken = zst("one\ntwo\n").clone()
    broken(broken.length - 8) = (broken(broken.length - 8) ^ 0x7f).toByte
    Files.write(Paths.get(s"$dir/x.jsonl.zst"), broken)
    // truncated frame → "Truncated source" (detection independent of
    // checksums; continuous-mode zstd would return EMPTY here — probed)
    val whole = zst("aaa\nbbb\nccc\n")
    Files.write(Paths.get(s"$dir/y.jsonl.zst"),
      whole.take(whole.length - 5))
    val rows = CompressedText.readLines(spark, dir).collect()
    val errs = rows.filter(_.getAs[String]("error") != null)
    assert(errs.length == 2 &&
      errs.forall(_.getAs[String]("error").startsWith("codec:")),
      rows.mkString("\n"))
    intercept[org.apache.spark.SparkException] {
      CompressedText.readLines(spark, dir, strict = true).collect()
    }
  }

  test("readJsonl splits good rows from malformed lines and codec damage") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    Files.write(Paths.get(s"$dir/a.jsonl.zst"), zst(
      """{"id":1,"t":"x"}""" + "\n" +
        """not json at all""" + "\n" +
        """{"id":2,"t":"y"}""" + "\n"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val (good, bad) = CompressedText.readJsonl(spark, schema, dir)
    assert(good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "x"), (2L, "y")))
    val b = bad.collect()
    assert(b.length == 1 && b.head.getAs[String]("raw_line")
      == "not json at all")
    assert(b.head.getAs[String]("reason") == "malformed json")
  }

  test("junk between gzip members quarantines the remainder, never clean-EOF") {
    // ADVICE r15: ConcatGzip must distinguish EOF from bytes-that-are-
    // not-a-member — otherwise a flipped magic byte silently drops the
    // shard remainder with no error row.
    val dir = tmpDir()
    Files.write(Paths.get(s"$dir/j.jsonl.gz"),
      gz("line one\nline two\n") ++ "NOTGZIP".getBytes(UTF_8) ++
        gz("unreachable\n"))
    val rows = CompressedText.readLines(spark, dir).collect()
    val ok = rows.filter(_.getAs[String]("error") == null)
      .map(_.getAs[String]("line"))
    assert(ok.toSeq == Seq("line one", "line two"))
    val errs = rows.filter(_.getAs[String]("error") != null)
    assert(errs.length == 1 && errs.head.getAs[String]("error")
      .contains("not a member header"))
    intercept[org.apache.spark.SparkException] {
      CompressedText.readLines(spark, dir, strict = true).collect()
    }
  }

  test("zero-byte shards (failed writers) yield no rows, no errors") {
    val dir = tmpDir()
    Files.write(Paths.get(s"$dir/dead.jsonl.zst"), Array.empty[Byte])
    Files.write(Paths.get(s"$dir/dead.jsonl.gz"), Array.empty[Byte])
    Files.write(Paths.get(s"$dir/dead.jsonl"), Array.empty[Byte])
    Files.write(Paths.get(s"$dir/live.jsonl.zst"), zst("alive\n"))
    val rows = CompressedText.readLines(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("line"),
      r.getAs[String]("error"))).toSeq == Seq(("alive", null)), rows.toSeq)
  }

  test("streamJsonl ingests arriving zst shards exactly once per file") {
    import org.apache.spark.sql.types._
    val watch = tmpDir()
    val ckpt = tmpDir()
    Files.write(Paths.get(s"$watch/a.jsonl.zst"),
      zst("""{"id":1,"t":"w1a"}""" + "\n" + """{"id":2,"t":"w1b"}""" + "\n"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val q = CompressedText.streamJsonl(spark, schema, watch)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ts = df.select("t").collect().map(_.getString(0)).toSeq
        if (ts.nonEmpty) seen.add(ts.sorted)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      Files.write(Paths.get(s"$watch/b.jsonl.zst"),
        zst("""{"id":3,"t":"w2"}""" + "\n" + "not json\n"))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.size == 2, seen)
    assert(seen.poll() == Seq("w1a", "w1b"))
    assert(seen.poll() == Seq("w2")) // malformed line dropped, not fatal
  }

  test("zstd shard writer round-trips every field; one shard per partition") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 500)
      .map(i => (i.toLong, s"src${i % 5}", s"text $i é中"))
      .toDF("doc_id", "source", "text")
      .repartitionByRange(4, col("doc_id"))
    CompressedText.writeJsonlZstdShards(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst"))
    assert(files.length == 4)
    // commit protocol (ADVICE r15): every attempt temp was renamed into
    // place — no `_`-prefixed leftovers for readers to skip
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_")), "uncommitted temp shard left")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))
    val (good, bad) = CompressedText.readJsonl(spark, schema, dir)
    assert(bad.count() == 0)
    assert(good.count() == 500)
    assert(good.as[(Long, String, String)].collect().toSet
      == df.as[(Long, String, String)].collect().toSet)
  }

  test("shard-size targeting: a skewed fat partition rolls to target-sized shards") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = tmpDir()
    // ~1 KB high-entropy lines (md5 hex chains) so compressed size
    // tracks input size and the roll check engages deterministically
    def blob(i: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 32).map(k => md.digest(s"$i:$k".getBytes(UTF_8))
        .map("%02x".format(_)).mkString).mkString
    }
    val target = 200L * 1024
    val df = (1 to 600).map(i => (i.toLong, blob(i))).toDF("id", "t")
      .coalesce(1) // ONE skewed fat partition
    CompressedText.writeJsonlZstdShards(df, dir,
      targetShardBytes = target)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst"))
    assert(files.length >= 2,
      s"expected the fat partition to roll, got ${files.length} shard")
    // size envelope: target + one codec flush block + one record
    val slack = 192 * 1024
    assert(files.forall(_.length <= target + slack),
      files.map(f => s"${f.getName}=${f.length}").mkString(", "))
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_")), "uncommitted temp shard left")
    // round trip across the rolls: nothing lost, nothing duplicated
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val (good, bad) = CompressedText.readJsonl(spark, schema, dir)
    assert(bad.count() == 0)
    assert(good.select("id").as[Long].collect().sorted.toSeq
      == (1 to 600).map(_.toLong))
  }

  private def entropyBlob(i: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 32).map(k => md.digest(s"$i:$k".getBytes(UTF_8))
      .map("%02x".format(_)).mkString).mkString
  }

  test("frame-indexed shards split across tasks; rows and ordinals match streaming") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 400).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1) // one fat shard
    CompressedText.writeJsonlZstdShards(df, dir,
      frameBytes = 16 * 1024) // ~16 KB input per frame
    val idx = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_zidx-"))
    assert(idx.length == 1, "expected one sidecar index")
    val split = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 32 * 1024)
    assert(split.rdd.getNumPartitions > 1 ||
      split.rdd.partitions.length > 1)
    val a = split.collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(a.forall(_._3 == null))
    val b = CompressedText.readLines(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    // byte- and ordinal-identical to the whole-file streaming reader
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    assert(a.length == 400)
  }

  test("splittable read: frame damage quarantines ONE group; accounting fails closed") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 300).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 24 * 1024)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val idxFile = new java.io.File(dir, s"_zidx-${shard.getName}")
    val idxLines = new String(Files.readAllBytes(idxFile.toPath), UTF_8)
      .linesIterator.toSeq
    val frames = idxLines.tail.map(_.split(" ").map(_.toLong))
    assert(frames.length >= 3, s"want >=3 frames, got ${frames.length}")
    // Hadoop LocalFileSystem keeps .crc sidecars; direct tampering
    // below must also drop them or the FS layer reports ITS checksum
    // error instead of exercising the zstd containment path
    def dropCrc(dir: java.io.File): Unit = dir.listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    // flip one byte in the middle of the SECOND frame
    val bytes = Files.readAllBytes(shard.toPath)
    val mid = (frames(1)(0) + frames(1)(1) / 2).toInt
    bytes(mid) = (bytes(mid) ^ 0x55).toByte
    Files.write(shard.toPath, bytes)
    dropCrc(new java.io.File(dir))
    val rows = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect() // splitBytes=1 → one group per frame
    val errs = rows.filter(_.getString(3) != null)
    assert(errs.length == 1 &&
      errs.head.getString(3).contains(s"offset ${frames(1)(0)}"),
      errs.map(_.getString(3)).mkString("; "))
    val ok = rows.filter(_.getString(3) == null).map(_.getLong(1)).toSet
    // every line OUTSIDE the damaged frame survives
    val damagedRange =
      (frames(1)(2) until frames(1)(2) + frames(1)(3)).toSet
    assert(ok == (0L until 300L).toSet -- damagedRange)
    // accounting arm: inflate one healthy frame's nLines in the index —
    // a short-but-clean decode must surface, never silently pass
    val dir2 = tmpDir()
    CompressedText.writeJsonlZstdShards(df, dir2, frameBytes = 24 * 1024)
    val shard2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val idx2 = new java.io.File(dir2, s"_zidx-${shard2.getName}")
    val l2 = new String(Files.readAllBytes(idx2.toPath), UTF_8)
      .linesIterator.toSeq
    val f0 = l2(1).split(" ")
    val forged = (l2.head +:
      ((f0.take(3) :+ (f0(3).toLong + 1).toString).mkString(" ") +:
        l2.drop(2))).mkString("", "\n", "\n")
    Files.write(idx2.toPath, forged.getBytes(UTF_8))
    dropCrc(new java.io.File(dir2))
    val rows2 = CompressedText.readLinesSplittable(spark, dir2,
      splitBytes = 1).collect()
    assert(rows2.exists(r => r.getString(3) != null &&
      r.getString(3).contains("index says")))
  }

  test("shards without an index fall back to whole-file streaming reads") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 50).map(i => (i.toLong, s"line $i")).toDF("id", "t")
      .coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir) // frameBytes = 0
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_zidx-")))
    val rows = CompressedText.readLinesSplittable(spark, dir).collect()
    assert(rows.length == 50 && rows.forall(_.getString(3) == null))
  }

  test("public seekable format: sidecar-less shard splits from the tail table") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 400).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 16 * 1024,
      sidecarIndex = false, seekableFooter = true)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_zidx-")), "no sidecar expected")
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    // the tail carries the PUBLIC magics: skippable 0x184D2A5E at the
    // table start, seekable 0x8F92EAB1 in the last 4 bytes
    val bytes = Files.readAllBytes(shard.toPath)
    val tail = bytes.takeRight(4).map(_ & 0xff)
    assert(tail.sameElements(Array(0xb1, 0xea, 0x92, 0x8f)),
      tail.mkString(","))
    val split = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 32 * 1024)
    assert(split.rdd.getNumPartitions > 1)
    val a = split.collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(a.forall(_._3 == null) && a.length == 400)
    // line CONTENT matches the streaming reader; line_no is the
    // decompressed byte offset here (unique, order-preserving) — the
    // ORDER by it must equal the streaming order
    val b = CompressedText.readLines(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(a.sortBy(_._1).map(_._2).toSeq ==
      b.sortBy(_._1).map(_._2).toSeq)
    assert(a.map(_._1).distinct.length == 400, "line_no must be unique")
  }

  test("split task metadata is O(1) per split, independent of frame count") {
    // r17 judge finding #1: splits used to carry tail = ALL subsequent
    // frame entries in their task closure — O(splits × frames)
    // driver-built serialized metadata per file. The fix ships frame
    // tables ONCE by broadcast; each split is a constant-size
    // (file, startIdx, endIdx) pointer. Pin that: the serialized split
    // stays small and does NOT grow when the file has twice the frames.
    import spark.implicits._
    def planMax(nRows: Int): Int = {
      val dir = tmpDir()
      val df = (1 to nRows).map(i => (i.toLong, entropyBlob(i)))
        .toDF("id", "t").coalesce(1)
      CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 4 * 1024,
        sidecarIndex = false, seekableFooter = true)
      val sizes = CompressedText.plannedTaskMetaBytes(spark, dir,
        splitBytes = 1) // one split per frame — worst case for tails
      assert(sizes.length > 20, s"want many splits, got ${sizes.length}")
      sizes.max
    }
    val m1 = planMax(200)
    val m2 = planMax(400)
    // a Split is (path, 2 ints, bool): well under a KB, and doubling
    // the frame count must not move it (paths differ by a few chars
    // of temp-dir suffix at most)
    assert(m1 < 512, s"split metadata too big: $m1 B")
    assert(math.abs(m2 - m1) <= 32,
      s"split metadata grew with frame count: $m1 -> $m2 B")
  }

  test("hung seek-table probe: planning completes and falls back whole-file") {
    // r17 judge finding #2: the probe await was Duration.Inf — one hung
    // object-store read blocked query planning forever. Inject a probe
    // that never returns within the budget and prove planning finishes
    // inside it, with the file degraded to the whole-file path.
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 120).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 8 * 1024,
      sidecarIndex = false, seekableFooter = true)
    spark.conf.set("spark.graft.seekableProbeTimeoutMs", "300")
    try {
      val t0 = System.nanoTime()
      val out = CompressedText.readLinesSplittableImpl(spark, dir,
        splitBytes = 1,
        probe = (_, _) => { Thread.sleep(20000); None })
      val rows = out.collect()
      val planMs = (System.nanoTime() - t0) / 1000000L
      assert(planMs < 10000, s"planning blocked ${planMs} ms")
      // fell back: one whole-file task, rows identical to readLines
      assert(rows.length == 120 && rows.forall(_.getString(3) == null))
      val direct = CompressedText.readLines(spark, dir).collect()
      assert(rows.map(r => (r.getLong(1), r.getString(2))).sorted.toSeq
        == direct.map(r => (r.getLong(1), r.getString(2))).sorted.toSeq)
      // and a healthy probe on the same data still splits (the timeout
      // only bites on hangs)
      val split = CompressedText.readLinesSplittable(spark, dir,
        splitBytes = 1)
      assert(split.rdd.getNumPartitions > 1)
      assert(split.count() == 120)
    } finally spark.conf.unset("spark.graft.seekableProbeTimeoutMs")
  }

  test("XXH64 matches the published test vectors (seekable checksums)") {
    // the seekable format's per-frame checksum is XXH64-low32 (seed 0);
    // this pins Spark's XXH64 (which the writer/reader use) to the
    // algorithm's canonical vectors, so the emitted tables interop with
    // third-party seekable-zstd tools
    def h(s: String): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBytes(UTF_8), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        s.getBytes(UTF_8).length, 0L)
    assert(h("") == 0xEF46DB3751D8E999L)
    assert(h("abc") == 0x44BC2CF5AD770999L)
  }

  test("seekable format: checksummed tables verify; a forged checksum quarantines") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 200).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 16 * 1024,
      sidecarIndex = false, seekableFooter = true) // checksums default ON
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val bytes = Files.readAllBytes(shard.toPath)
    // descriptor carries the checksum flag (12-byte entries)
    assert((bytes(bytes.length - 5) & 0x80) != 0)
    def u32le(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val n = u32le(bytes, bytes.length - 9).toInt
    assert(n >= 3)
    // clean read verifies every frame's checksum
    val rows = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    assert(rows.length == 200 && rows.forall(_.getString(3) == null))
    // forge the SECOND frame's stored checksum: the zstd data is
    // untouched (its in-frame hash still passes), so only the table
    // verification can catch the drift — exactly one quarantine row
    val tableOff = bytes.length - (8 + n * 12 + 9)
    val csOff = tableOff + 8 + 12 + 8 // entry 1's checksum field
    bytes(csOff) = (bytes(csOff) ^ 0x5a).toByte
    Files.write(shard.toPath, bytes)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val rows2 = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    val errs = rows2.filter(_.getString(3) != null)
    assert(errs.length == 1 &&
      errs.head.getString(3).contains("checksum mismatch"),
      errs.map(_.getString(3)).mkString("; "))
    assert(rows2.count(_.getString(3) == null) < 200)

    // the flag-OFF (8-byte-entry) variant some writers emit still
    // parses and splits — no checksum to verify
    val dir2 = tmpDir()
    CompressedText.writeJsonlZstdShards(df, dir2, frameBytes = 16 * 1024,
      sidecarIndex = false, seekableFooter = true,
      seekableChecksums = false)
    val shard2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val b2 = Files.readAllBytes(shard2.toPath)
    assert((b2(b2.length - 5) & 0x80) == 0)
    val rows3 = CompressedText.readLinesSplittable(spark, dir2,
      splitBytes = 1).collect()
    assert(rows3.length == 200 && rows3.forall(_.getString(3) == null))
  }

  test("foreign seekable file: byte-boundary frames reassemble lines exactly") {
    // third-party seekable-zstd writers chunk at BYTE boundaries — no
    // line alignment (r17 review: the first reader silently split
    // straddling lines into two corrupt rows). Emulate one: jsonl
    // bytes chopped every 257 bytes, each chunk its own zstd frame,
    // plus the public seek table with checksums.
    val dir = tmpDir()
    val lines = (1 to 300).map(i =>
      s"""{"id":$i,"t":"${entropyBlob(i).replace("\"", "")}"}""")
    val rawBytes = lines.mkString("", "\n", "\n").getBytes(UTF_8)
    val chunks = rawBytes.grouped(257).toSeq // mid-line cuts everywhere
    val out = new java.io.ByteArrayOutputStream()
    val entries = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    chunks.foreach { c =>
      val bo = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bo, 3)
      z.setChecksum(true); z.write(c); z.close()
      val comp = bo.toByteArray
      out.write(comp)
      val cs = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(c,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          c.length, 0L) & 0xffffffffL
      entries += ((comp.length.toLong, c.length.toLong, cs))
    }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(0x184D2A5EL); le32(entries.size.toLong * 12 + 9)
    entries.foreach { case (cl, dl, cs) => le32(cl); le32(dl); le32(cs) }
    le32(entries.size.toLong); out.write(0x80); le32(0x8F92EAB1L)
    val shard = new java.io.File(dir, "foreign.jsonl.zst")
    Files.write(shard.toPath, out.toByteArray)

    // tiny splits: one frame per split — every straddle crosses splits
    val rows = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    assert(rows.forall(_.getString(3) == null),
      rows.filter(_.getString(3) != null).mkString("; "))
    val got = rows.map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(got.map(_._2).toSeq == lines, "content must reassemble exactly")
    assert(got.map(_._1).distinct.length == lines.size)
    // fat splits agree too
    val rows2 = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 4096).collect()
    assert(rows2.map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
      .map(_._2).toSeq == lines)

    // damage one mid-file frame: its lines (and the two straddling
    // ones) drop with quarantine rows; everything else survives intact
    val bytes = Files.readAllBytes(shard.toPath)
    // mid-frame, in the compressed payload proper — the first bytes of
    // a zstd frame are header fields (magic, descriptor, window) where
    // a flip can be a semantic no-op (probed: flipping the window
    // descriptor decoded byte-identically)
    val damageOff =
      (entries.take(10).map(_._1).sum + entries(10)._1 / 2).toInt
    bytes(damageOff) = (bytes(damageOff) ^ 0x41).toByte
    Files.write(shard.toPath, bytes)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val rows3 = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    val good3 = rows3.filter(_.getString(3) == null)
      .map(r => (r.getLong(1), r.getString(2)))
    val errs3 = rows3.filter(_.getString(3) != null)
    assert(errs3.nonEmpty && errs3.length <= 3,
      errs3.map(_.getString(3)).mkString("; "))
    // every surviving line is byte-correct (no torn fragments emitted)
    val want = got.toMap
    good3.foreach { case (off, ln) =>
      assert(want.get(off).contains(ln), s"torn line at offset $off")
    }
    assert(good3.length >= lines.size - 12, s"lost ${lines.size - good3.length}")
  }

  test("foreign seekable: damaged CONTINUATION frame truncates the line loudly") {
    // exercise finish()'s read-ahead failure path: a line starting in
    // split k whose newline lives in a damaged later frame must come
    // back as a quarantine row, never a torn line
    val dir = tmpDir()
    val lines = (1 to 40).map(i => s"""{"id":$i,"v":"${"x" * 90}"}""")
    val rawBytes = lines.mkString("", "\n", "\n").getBytes(UTF_8)
    val chunks = rawBytes.grouped(331).toSeq
    val out = new java.io.ByteArrayOutputStream()
    val entries = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    chunks.foreach { c =>
      val bo = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bo, 3)
      z.setChecksum(true); z.write(c); z.close()
      out.write(bo.toByteArray)
      entries += ((bo.toByteArray.length.toLong, c.length.toLong))
    }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(0x184D2A5EL); le32(entries.size.toLong * 8 + 9)
    entries.foreach { case (cl, dl) => le32(cl); le32(dl) }
    le32(entries.size.toLong); out.write(0); le32(0x8F92EAB1L)
    val bytes = out.toByteArray
    // damage the LAST frame's payload (mid-frame, past the header)
    val lastOff = entries.dropRight(1).map(_._1).sum +
      entries.last._1 / 2
    bytes(lastOff.toInt) = (bytes(lastOff.toInt) ^ 0x2d).toByte
    val shard = new java.io.File(dir, "tailcut.jsonl.zst")
    Files.write(shard.toPath, bytes)
    val rows = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    val errs = rows.filter(_.getString(3) != null).map(_.getString(3))
    // the damaged frame's own row, plus (if a line straddled into it)
    // the owner split's truncation row
    assert(errs.exists(_.contains("quarantined")), errs.mkString("; "))
    assert(errs.length <= 2)
    if (errs.length == 2)
      assert(errs.exists(_.contains("line truncated")), errs.mkString("; "))
    // every emitted line is byte-correct
    val want = lines.toSet
    rows.filter(_.getString(3) == null).map(_.getString(2))
      .foreach(l => assert(want(l), s"torn line: $l"))
  }

  test("seekable format: frame damage quarantines one frame; junk tail falls back") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 300).map(i => (i.toLong, entropyBlob(i)))
      .toDF("id", "t").coalesce(1)
    CompressedText.writeJsonlZstdShards(df, dir, frameBytes = 24 * 1024,
      sidecarIndex = false, seekableFooter = true,
      seekableChecksums = false) // 8-byte entries: offsets below assume it
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val bytes = Files.readAllBytes(shard.toPath)
    // flip a byte inside the SECOND frame (locate via the tail table)
    def u32le(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val n = u32le(bytes, bytes.length - 9).toInt
    assert(n >= 3, s"want >=3 frames, got $n")
    val tableOff = bytes.length - (8 + n * 8 + 9)
    val f0len = u32le(bytes, tableOff + 8)
    val f1len = u32le(bytes, tableOff + 16)
    val mid = (f0len + f1len / 2).toInt
    bytes(mid) = (bytes(mid) ^ 0x55).toByte
    Files.write(shard.toPath, bytes)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val rows = CompressedText.readLinesSplittable(spark, dir,
      splitBytes = 1).collect()
    val errs = rows.filter(_.getString(3) != null)
    assert(errs.length == 1 &&
      errs.head.getString(3).contains(s"offset $f0len"),
      errs.map(_.getString(3)).mkString("; "))
    // healthy frames all survive (300 minus the damaged frame's lines)
    assert(rows.count(_.getString(3) == null) > 0)
    assert(rows.length < 300 + 2 && rows.length > n)

    // a shard whose tail is NOT a valid table (foreign junk) must fall
    // back to the whole-file path, not error at plan time
    val dir2 = tmpDir()
    CompressedText.writeJsonlZstdShards(df, dir2) // plain, no table
    val shard2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    Files.write(shard2.toPath,
      Files.readAllBytes(shard2.toPath) ++
        "JUNKJUNKJUNKJUNK".getBytes(UTF_8))
    new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    // junk tail breaks zstd streaming too: the remainder (including
    // any lines still in the codec buffer at the error point)
    // quarantines as ONE error row — the streaming path's documented
    // fail-closed posture — and plan time never crashes
    val rows2 = CompressedText.readLinesSplittable(spark, dir2).collect()
    val errs2 = rows2.filter(_.getString(3) != null)
    assert(errs2.length == 1 && errs2.head.getString(3).startsWith("codec:"),
      errs2.map(_.getString(3)).mkString("; "))
    assert(rows2.count(_.getString(2) != null) >= 290)
  }
}
