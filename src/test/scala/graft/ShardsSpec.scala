package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Shards, Shuffling}

class ShardsSpec extends AnyFunSuite with SparkTestSupport {

  test("write lays out one sorted directory per shard; round-trip preserves order") {
    val s = spark
    import s.implicits._
    val docs = (0 until 100).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val positioned = Shuffling.deterministicShuffle(docs, "doc_id", "e0", 4)
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val nShards = Shards.write(positioned, "pos", docsPerShard = 32L, out)
    assert(nShards == 4) // ceil(100/32)

    // layout: one directory per shard
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    // round-trip: shard/pos reconstruct the exact permutation, shard
    // boundaries at multiples of 32
    val back = spark.read.parquet(out)
    assert(back.count() == 100)
    // partition-column directory names read back as INT
    val rows = back.select(col("shard").cast("long"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (sh, p) => p / 32 == sh })
    assert(rows.map(_._2).sorted.toSeq == (0L until 100L))
  }

  test("manifest fingerprint is order-independent but tamper-sensitive") {
    val s = spark
    import s.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    def man(d: org.apache.spark.sql.DataFrame) = Shards.manifest(
        Shards.assign(Shuffling.deterministicShuffle(d, "doc_id", "e0", 4),
          "pos", docsPerShard = 16L), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val base = man(docs)
    assert(base.keySet == Set(0L, 1L, 2L))
    // reordering input rows: identical manifest (xor is commutative)
    assert(man(docs.orderBy(col("doc_id").desc)) == base)
    // altering one row's text flips exactly its shard's fingerprint
    val tampered = man(docs.withColumn("text",
      when(col("doc_id") === 7L, lit("doc 7 TAMPERED"))
        .otherwise(col("text"))))
    assert(tampered.count { case (k, v) => base(k) != v } == 1)
  }
}
