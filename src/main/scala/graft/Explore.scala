package graft

import org.apache.spark.sql.SparkSession
import graft.ext.{Dedup, Similarity}

// Temporary exploration tool (deleted before release).
object Explore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = Tables(spark, dir, "documents")
    val embs = Tables(spark, dir, "embeddings")

    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(s"RESULT $label: $r  (${math.round((System.nanoTime() - t0) / 1e8) / 10.0}s)")
    }

    for (thr <- Seq(0.5, 0.7); sh <- Seq(1, 3))
      time(s"minhash thr=$thr shingle=$sh") {
        Dedup.minhashDupPairs(docs, "text", "doc_id", threshold = thr,
          shingle = sh).count()
      }
    for (h <- Seq(3, 7))
      time(s"simhash ham<=$h") {
        Dedup.simhashDupPairs(docs, "text", "doc_id", maxHamming = h).count()
      }
    for (thr <- Seq(0.4))
      time(s"embdup thr=$thr p4 t8") {
        Dedup.embeddingDupPairs(embs, "embedding", "vec_id", threshold = thr,
          planes = 4, tables = 8).count()
      }
    for (thr <- Seq(0.1, 0.2))
      time(s"ngram thr=$thr") {
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = thr).count()
      }
    val q = embs.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    time("brute top5")(Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 5)
      .collect().mkString(", "))
    time("lsh top5")(Similarity.lshTopK(embs, "embedding", "vec_id", q, 5)
      .collect().mkString(", "))
    spark.stop()
  }
}
