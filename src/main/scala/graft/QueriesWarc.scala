package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.WarcFixtures
import graft.sources.Warc

/** WARC/WET ingestion queries: the crawl-archive source tier
  * ([[graft.sources.Warc]]) proven against the DuckDB oracle — the WET
  * fixture is DERIVED from `documents.parquet` by [[WarcFixtures]]
  * (every framing byte assembled in plain code), so the oracle can state
  * the expected parse output straight from the same table. Both read
  * paths (streaming per-file over per-record-gzip members; splittable
  * uncompressed text) must land on the identical answer.
  */
object QueriesWarc {

  /** One WET fixture per sf dir per JVM: (gz shard dir, plain shard
    * dir). Shard counts differ so the two paths cannot accidentally
    * share a layout. */
  private val fixtures =
    scala.collection.concurrent.TrieMap[String, (String, String)]()

  private def fixture(s: SparkSession, dir: String): (String, String) =
    fixtures.getOrElseUpdate(dir, {
      val base = java.nio.file.Files
        .createTempDirectory("graft_wet_").toString
      WarcFixtures.writeWetShards(s, dir, s"$base/gz", shards = 4,
        gzip = true)
      WarcFixtures.writeWetShards(s, dir, s"$base/plain", shards = 2,
        gzip = false)
      (s"$base/gz", s"$base/plain")
    })

  /** doc_id back out of the fixture URL (`.../docs/<id>?...`). */
  private def docId = regexp_extract(col("url"), "/docs/(\\d+)\\?", 1)
    .cast("long").as("doc_id")

  private val wetOracle =
    """SELECT doc_id,
      |  'https://' || source || '.example.org/docs/' || doc_id ||
      |    '?utm_source=fixture&v=1' AS url,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS text_md5
      |FROM documents""".stripMargin

  def all: Seq[QueryCase] = Seq(

    // Streaming per-file path over CONCATENATED PER-RECORD GZIP members
    // (the Common Crawl layout): 4 shard files, each led by a warcinfo
    // record the document view must drop. Every payload byte round-trips
    // (md5); n_bytes is the record's Content-Length, which the oracle
    // recomputes as the text's UTF-8 byte length.
    QueryCase("q_warc_wet",
      (s, dir) => {
        val (gzDir, _) = fixture(s, dir)
        Warc.readWet(s, gzDir)
          .select(docId, col("url"), col("n_bytes"),
            md5(col("text").cast("binary")).as("text_md5"))
      },
      Some(wetOracle)),

    // Splittable uncompressed path: Hadoop record-delimiter splits, so
    // ONE fat .wet file fans out across tasks. Must agree byte-for-byte
    // with the oracle (and therefore with the streaming path above).
    QueryCase("q_warc_wet_splittable",
      (s, dir) => {
        val (_, plainDir) = fixture(s, dir)
        Warc.readWetSplittable(s, s"$plainDir/*.warc.wet")
          .filter(col("error").isNull)
          .select(docId, col("url"), col("n_bytes"),
            md5(col("text").cast("binary")).as("text_md5"))
      },
      Some(wetOracle)),

    // WARC → curation chain: canonicalize the crawl URLs (tracking
    // params stripped by Urls.canonicalize) and size each host's slice
    // of the corpus — the first report a crawl ingest produces. The
    // n_bytes sum rides the join from the WET record's Content-Length.
    QueryCase("q_warc_hosts",
      (s, dir) => {
        val (gzDir, _) = fixture(s, dir)
        val wet = Warc.readWet(s, gzDir)
          .select(docId, col("url"), col("n_bytes"))
        val canon = graft.ext.Urls.canonicalized(s,
          wet.select(col("doc_id").as("url_id"), col("url"))).toDF()
        wet.join(canon.select(col("url_id").as("doc_id"), col("host")),
            Seq("doc_id"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("n_bytes"))
      },
      Some("""SELECT source || '.example.org' AS host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY source""".stripMargin))
  )
}
