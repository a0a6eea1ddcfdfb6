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

  /** One crawl fixture per sf dir per JVM: WET as per-record-gzip
    * shards and as plain text shards (different shard counts so the
    * two paths cannot accidentally share a layout), plus raw-crawl
    * `response` shards (HTTP + HTML payloads). */
  private[graft] final case class Fixture(gz: String, plain: String,
      responses: String)

  private val fixtures =
    scala.collection.concurrent.TrieMap[String, Fixture]()

  private[graft] def fixture(s: SparkSession, dir: String): Fixture =
    fixtures.getOrElseUpdate(dir, {
      val base = java.nio.file.Files
        .createTempDirectory("graft_wet_").toString
      WarcFixtures.writeWetShards(s, dir, s"$base/gz", shards = 4,
        gzip = true)
      WarcFixtures.writeWetShards(s, dir, s"$base/plain", shards = 2,
        gzip = false)
      WarcFixtures.writeResponseShards(s, dir, s"$base/responses",
        shards = 3)
      Fixture(s"$base/gz", s"$base/plain", s"$base/responses")
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
        Warc.readWet(s, fixture(s, dir).gz)
          .select(docId, col("url"), col("n_bytes"),
            md5(col("text").cast("binary")).as("text_md5"))
      },
      Some(wetOracle)),

    // Splittable uncompressed path: Hadoop record-delimiter splits, so
    // ONE fat .wet file fans out across tasks. Must agree byte-for-byte
    // with the oracle (and therefore with the streaming path above).
    QueryCase("q_warc_wet_splittable",
      (s, dir) => {
        Warc.readWetSplittable(s,
            s"${fixture(s, dir).plain}/*.warc.wet")
          .filter(col("error").isNull)
          .select(docId, col("url"), col("n_bytes"),
            md5(col("text").cast("binary")).as("text_md5"))
      },
      Some(wetOracle)),

    // WARC → curation chain: canonicalize the crawl URLs (tracking
    // params stripped by Urls.canonicalize) and size each host's slice
    // of the corpus — the first report a crawl ingest produces. ONE
    // pass: the canonical host rides the parse in the same flatMap
    // (an earlier shape joined two branches that each re-parsed the
    // archives — two full crawl parses just to pair host with bytes),
    // so the only exchange is the per-host aggregation's.
    QueryCase("q_warc_hosts",
      (s, dir) => {
        import s.implicits._
        Warc.readWet(s, fixture(s, dir).gz)
          .select(col("url"), col("n_bytes")).as[(String, Long)]
          .flatMap { case (u, n) =>
            graft.ext.Urls.canonicalize(u).map(c => (c.host, n))
          }
          .toDF("host", "n_bytes")
          .groupBy("host")
          .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("n_bytes"))
      },
      Some("""SELECT source || '.example.org' AS host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY source""".stripMargin)),

    // Raw-crawl path: `response` records carry full HTTP/1.1 messages.
    // Status / Content-Type / entity body split off with built-in
    // expressions (codegen'd, Warc.Http), then the HTML extractor
    // recovers the document text from the page furniture in the same
    // pass (one scan, no shuffle until nothing — kernel map only). The
    // oracle restates the page's expected extraction
    // (WarcFixtures.htmlExtractedText) from the documents table.
    QueryCase("q_warc_html",
      (s, dir) => {
        import s.implicits._
        val parsed = Warc.readRecords(s, fixture(s, dir).responses)
          .filter(col("error").isNull && col("warc_type") === "response")
          .select(
            regexp_extract(col("target_uri"), "/docs/(\\d+)\\?", 1)
              .cast("long").as("doc_id"),
            Warc.Http.status(col("payload")).as("status"),
            Warc.Http.header(col("payload"), "Content-Type").as("mime"),
            Warc.Http.body(col("payload")).as("html"))
          .filter(col("status").isNotNull && col("html").isNotNull)
        parsed.as[(Long, Int, String, String)]
          .map { case (id, st, mime, html) =>
            (id, st, mime, graft.ext.Html.extractText(html))
          }
          .toDF("doc_id", "status", "mime", "text")
          .select(col("doc_id"), col("status"), col("mime"),
            md5(col("text").cast("binary")).as("text_md5"))
      },
      Some("""SELECT doc_id, CAST(200 AS INTEGER) AS status,
        |  'text/html; charset=UTF-8' AS mime,
        |  md5('Doc ' || doc_id || chr(10) || 'site nav boilerplate' ||
        |      chr(10) || 'Doc ' || doc_id || chr(10) || text) AS text_md5
        |FROM documents""".stripMargin)),

    // .jsonl.zst round trip — the open-corpus publish format Spark's
    // Hadoop layer can't decode without native libs: the documents
    // table exports as zstd shards (distributed writer, one partition
    // = one shard) and reads back through the streaming pure-JVM
    // decoder; every field must survive byte-exact.
    QueryCase("q_jsonl_zst",
      (s, dir) => {
        val out = zstFixture(s, dir)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType)))
        val (good, _) = graft.sources.CompressedText.readJsonl(s, schema, out)
        good.select(col("doc_id"), col("source"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
      },
      Some("""SELECT doc_id, source, n_chars, md5(text) AS text_md5
        |FROM documents""".stripMargin))
  )

  /** Export-once cache for the zstd fixture (3 shards per sf dir). */
  private val zstFixtures =
    scala.collection.concurrent.TrieMap[String, String]()

  private def zstFixture(s: SparkSession, dir: String): String =
    zstFixtures.getOrElseUpdate(dir, {
      val out = java.nio.file.Files
        .createTempDirectory("graft_zst_").toString
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text", "n_chars")
        .repartitionByRange(3, col("doc_id"))
      graft.sources.CompressedText.writeJsonlZstdShards(docs, out)
      out
    })
}
