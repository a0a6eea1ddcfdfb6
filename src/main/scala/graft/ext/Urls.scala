package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** URL parsing + canonicalization — the identity key for web-corpus
  * curation: a crawl sees the same page as `HTTP://Example.com/a`,
  * `http://example.com:80/a?utm_source=feed#top`, … and URL-level
  * dedup/domain mixing needs ONE canonical form. Pure string scanning
  * (no `java.net.URL` — its `equals` resolves DNS), deterministic, so
  * the DuckDB oracle pins hand-walked canonical forms.
  *
  * Canonicalization rules (the common-denominator set crawl pipelines
  * share): scheme/host lowercased, fragment dropped, default ports
  * stripped (http:80, https:443), empty path → `/`, tracking
  * parameters dropped (`utm_*`, `fbclid`, `gclid`, `ref`, `mc_cid`,
  * `mc_eid`), remaining query parameters SORTED by key then raw value
  * (byte order — no percent-decoding, which would conflate distinct
  * resources). Malformed input (no `://`, empty host) yields None and
  * the row gates out, never throws.
  */
object Urls {

  private val trackingParams = Set("fbclid", "gclid", "ref", "mc_cid",
    "mc_eid", "igshid", "spm")

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || trackingParams(key)

  /** One parsed/canonicalized URL. */
  final case class CanonUrl(scheme: String, host: String, port: Int,
      path: String, query: String, canonical: String)

  /** Parse + canonicalize; None on malformed input (see object doc).
    * `port` is −1 when absent or default. */
  def canonicalize(raw0: String): Option[CanonUrl] = {
    if (raw0 == null) return None
    val raw = raw0.trim
    val sep = raw.indexOf("://")
    if (sep <= 0) return None
    val scheme = raw.substring(0, sep).toLowerCase
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' ||
      c == '.')) return None
    var i = sep + 3
    val n = raw.length
    // authority: up to the first '/', '?', or '#'
    val authEnd = {
      var k = i
      while (k < n && raw.charAt(k) != '/' && raw.charAt(k) != '?' &&
        raw.charAt(k) != '#') k += 1
      k
    }
    var auth = raw.substring(i, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1) // strip userinfo
    if (auth.isEmpty) return None
    // host[:port], IPv6 hosts bracketed
    val (host0, portStr) =
      if (auth.startsWith("[")) {
        val close = auth.indexOf(']')
        if (close < 0) return None
        val rest = auth.substring(close + 1)
        (auth.substring(0, close + 1),
          if (rest.startsWith(":")) rest.substring(1) else "")
      } else auth.lastIndexOf(':') match {
        case -1 => (auth, "")
        case c => (auth.substring(0, c), auth.substring(c + 1))
      }
    val host = host0.toLowerCase
    if (host.isEmpty) return None
    val port =
      if (portStr.isEmpty) -1
      else if (portStr.forall(_.isDigit) && portStr.length <= 5)
        portStr.toInt
      else return None
    val defaultPort = scheme match {
      case "http" => 80
      case "https" => 443
      case _ => -2
    }
    val effPort = if (port == defaultPort) -1 else port
    // path / query / fragment
    i = authEnd
    val hashAt = raw.indexOf('#', i)
    val end = if (hashAt < 0) n else hashAt
    val qAt = {
      val q = raw.indexOf('?', i)
      if (q < 0 || q > end) -1 else q
    }
    val path0 = raw.substring(i, if (qAt < 0) end else qAt)
    val path = if (path0.isEmpty) "/" else path0
    val query0 = if (qAt < 0) "" else raw.substring(qAt + 1, end)
    val kept = query0.split('&').filter(_.nonEmpty).filterNot { p =>
      isTracking(p.indexOf('=') match {
        case -1 => p.toLowerCase
        case e => p.substring(0, e).toLowerCase
      })
    }.sorted
    val query = kept.mkString("&")
    val canonical = scheme + "://" + host +
      (if (effPort >= 0) s":$effPort" else "") + path +
      (if (query.nonEmpty) "?" + query else "")
    Some(CanonUrl(scheme, host, effPort, path, query, canonical))
  }

  /** The last two host labels — the public-suffix-list-free domain
    * approximation (documented: `co.uk`-style suffixes group one level
    * too high; a PSL column would slot in the same row). ONE statement,
    * shared by the typed op and the codegen'd expression. */
  def domainOf(host: String): String = {
    val labels = host.stripPrefix("www.").split('.')
    if (host.startsWith("[") || labels.length <= 1) host
    else labels.takeRight(2).mkString(".")
  }

  /** Codegen'd column form of [[canonicalize]]: extract one part
    * (`scheme`/`host`/`domain`/`path`/`query`/`canonical`) fused into
    * the plan — no typed deser/ser boundary
    * ([[graft.functions.UrlPartExpr]]); null on malformed input. */
  def partCol(c: Column, part: String): Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnShim
    shim.column(graft.functions.UrlPartExpr(shim.expression(c), part))
  }

  /** The canonical host, scan-fused ([[partCol]]). */
  def hostCol(c: Column): Column = partCol(c, "host")

  /** The full canonical form, scan-fused ([[partCol]]). */
  def canonicalCol(c: Column): Column = partCol(c, "canonical")

  /** One canonicalized row for the distributed op. */
  final case class UrlRow(url_id: Long, scheme: String, host: String,
      domain: String, path: String, canonical: String)

  /** Distributed canonicalization over `(url_id, url)`; malformed rows
    * drop. `domain` is the last two host labels — the
    * public-suffix-list-free approximation (documented: `co.uk`-style
    * suffixes group one level too high; a PSL column would slot in the
    * same row). */
  def canonicalized(spark: SparkSession, urls: DataFrame): Dataset[UrlRow] = {
    import spark.implicits._
    urls.select(col("url_id"), col("url"))
      .as[(Long, String)]
      .flatMap { case (id, u) =>
        canonicalize(u).map { c =>
          UrlRow(id, c.scheme, c.host, domainOf(c.host), c.path,
            c.canonical)
        }
      }
  }
}
