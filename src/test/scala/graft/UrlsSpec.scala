package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Urls

class UrlsSpec extends AnyFunSuite with SparkTestSupport {

  private def canon(u: String): String =
    Urls.canonicalize(u).map(_.canonical).getOrElse("<none>")

  test("canonicalize: folding, ports, params, fragments, userinfo") {
    assert(canon("HTTP://WWW.Example.COM/Path") ==
      "http://www.example.com/Path") // path case is significant
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("https://example.com:443/") == "https://example.com/")
    assert(canon("https://example.com:8443/") == "https://example.com:8443/")
    assert(canon("http://example.com") == "http://example.com/")
    assert(canon("http://example.com/a?z=1&a=2&m=3") ==
      "http://example.com/a?a=2&m=3&z=1")
    assert(canon("http://example.com/a?utm_source=x&utm_medium=y") ==
      "http://example.com/a")
    assert(canon("http://example.com/a#section") == "http://example.com/a")
    assert(canon("http://alice@example.com/a") == "http://example.com/a")
    // IPv6 authority with a port
    assert(canon("http://[2001:db8::1]:8080/x") ==
      "http://[2001:db8::1]:8080/x")
    assert(canon("http://[2001:db8::1]/x") == "http://[2001:db8::1]/x")
    // duplicate keys keep both, sorted stably by the raw pair
    assert(canon("http://e.com/?b=2&b=1") == "http://e.com/?b=1&b=2")
    // malformed inputs gate out, never throw
    for (bad <- Seq(null, "", "no scheme", "://nohost", "http://",
        "http://:80/x", "http://host:notaport/", "ht tp://x.com/",
        "http://[::1/x"))
      assert(Urls.canonicalize(bad).isEmpty, s"expected None for '$bad'")
  }

  test("canonicalized: URL-level dedup groups crawl variants") {
    val s = spark
    import s.implicits._
    val variants = Seq(
      1L -> "http://Example.com/a",
      2L -> "http://example.com:80/a?utm_source=rss",
      3L -> "http://example.com/a#top",
      4L -> "http://example.com/b",
      5L -> "junk")
    val rows = Urls.canonicalized(s,
      variants.toDF("url_id", "url")).collect()
    assert(rows.length == 4)
    val byCanon = rows.groupBy(_.canonical)
    assert(byCanon("http://example.com/a").map(_.url_id).toSet ==
      Set(1L, 2L, 3L)) // three crawl spellings, one identity
    assert(byCanon("http://example.com/b").length == 1)
    assert(rows.forall(_.domain == "example.com"))
  }

  test("UrlPartExpr: every part bit-identical to canonicalize, incl. malformed") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "HTTP://User:pw@Example.com:80/a/b?z=1&utm_source=x&a=2#frag",
      "https://sub.www.Example.co.uk:8443/path",
      "http://[2001:db8::1]:8080/v6?q=x",
      "https://example.org", // empty path → /
      "ftp://files.example.net/pub",
      "junk-no-scheme", "://nohost", null)
    val parts = graft.functions.UrlPartExpr.codeOf.keys.toSeq.sorted
    val df = urls.toDF("url")
    val got = df.select(col("url") +:
        parts.map(p => graft.ext.Urls.partCol(col("url"), p).as(p)): _*)
      .collect()
    for (r <- got) {
      val expect = Option(r.getAs[String]("url"))
        .flatMap(graft.ext.Urls.canonicalize)
      parts.foreach { p =>
        val want = expect.map { c =>
          p match {
            case "scheme" => c.scheme
            case "host" => c.host
            case "domain" => graft.ext.Urls.domainOf(c.host)
            case "path" => c.path
            case "query" => if (c.query.isEmpty) null else c.query
            case _ => c.canonical
          }
        }.orNull
        assert(r.getAs[String](p) == want,
          s"part $p of ${r.getAs[String]("url")}")
      }
    }
    // sanity on the non-trivial row (tracking params stripped, sorted;
    // default port dropped; userinfo + fragment gone)
    val first = got.head
    assert(first.getAs[String]("canonical")
      == "http://example.com/a/b?a=2&z=1")
    assert(first.getAs[String]("domain") == "example.com")
  }

  test("r16 functions are SQL-callable via the registry builders") {
    // the FunctionRegistry builders are a separate code path from the
    // Column helpers (UrlPartExpr's builder folds its part literal at
    // build time) — exercise all three through spark.sql
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_url_part('HTTP://Example.com:80/a?utm_source=x&b=1', 'canonical') AS canon,
        |  graft_url_part('junk', 'host') AS bad,
        |  cast(graft_http_body_bytes(
        |    cast(concat('HTTP/1.1 200 OK\r\n\r\n', 'BODY') as binary))
        |    as string) AS body,
        |  graft_html_text('<p>a</p><script>no</script><p>b</p>') AS txt
        |""".stripMargin).collect().head
    assert(r.getAs[String]("canon") == "http://example.com/a?b=1")
    assert(r.getAs[String]("bad") == null)
    assert(r.getAs[String]("body") == "BODY")
    assert(r.getAs[String]("txt") == "a\nb")
  }
}
