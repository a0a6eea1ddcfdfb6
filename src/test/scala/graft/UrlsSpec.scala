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
}
