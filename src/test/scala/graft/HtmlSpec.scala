package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Html

class HtmlSpec extends AnyFunSuite with SparkTestSupport {

  test("extractText: blocks, entities, script/style/comments, whitespace") {
    assert(Html.extractText("<p>a</p><p>b</p>") == "a\nb")
    assert(Html.extractText("inline <b>bold</b> text") == "inline bold text")
    assert(Html.extractText("x &amp;&lt;&gt;&quot;&apos;&nbsp;y") ==
      "x &<>\"' y")
    assert(Html.extractText("&#72;&#x69;!") == "Hi!")
    assert(Html.extractText("<script>while(1<2){}</script>after") == "after")
    assert(Html.extractText("<style>a>b{}</style>kept") == "kept")
    assert(Html.extractText("a<!-- <p>gone</p> -->b") == "ab")
    // a DECODED '<' is literal text, never re-parsed as a tag
    assert(Html.extractText("&lt;script&gt;alert()&lt;/script&gt;") ==
      "<script>alert()</script>")
    // NBSP entities and runs collapse like whitespace
    assert(Html.extractText("a&nbsp;&nbsp;b   c\t\td") == "a b c d")
    // attributes vanish with their tag; line structure from blocks
    assert(Html.extractText(
      "<div class=\"x\" data-y='1'>top</div><span>in</span>") == "top\nin")
  }

  test("extractText never throws on malformed input") {
    // unclosed constructs, bare ampersands, stray angle brackets
    for (s <- Seq("", "<", "<p", "<p>unclosed", "<script>never closed",
        "<!-- open comment", "&", "&amp", "&#xZZ; &#; &toolongentity12;",
        "a < b and a > b", "</>", "<>", "<123>"))
      Html.extractText(s) // must not throw
    assert(Html.extractText("<script>never closed") == "")
    assert(Html.extractText("&#xZZ; &#; &notreal;") == "&#xZZ; &#; &notreal;")
    // fuzz: random strings through the scanner
    val rnd = new scala.util.Random(41)
    val alphabet = "<>&;/ab -!#x\"'="
    for (_ <- 0 until 300) {
      val s = Seq.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      Html.extractText(s)
    }
  }

  test("extract: distributed rows with line/char counts; null html") {
    val s = spark
    import s.implicits._
    val got = Html.extract(s, Seq(
        (1L, "<p>one</p><p>two</p>"),
        (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).text == "one\ntwo" && got(1L).n_lines == 2 &&
      got(1L).n_chars == 7)
    assert(got(2L).text == "" && got(2L).n_lines == 0)
  }

  test("textCol (codegen'd expression) is bit-identical to extractText") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val htmls = Seq(
      "<html><head><title>T</title><style>x{}</style></head>" +
        "<body><nav>nav</nav><h1>H</h1><p>body &amp; more</p>" +
        "<script>var x='<p>no</p>';</script></body></html>",
      "<p>unclosed <b>bold",
      "plain text, no tags at all",
      "<!-- only a comment -->",
      "", null)
    val got = htmls.toDF("html")
      .select(col("html"), graft.ext.Html.textCol(col("html")).as("t"))
      .collect()
    got.foreach { r =>
      val h = r.getAs[String]("html")
      val want = if (h == null) null else graft.ext.Html.extractText(h)
      assert(r.getAs[String]("t") == want, s"html=$h")
    }
  }
}
