package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the boilerplate-stripping step every
  * web-scraped training corpus runs before quality scoring and dedup
  * (the reference pipeline ingests clean review text; a real 100 TB
  * crawl does not). Pure JVM single-pass character scanner, no regex
  * backtracking on adversarial input:
  *
  *   - `<script>`/`<style>` elements skipped to their case-insensitive
  *     closing tag (their payload is code, not text);
  *   - comments `<!-- … -->` skipped;
  *   - block-level tags (p, div, li, headings, rows, …) become line
  *     breaks, inline tags vanish;
  *   - the common named entities and numeric `&#NN;`/`&#xHH;` forms
  *     decode (a decoded `<` is literal text, never re-parsed);
  *   - whitespace normalizes per line (runs → one space, lines
  *     trimmed, empty lines dropped, NBSP is whitespace).
  *
  * The result feeds [[TextStats]] scoring / [[Dedup]] exactly like any
  * other document text. Deterministic by construction, so the DuckDB
  * oracle pins hand-walked extractions.
  */
object Html {

  private val blockTags = Set("p", "div", "br", "li", "ul", "ol", "h1",
    "h2", "h3", "h4", "h5", "h6", "tr", "table", "blockquote", "pre",
    "section", "article", "header", "footer", "title", "hr", "td",
    "th", "dt", "dd", "form", "nav", "aside", "main", "figure",
    "figcaption", "address")

  /** Column form of [[extractText]], codegen'd
    * ([[graft.functions.HtmlTextExpr]]) — rides the scan projection,
    * no typed deser/ser boundary. */
  def textCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnShim
    shim.column(graft.functions.HtmlTextExpr(shim.expression(c)))
  }

  /** Extract readable text from an HTML string (see object doc). */
  def extractText(html: String): String = {
    val sb = new StringBuilder
    val n = html.length
    var i = 0
    def matchesAt(s: String, pos: Int): Boolean =
      html.regionMatches(true, pos, s, 0, s.length)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matchesAt("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(ns, j).toLowerCase
          var k = j
          while (k < n && html.charAt(k) != '>') k += 1
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            val close = "</" + name
            var e = tagEnd
            while (e < n && !matchesAt(close, e)) e += 1
            if (e >= n) i = n
            else {
              var k2 = e
              while (k2 < n && html.charAt(k2) != '>') k2 += 1
              i = if (k2 < n) k2 + 1 else n
            }
          } else {
            if (blockTags(name)) sb.append('\n')
            i = tagEnd
          }
        }
      } else if (c == '&') {
        val e = html.indexOf(';', i + 1)
        val dec: String =
          if (e > i && e - i <= 10) {
            val ent = html.substring(i + 1, e)
            ent.toLowerCase match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case x if x.startsWith("#x") && x.length > 2 =>
                try Character.toChars(Integer.parseInt(x.substring(2), 16))
                  .mkString
                catch { case _: Exception => null }
              case x if x.startsWith("#") && x.length > 1 =>
                try Character.toChars(Integer.parseInt(x.substring(1)))
                  .mkString
                catch { case _: Exception => null }
              case _ => null
            }
          } else null
        if (dec != null) { sb.append(dec); i = e + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString.split('\n')
      .map(_.replaceAll("[\\s\\u00A0]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** One extracted-document row. */
  final case class ExtractedDoc(doc_id: Long, text: String,
      n_lines: Long, n_chars: Long)

  /** Distributed extraction over `(doc_id, html)` — the same
    * per-partition CPU-kernel shape as the codec tier (scan-fused
    * map, no shuffle). */
  def extract(spark: SparkSession, docs: DataFrame): Dataset[ExtractedDoc] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("html"))
      .as[(Long, String)]
      .map { case (id, html) =>
        val t = extractText(if (html == null) "" else html)
        val lines = if (t.isEmpty) 0L else t.count(_ == '\n') + 1L
        ExtractedDoc(id, t, lines, t.length.toLong)
      }
  }
}
