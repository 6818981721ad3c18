package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first pass of every web-crawl training
  * pipeline (boilerplate removal in the trafilatura/jusText family),
  * here as a deterministic executor-side kernel over an HTML column.
  *
  * Semantics (all deterministic, no heuristics with hidden state):
  *   - only the <body> subtree is visible text (head/title/meta dropped);
  *   - <script>/<style> subtrees are skipped wholesale, including any
  *     '<' or quote characters inside them;
  *   - <!-- comments --> are skipped;
  *   - boilerplate ELEMENTS (<nav>/<header>/<footer>/<aside>) are
  *     removed with their whole subtree (same-name nesting counted) for
  *     the clean text, but still counted for the page-level metrics —
  *     link density is a property of the page, not of the retained text;
  *   - every remaining tag becomes a single space (block elements never
  *     concatenate words), entities decode (named amp/lt/gt/quot/apos/
  *     nbsp/copy + numeric decimal/hex; unknown entities stay literal —
  *     real crawls contain bare '&'), and whitespace collapses to
  *     single spaces, trimmed.
  *
  * Metrics (the jusText/readability-style signals a quality gate feeds
  * on): n_links and the collapsed character count inside <a> subtrees,
  * total visible characters, and tag count — link_density =
  * link_chars / visible_chars marks navigation-heavy pages.
  *
  * Scale shape: one narrow mapPartitions pass, one bounded output row
  * per document; the HTML bytes never shuffle — exactly the media-decode
  * discipline of the image/audio paths.
  */
object HtmlText {

  final case class HtmlRow(doc_id: Long, html: String)
  final case class ExtractedRow(
      doc_id: Long, clean_text: String, n_links: Int, link_chars: Int,
      visible_chars: Int, tag_count: Int)

  private val BoilerTags = Set("nav", "header", "footer", "aside")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Collapse whitespace runs to single spaces and trim. */
  private def collapse(s: CharSequence): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (out.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Decode one entity starting at `i` (which points at '&'). Returns
    * (decoded char or -1 if not a recognized entity, index after the
    * consumed span). Unknown/unterminated entities are left literal.
    */
  private def entity(s: String, i: Int): (Int, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return (-1, i + 1)
    val name = s.substring(i + 1, semi)
    val c: Int = name match {
      case "amp" => '&'
      case "lt" => '<'
      case "gt" => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case "copy" => 0xa9
      case _ =>
        if (name.length > 1 && name.charAt(0) == '#') {
          val digits = name.substring(1)
          try {
            val v =
              if (digits.length > 1 && (digits.charAt(0) == 'x' || digits.charAt(0) == 'X'))
                Integer.parseInt(digits.substring(1), 16)
              else Integer.parseInt(digits)
            if (v >= 0 && v <= 0x10ffff) v else -1
          } catch { case _: NumberFormatException => -1 }
        } else -1
    }
    if (c < 0) (-1, i + 1) else (c, semi + 1)
  }

  /** Advance past a tag starting at `i` ('<'), honoring quoted attribute
    * values (a '>' inside quotes does not close the tag). Returns the
    * index after '>'; fails loudly on an unterminated tag.
    */
  private def tagEnd(s: String, i: Int): Int = {
    var p = i + 1
    var quote: Char = 0
    while (p < s.length) {
      val c = s.charAt(p)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return p + 1
      p += 1
    }
    fail(s"HTML: unterminated tag at offset $i")
  }

  /** Lower-cased element name of the tag at `i`, with its closing flag. */
  private def tagName(s: String, i: Int, end: Int): (String, Boolean) = {
    var p = i + 1
    val closing = p < end && s.charAt(p) == '/'
    if (closing) p += 1
    val start = p
    while (p < end - 1 && {
      val c = s.charAt(p)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-'
    }) p += 1
    (s.substring(start, p).toLowerCase(java.util.Locale.ROOT), closing)
  }

  /** Skip from the start of an element's content to just past its
    * matching close tag, counting same-name nesting; script/style take
    * the raw-text route (no nesting, content is opaque).
    */
  private def skipElement(s: String, from: Int, name: String): Int = {
    if (name == "script" || name == "style") {
      // scan forward case-insensitively in place — lowercasing the whole
      // document here would be O(n·m) time and allocation on
      // script-heavy pages (real crawl pages carry dozens of scripts)
      val needle = s"</$name"
      var close = s.indexOf('<', from)
      while (close >= 0 && !s.regionMatches(true, close, needle, 0, needle.length))
        close = s.indexOf('<', close + 1)
      if (close < 0) fail(s"HTML: unterminated <$name>")
      return tagEnd(s, close)
    }
    var depth = 1
    var p = from
    while (p < s.length) {
      val lt = s.indexOf('<', p)
      if (lt < 0) fail(s"HTML: unterminated <$name>")
      if (s.startsWith("<!--", lt)) {
        val end = s.indexOf("-->", lt + 4)
        if (end < 0) fail("HTML: unterminated comment")
        p = end + 3
      } else {
        val end = tagEnd(s, lt)
        val (n, closing) = tagName(s, lt, end)
        if (n == name) {
          if (closing) { depth -= 1; if (depth == 0) return end }
          else if (s.charAt(end - 2) != '/') depth += 1
        }
        p = end
      }
    }
    fail(s"HTML: unterminated <$name>")
  }

  /** One pass over a body substring: visible text (entity-decoded, tags
    * as separators), link text/count, tag count. `dropBoiler` removes
    * nav/header/footer/aside subtrees from the text AND the counters —
    * pass false for page-level metrics, true for the clean text.
    */
  private def scan(body: String, dropBoiler: Boolean): ExtractedRow = {
    val text = new java.lang.StringBuilder(body.length)
    val linkText = new java.lang.StringBuilder()
    var nLinks = 0
    var tags = 0
    var linkDepth = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '<') {
        if (body.startsWith("<!--", i)) {
          val end = body.indexOf("-->", i + 4)
          if (end < 0) fail("HTML: unterminated comment")
          i = end + 3
        } else {
          val end = tagEnd(body, i)
          val (name, closing) = tagName(body, i, end)
          tags += 1
          text.append(' ')
          if (linkDepth > 0) linkText.append(' ')
          if (!closing && (name == "script" || name == "style")) {
            i = skipElement(body, end, name)
          } else if (!closing && dropBoiler && BoilerTags.contains(name) &&
              body.charAt(end - 2) != '/') {
            i = skipElement(body, end, name)
          } else {
            if (name == "a") {
              if (!closing) { nLinks += 1; linkDepth += 1 }
              else if (linkDepth > 0) linkDepth -= 1
            }
            i = end
          }
        }
      } else if (c == '&') {
        val (dec, next) = entity(body, i)
        if (dec >= 0) {
          text.appendCodePoint(dec)
          if (linkDepth > 0) linkText.appendCodePoint(dec)
        } else {
          text.append('&')
          if (linkDepth > 0) linkText.append('&')
        }
        i = next
      } else {
        text.append(c)
        if (linkDepth > 0) linkText.append(c)
        i += 1
      }
    }
    val visible = collapse(text)
    ExtractedRow(0L, visible, nLinks, collapse(linkText).length,
      visible.length, tags)
  }

  /** Extract one HTML document. Clean text comes from the
    * boilerplate-removed pass; metrics from the full-body pass.
    */
  def extract(html: String): ExtractedRow = {
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val bodyOpen = lower.indexOf("<body")
    val body =
      if (bodyOpen < 0) html
      else {
        val start = tagEnd(html, bodyOpen)
        val bodyClose = lower.indexOf("</body", start)
        if (bodyClose < 0) fail("HTML: <body> without </body>")
        html.substring(start, bodyClose)
      }
    val metrics = scan(body, dropBoiler = false)
    val clean = scan(body, dropBoiler = true)
    ExtractedRow(0L, clean.clean_text, metrics.n_links, metrics.link_chars,
      metrics.visible_chars, metrics.tag_count)
  }

  /** Dataset face: HTML column in, extracted text + page metrics out. */
  def extractAll(docs: Dataset[HtmlRow]): Dataset[ExtractedRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.map { d =>
      extract(d.html).copy(doc_id = d.doc_id)
    })
  }

  /** Deterministic HTML fixture corpus over the documents table: each
    * doc's text is wrapped in a real page — head with title/style/script
    * (script body contains '<', quotes and a literal "</p>"), a nav with
    * 2 links (3rd word entity-escaped), odd ids an extra 2-link pager
    * nav, the text as the main <div><p> content with every (i%7==3)-rd
    * word's first letter numeric-entity-escaped and messy whitespace
    * joints, and a footer with &copy;. The extractor must drop the
    * head/nav/footer wholesale, decode the entities, and collapse the
    * whitespace to reproduce the ORIGINAL text exactly — which is what
    * lets the DuckDB oracle replay the whole extraction as
    * `text AS clean_text` plus length arithmetic.
    */
  def documentsAsHtml(docs: DataFrame): Dataset[HtmlRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val words = text.split(' ')
        val mangled = new StringBuilder()
        var i = 0
        while (i < words.length) {
          if (i > 0) mangled.append(
            if (i % 5 == 0) "\n   " else if (i % 3 == 0) "  " else " ")
          val w = words(i)
          if (i % 7 == 3 && w.nonEmpty)
            mangled.append("&#").append(w.charAt(0).toInt).append(';')
              .append(w.substring(1))
          else mangled.append(w)
          i += 1
        }
        val pager =
          if (id % 2 == 1)
            "<nav class=\"pager\"><a href=\"/prev\">Prev</a> <a href=\"/next\">Next</a></nav>\n"
          else ""
        val html =
          s"""<!DOCTYPE html>
             |<html><head><title>Doc $id</title>
             |<style>body { color: #333; } /* < not a tag */</style>
             |<script type="text/javascript">var x = 1 < 2 && "</p>";</script>
             |</head>
             |<body>
             |<nav><a href="/">Home</a> <a href="/about">About &amp; Contact</a></nav>
             |$pager<!-- content -->
             |<div id="main"><p>$mangled</p></div>
             |<footer>&copy; 2026 Example Corp</footer>
             |</body></html>""".stripMargin
        HtmlRow(id, html)
      })
  }
}
