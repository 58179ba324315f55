package graft.expr

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.unsafe.types.UTF8String

/**
 * Static kernels for the Common-Crawl-style web-page surface
 * (BASELINE.json input_hint: pages table `(url, warc_ts, html:binary,
 * text, lang)`; per-row invariant: byte-identical extracted text per
 * url). Shared by interpreted eval and generated code, like
 * [[GeoEval]].
 *
 * [[extractText]] is the engine-side HTML → text extraction:
 *  - `<script>`/`<style>`/`<head>` elements are dropped with their
 *    content (head = title/meta/links, non-content),
 *  - comments (`<!-- -->`) and the doctype are dropped,
 *  - every other tag is replaced by a single space (quote-aware tag
 *    scan, so `<a title="x>y">` is one tag),
 *  - character entities are decoded AFTER tag stripping (named:
 *    amp/lt/gt/quot/apos/nbsp; numeric decimal `&#NN;` and hex
 *    `&#xHH;`),
 *  - whitespace runs collapse to one space and the result is trimmed
 *    (the whitespace-normal form; HTML rendering collapses whitespace
 *    the same way).
 *
 * The deterministic test fixture [[wrapHtml]] produces a page whose
 * extraction is byte-identical to the input text whenever the text is
 * already whitespace-normal (single spaces, no leading/trailing
 * whitespace) — the per-row invariant the driver's oracle checks via
 * sha256.
 */
object WebEval {

  // ---------------------------------------------------------------
  // extraction
  // ---------------------------------------------------------------

  def extractUtf8(html: Array[Byte]): UTF8String =
    UTF8String.fromString(extractText(new String(html, UTF_8)))

  def extractText(html: String): String =
    collapseWhitespace(decodeEntities(stripTags(html)))

  /** True when `s` starts with `tag` (ASCII case-insensitive) at
    * `i` and the match ends the tag name (whitespace, '>', '/'). */
  private def tagAt(s: String, i: Int, tag: String): Boolean = {
    if (i + tag.length > s.length) return false
    var k = 0
    while (k < tag.length) {
      val a = Character.toLowerCase(s.charAt(i + k))
      if (a != tag.charAt(k)) return false
      k += 1
    }
    val j = i + tag.length
    j >= s.length || s.charAt(j) == '>' || s.charAt(j) == '/' ||
      Character.isWhitespace(s.charAt(j))
  }

  /** Index just past the '>' of the tag starting at `i` (which must
    * point at '<'); quote-aware so '>' inside attribute values does
    * not end the tag. Unterminated tag swallows to end of input. */
  private def tagEnd(s: String, i: Int): Int = {
    var j = i + 1
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    s.length
  }

  /** Case-insensitive indexOf for a lowercase needle. */
  private def indexOfIgnoreCase(s: String, needle: String,
                                from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      var k = 0
      while (k < needle.length &&
        Character.toLowerCase(s.charAt(i + k)) == needle.charAt(k)) k += 1
      if (k == needle.length) return i
      i += 1
    }
    -1
  }

  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagAt(s, i, "<script")) {
          val e = indexOfIgnoreCase(s, "</script", i + 7)
          i = if (e < 0) n else tagEnd(s, e)
        } else if (tagAt(s, i, "<style")) {
          val e = indexOfIgnoreCase(s, "</style", i + 6)
          i = if (e < 0) n else tagEnd(s, e)
        } else if (tagAt(s, i, "<head")) {
          // the whole head element is non-content (title/meta/links)
          val e = indexOfIgnoreCase(s, "</head", i + 5)
          i = if (e < 0) n else tagEnd(s, e)
        } else {
          i = tagEnd(s, i)
        }
        sb.append(' ')
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // entities are short; a distant ';' means a bare '&'
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Int = body match {
            case "amp"  => '&'
            case "lt"   => '<'
            case "gt"   => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case b if b.length > 1 && b.charAt(0) == '#' =>
              try {
                if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
                  Integer.parseInt(b.substring(2), 16)
                else Integer.parseInt(b.substring(1))
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded >= 0 && Character.isValidCodePoint(decoded)) {
            sb.appendCodePoint(decoded)
            i = semi + 1
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------
  // deterministic page synthesis (test fixture / derived table)
  // ---------------------------------------------------------------

  private def escapeInto(sb: java.lang.StringBuilder, word: String,
                         numericFirst: Boolean): Unit = {
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (i == 0 && numericFirst && c < 128 && c != '&' && c != '<' &&
          c != '>')
        // numeric-entity-encode the chunk's first character so entity
        // decoding is load-bearing for the byte-identity invariant
        sb.append("&#").append(c.toInt).append(';')
      else c match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case _   => sb.append(c)
      }
      i += 1
    }
  }

  def wrapHtml(docId: Long, text: UTF8String): Array[Byte] =
    wrapHtmlStr(docId, text.toString).getBytes(UTF_8)

  /** Deterministic Common-Crawl-style page around `text`: head with
    * style + script (both containing '<'/'&' that must be dropped
    * whole), a comment, and the text split into 7-word block chunks
    * (first chunk an `<h1>`, the rest `<p>`), each chunk's first
    * character numeric-entity-encoded. */
  def wrapHtmlStr(docId: Long, text: String): String = {
    val sb = new java.lang.StringBuilder(text.length * 2 + 512)
    sb.append("<!DOCTYPE html>\n<html lang=\"x\">\n<head>\n")
      .append("  <meta charset=\"utf-8\"/>\n")
      .append("  <title>Doc ").append(docId).append("</title>\n")
      .append("  <style>\n    body > p.c { margin: 0 & auto; }\n")
      .append("  </style>\n")
      .append("  <script type=\"text/javascript\">\n")
      .append("    var n = ").append(docId)
      .append("; if (n < 99 && n > -1) { var s = \"a&b<c>\"; }\n")
      .append("  </script>\n")
      .append("  <!-- synthetic page; id > 0 & id < 1e12 -->\n")
      .append("</head>\n<body>\n")
    if (text.nonEmpty) {
      val words = text.split(' ')
      var i = 0
      var chunk = 0
      while (i < words.length) {
        val end = math.min(i + 7, words.length)
        val tagOpen =
          if (chunk == 0) "  <h1 class=\"t\" data-k=\"v>w\">"
          else "  <p class=\"c\">"
        sb.append(tagOpen)
        var j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          escapeInto(sb, words(j), numericFirst = j == i)
          j += 1
        }
        sb.append(if (chunk == 0) "</h1>\n" else "</p>\n")
        i = end
        chunk += 1
      }
    }
    sb.append("</body>\n</html>\n")
    sb.toString
  }
}
