package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.WebEval

/** HTML → text extraction contract (input_hint per-row invariant:
  * byte-identical extracted text per url). */
class WebTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("extractText strips tags, scripts, styles, comments, entities") {
    val html =
      """<!DOCTYPE html>
        |<html><head><title>head is dropped whole</title>
        |<script>if (a < b && c > d) { x = "<p>not a tag</p>"; }</script>
        |<style>p > span { content: "&amp;"; }</style>
        |</head>
        |<body>
        |<!-- a comment with <tags> and > signs -->
        |<script>var bodyScript = 1 < 2;</script>
        |<h1 class="x" data-v="a>b">Hello &amp; welcome</h1>
        |<p>line one<br/>line two</p>
        |<p>&#72;i &#x21; &lt;b&gt; stays literal</p>
        |</body></html>""".stripMargin
    assert(WebEval.extractText(html) ===
      "Hello & welcome line one line two Hi ! <b> stays literal")
  }

  test("extractText edge cases") {
    // unterminated script swallows to end; bare & kept; long
    // non-entity '&' run kept; empty input; whitespace-only
    assert(WebEval.extractText("a &b; c &notanentity; d") ===
      "a &b; c &notanentity; d")
    assert(WebEval.extractText("x<script>never closed") === "x")
    assert(WebEval.extractText("") === "")
    assert(WebEval.extractText("  \n\t ") === "")
    assert(WebEval.extractText("<p>a</p><p>b</p>") === "a b")
    // scriptx is NOT a script element
    assert(WebEval.extractText("<scriptx>kept</scriptx>") === "kept")
    assert(WebEval.extractText("<SCRIPT>x</SCRIPT>ok") === "ok")
  }

  test("wrapHtml round-trips byte-identically for whitespace-normal text") {
    val texts = Seq(
      "one",
      "a b c d e f g h i j k l m n o p",
      "amp & lt < gt > mixed",
      "seven words exactly here to fill chunk",
      (1 to 100).map(i => s"w$i").mkString(" "))
    for ((t, i) <- texts.zipWithIndex) {
      val html = WebEval.wrapHtmlStr(i.toLong, t)
      assert(WebEval.extractText(html) === t,
        s"round-trip failed for: $t")
      // the synthesis must actually exercise the hard paths
      assert(html.contains("<script"))
      assert(html.contains("&#"))
    }
  }

  test("webPages table has the input_hint shape and the invariant holds") {
    val p = Derived.webPages(spark, "/root/testdata/sf0.001")
    assert(p.columns.toSeq ===
      Seq("url", "warc_ts", "html", "text", "lang"))
    assert(p.schema("html").dataType.typeName === "binary")
    assert(p.schema("warc_ts").dataType.typeName === "timestamp")
    // byte-identical per-row invariant, checked distributed via the
    // codegen'd expressions (not the JVM kernel directly)
    val bad = p.where(
      graft.expr.WebFunctions.html_extract_text(col("html"))
        =!= col("text")).count()
    assert(bad === 0L)
    assert(p.count() > 0)
  }
}
