package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(html: String): (String, String, Int) = {
    val df = Seq(html).toDF("h")
      .select(TextAnalysis.extractHtmlText(col("h")).as("t"),
        TextAnalysis.htmlTitle(col("h")).as("title"),
        TextAnalysis.htmlLinkCount(col("h")).as("links"))
      .head()
    (df.getString(0), df.getString(1), df.getInt(2))
  }

  test("script/style/comment blocks drop wholesale, tags strip, text survives") {
    val (t, title, links) = one(
      """<html><head><title>A  Page</title>
        |<script>if (1 < 2 && x) { alert("gotcha </p>"); }</script>
        |<style>p { color: red; } /* <b> */</style></head>
        |<body><h1>Head</h1><p>Hello <b>world</b></p><!-- secret --></body></html>"""
        .stripMargin)
    assert(t == "A Page Head Hello world")
    assert(title == "A Page")
    assert(links == 0)
  }

  test("entities decode in single-pass order: &amp;lt; stays literal &lt;") {
    val (t, _, _) = one("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y &amp;lt; end</p>")
    // &amp; decodes LAST, so the &amp;lt; sequence yields literal "&lt;"
    // rather than double-decoding to "<"
    assert(t == "a <tag> \"q\" 's' x y &lt; end")
  }

  test("link count matches anchors including newline-separated attributes") {
    val (_, _, links) = one("<a href=\"/a\">x</a><a\nhref=\"/b\">y</a><abbr>no</abbr>")
    assert(links == 2)
  }

  test("noindex meta detected case-insensitively, absent elsewhere") {
    val df = Seq(
      "<meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\">",
      "<META NAME=ROBOTS CONTENT=noindex>",
      "<meta name=\"description\" content=\"noindex is a word here\">",
      "<p>robots noindex as plain text</p>").toDF("h")
      .select(TextAnalysis.htmlNoindex(col("h")).as("ni")).collect()
    assert(df.map(_.getBoolean(0)).toSeq == Seq(true, true, false, false))
  }

  test("no title yields empty string; malformed html never throws") {
    val (t, title, _) = one("<p>plain</p>")
    assert(title == "" && t == "plain")
    val (t2, _, _) = one("broken < not a tag and <unclosed")
    assert(t2.nonEmpty)
  }
}
