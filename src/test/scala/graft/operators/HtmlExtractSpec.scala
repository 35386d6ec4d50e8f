package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E35 extraction must drop non-content elements wholesale, create
  * line structure at block boundaries, strip remaining tags without
  * eating bare '<', decode the named entity set in the pinned order,
  * and feed C4Filters lines it can judge — each on constructed
  * fixtures with hand-computed expectations. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "html")
      .withColumn("t", HtmlExtract.extractCol(col("html")))
      .orderBy("doc_id").select("t").as[String].collect().toSeq

  test("full page: head/style/script/comments dropped, blocks become lines") {
    val page =
      """<!DOCTYPE html><html><head><title>T</title><style>p{color:red}</style></head>
        |<body><!-- nav follows --><nav>Home | About</nav>
        |<p>First sentence of real prose.</p>
        |<p>Second &amp; third things &lt;here&gt;.</p>
        |<script>var x = 1;</script>
        |<div>5 < 6 is true.</div>
        |</body></html>""".stripMargin
    assert(extract(page) === Seq(
      "Home | About\nFirst sentence of real prose.\n" +
        "Second & third things <here>.\n5 < 6 is true."))
  }

  test("inline tags strip without creating line breaks") {
    assert(extract(
      """<p>Keep <b>bold</b> and <a href="x.html">links</a> inline.</p>""") ===
      Seq("Keep bold and links inline."))
  }

  test("script bodies containing markup are dropped wholesale, non-greedily") {
    assert(extract(
      """<script>if (a<b) document.write("<p>hi</p>");</script>More.
        |<script>one</script><p>between</p><script>two</script>""".stripMargin) ===
      Seq("More.\nbetween"))
  }

  test("entity decode order: double-escapes survive as written") {
    assert(extract(
      "A&nbsp;B &quot;q&quot; it&#39;s &apos;a&apos; &amp;lt; stays") ===
      Seq("A B \"q\" it's 'a' &lt; stays"))
    // numeric entities outside the named set pass through untouched
    assert(extract("&#8212; and &#x2014;") === Seq("&#8212; and &#x2014;"))
  }

  test("pure markup extracts to empty; whitespace discipline holds") {
    assert(extract(
      "<html><head><title>x</title></head><body><div></div></body></html>",
      "<p>  spaced \t out  </p>\r\n<p>next</p>",
      "") === Seq("", "spaced out\nnext", ""))
  }

  test("one-shot contract: decoded escaped tags would be re-stripped by a second pass") {
    // the author wrote &lt;p&gt; so it would NOT parse as a tag; one
    // pass preserves it, a second pass would strip it — which is why
    // extraction runs once per raw document, unlike idempotent TextNorm
    val once = extract("Use &lt;p&gt; for paragraphs.")
    assert(once === Seq("Use <p> for paragraphs."))
    // the re-stripped "<p>" is a block tag: it even splits the line
    assert(extract(once.head) === Seq("Use\nfor paragraphs."))
  }

  test("extracted lines feed C4Filters: block structure is judged per line") {
    val page =
      """<div>Too short.</div>
        |<p>This proper sentence has enough words to pass the line rule.</p>
        |<p>A second full sentence keeps the page above the sentence floor!</p>
        |<p>And a third one closes the page out properly?</p>""".stripMargin
    val docs = Seq((1L, page)).toDF("doc_id", "html")
    val gated = C4Filters.c4Clean(HtmlExtract.extract(docs))
    val row = gated.select("n_lines", "n_lines_kept", "keep").first()
    assert(row.getLong(0) === 4L) // four block lines extracted
    assert(row.getLong(1) === 3L) // "Too short." fails the 5-word rule
    assert(row.getBoolean(2))     // 3 sentences survive: page passes
  }

  test("extraction is row-local: zero exchange in the plan") {
    val plan = HtmlExtract.extract(
      Seq((1L, "<p>x</p>")).toDF("doc_id", "html"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
