package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E35: HTML → text extraction — the step between the raw crawl and
  * the first text rule. Every published web pipeline consumes
  * extracted text, not markup (C4 starts from Common Crawl's
  * pre-extracted WET files, Raffel et al. 2020 §2.2; RefinedWeb runs
  * trafilatura, Penedo et al. 2023 §3.1); an engine whose gates assume
  * "lines of prose" needs the markup→prose step in-engine or the C4
  * line rules upstream of it see `<div class="nav">` as a line. The
  * reference repo has no crawl surface (main.py:37-340), so like
  * E28/E32 this is engine-added.
  *
  * This is the RULE-ENGINE stand-in for a DOM extractor, and says so:
  * a regex chain cannot implement an HTML5 tree builder (mis-nested
  * tags, conditional comments, `<script>` containing literal "</scr" +
  * "ipt>" splits). What it is: the deterministic, declarative,
  * zero-dependency transform that handles the overwhelmingly common
  * shape of crawled markup — and because every step is a built-in
  * codegen'd `regexp_replace`, the whole extraction is one row-local
  * projection (zero exchange, stream-transparent, the E27/E28 scale
  * shape). A DOM-fidelity extractor would ride [[graft.multimodal]]'s
  * bounded-batch plumbing instead, the documented F4 pattern.
  *
  * The pinned chain (each step spec'd on constructed fixtures):
  *   1. drop non-content ELEMENTS wholesale: script, style, noscript,
  *      head, template — their text is code, not prose — and HTML
  *      comments (`(?is)` inline flags: case-insensitive, DOTALL;
  *      non-greedy bodies so adjacent elements never merge)
  *   2. BLOCK boundary tags → '\n' (p, div, li, tr, headings, br,
  *      section/article/blockquote/pre, table rows …): the line
  *      structure the C4 line rules and LineDedup operate on is
  *      CREATED here — a tag soup stripped flat would glue the nav
  *      bar to the first paragraph
  *   3. strip every remaining tag (`<[a-zA-Z/!][^>]*>` — a bare '<'
  *      that is not tag-shaped is text and survives, the "5 < 6" case)
  *   4. decode the named entities crawl text actually carries (&amp;
  *      &lt; &gt; &quot; &apos; &#39; &nbsp;) — &amp; LAST, so
  *      double-escaped "&amp;lt;" decodes to the literal "&lt;" the
  *      author wrote, not to "<" (numeric entities beyond &#39; pass
  *      through untouched: decoding them declaratively would need a
  *      per-codepoint chr() explode for a tail the named set already
  *      covers; documented, not hidden)
  *   5. whitespace discipline: horizontal runs → one space, trim each
  *      line, drop blank lines (the extracted unit is the non-empty
  *      line — C4Filters' input convention)
  *
  * ONE-SHOT, not idempotent — deliberately: entity decoding can
  * reintroduce tag-shaped text ("&lt;p&gt;" decodes to the literal
  * "<p>" the author escaped precisely so it would NOT parse as a tag),
  * so a second pass would strip what the first pass correctly
  * extracted. Extraction is a boundary step, run once per raw
  * document (unlike [[TextNorm]], an idempotent key function run
  * anywhere); the spec pins the distinction on the escaped-tag case.
  */
object HtmlExtract {

  private val DropElems = Seq("script", "style", "noscript", "head", "template")

  /** Tags whose boundary implies a line break in the rendered text. */
  private val BlockTags = Seq(
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
    "header", "footer", "nav", "blockquote", "pre", "form", "hr",
    "figure", "figcaption", "main", "dl", "dt", "dd")

  /** The extraction chain as a Column over a raw-HTML string column. */
  def extractCol(html: Column): Column = {
    val dropped = DropElems.foldLeft(
      regexp_replace(html, "(?is)<!--.*?-->", "")) { (c, t) =>
      regexp_replace(c, s"(?is)<$t\\b.*?</$t\\s*>", "")
    }
    val blocks = regexp_replace(dropped,
      s"(?i)</?(?:${BlockTags.mkString("|")})\\b[^>]*>", "\n")
    val untagged = regexp_replace(blocks, "(?s)<[a-zA-Z/!][^>]*>", "")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last: preserves double-escapes as written
    ).foldLeft(untagged) { case (c, (e, r)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), r)
    }
    // horizontal runs -> one space, trim line edges, drop blank lines
    val oneSpace = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val trimmed = regexp_replace(oneSpace, "(?m)^ | $", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), "\n")
  }

  /** (input columns..., text) — the extracted prose, ready for the
    * rule gates; every input row comes back (the C4Filters labeling
    * convention — a page that extracts to empty is the gate's
    * fail-closed case, not a silently dropped row). */
  def extract(docs: DataFrame, htmlCol: String = "html",
      outCol: String = "text"): DataFrame =
    docs.withColumn(outCol, extractCol(col(htmlCol)))
}
