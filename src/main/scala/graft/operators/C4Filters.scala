package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E28: the C4 cleaning rules (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text
  * Transformer" §2.2 — the filter set that produced C4 from Common
  * Crawl). The third member of the rule-gate family: E11 carries the
  * Gopher document-shape rules, E27 the Gopher repetition rules, and
  * this the C4 LINE rules plus PAGE rules:
  *
  *   line rules (a failing line is dropped, the page survives):
  *     - ends in a terminal punctuation mark (. ! ? ") — trailing
  *       whitespace ignored,
  *     - has at least `minLineWords` words (paper: 5),
  *     - does not contain the word "javascript" (case-insensitive; the
  *       paper's cookie/JS-warning heuristic);
  *   page rules (a failing page is dropped entirely):
  *     - at least `minSentences` sentences after line cleaning
  *       (paper: 3; sentences approximated as terminal-punctuation
  *       occurrences — the standard rule-engine stand-in for a
  *       sentence splitter, pinned by the spec's reference),
  *     - no "lorem ipsum" (case-insensitive),
  *     - no curly brace (code markup),
  *     - no word from the caller's blocklist (the paper uses the
  *       LDNOOBW word list; passed in as data — an engine ships
  *       mechanisms, not a hard-coded profanity list).
  *
  * The paper's remaining step — deduplicating any three-sentence span
  * occurring more than once in the corpus — is exactly C8
  * ([[SpanDup]]) at sentence granularity; compose `c4Clean` with
  * `SpanDup.spanDedup`/[[DedupPipeline.curate]] for the full recipe.
  *
  * Scale shape: every rule is row-local — one narrow projection, no
  * shuffle/join/window (plan-audit spec'd), stream-transparent as-is
  * (the G11 argument: one expression tree, so batch/online parity is
  * structural). The blocklist reaches the plan as a literal array,
  * bounded by the list, never the corpus.
  */
object C4Filters {

  /** Word-splitting for the blocklist check: lowercase alphanumeric
    * runs, so "Bad-Word!" matches a blocklist entry "bad-word" does
    * not but "bad" and "word" do — the paper checks words, not
    * substrings (substring matching famously holds the Scunthorpe
    * problem). */
  private val WordSep = "[^a-z0-9]+"

  /** Per-line keep rule as a SQL lambda body over line variable `l`. */
  private def lineKeepExpr(minLineWords: Int): String =
    s"""rtrim(l) RLIKE '[.!?"]$$'
       | AND size(split(trim(l), ' +')) >= $minLineWords
       | AND NOT contains(lower(l), 'javascript')""".stripMargin

  /** Clean every page by the line rules, then judge it by the page
    * rules. Every input row comes back labeled — (idCol, text_clean,
    * n_lines, n_lines_kept, n_sentences, flag_sentences, flag_lorem,
    * flag_brace, flag_blocklist, keep) — so callers route instead of
    * silently losing rows; `text_clean` is the line-filtered page
    * (empty when no line survives, which also fails the sentence
    * rule: fail-closed, the StreamingCurationGate convention). */
  def c4Clean(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineWords: Int = 5,
      minSentences: Int = 3, blocklist: Seq[String] = Seq.empty): DataFrame = {
    require(minLineWords >= 1, s"minLineWords $minLineWords must be >= 1")
    require(minSentences >= 0, s"minSentences $minSentences must be >= 0")
    val badWords = blocklist.map(_.toLowerCase)
    require(badWords.forall(_.nonEmpty), "blocklist entries must be non-empty")
    val kept = expr(
      s"filter(split(`$textCol`, '\\n'), l -> ${lineKeepExpr(minLineWords)})")
    val blockedCol =
      if (badWords.isEmpty) lit(false)
      else arrays_overlap(
        split(lower(col(textCol)), WordSep),
        typedLit(badWords))
    docs
      .select(col(idCol), col(textCol),
        split(col(textCol), "\n").as("_lines"), kept.as("_kept"))
      .select(col(idCol), col(textCol),
        concat_ws("\n", col("_kept")).as("text_clean"),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_lines_kept"),
        blockedCol.as("_blocked"))
      .withColumn("n_sentences",
        (length(col("text_clean")) -
          length(regexp_replace(col("text_clean"), "[.!?]", ""))).cast("long"))
      .select(col(idCol), col("text_clean"), col("n_lines"),
        col("n_lines_kept"), col("n_sentences"),
        (col("n_sentences") >= minSentences).as("flag_sentences"),
        (!contains(lower(col(textCol)), lit("lorem ipsum"))).as("flag_lorem"),
        (!contains(col(textCol), lit("{"))).as("flag_brace"),
        (!col("_blocked")).as("flag_blocklist"))
      .withColumn("keep",
        col("flag_sentences") && col("flag_lorem") &&
          col("flag_brace") && col("flag_blocklist"))
  }

  /** Harness entry over the documents table. */
  def c4Filter(spark: SparkSession, d: String): DataFrame =
    c4Clean(Tables.documents(spark, d).select(col("doc_id"), col("text")))
}
