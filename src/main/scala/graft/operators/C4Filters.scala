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
    c4Clean(Tables.documentsSpread(spark, d).select(col("doc_id"), col("text")))

  /** Gated harness entry. The synthetic corpus is single-line prose
    * with no punctuation, so the query derives a multi-line page
    * deterministically from columns it does have (the url_gate
    * derive-the-input precedent): every ` table ` becomes a sentence
    * break (`.` + newline) so line lengths vary naturally around the
    * five-word rule; docs ≡ 0 mod 5 get `spark` → `javascript` (a
    * failing line inside a surviving page), ≡ 0 mod 7 a trailing
    * `lorem ipsum` sentence (passes the line rules, kills the page),
    * ≡ 0 mod 11 a curly-brace line, and lang `de` a blocklisted word —
    * so every line rule and every page rule fires on real rows. The
    * DuckDB oracle re-derives the page with the same `replace`/`chr`
    * chain and re-evaluates every rule independently via
    * `list_filter`; both engines use plain (non-regex) replace with
    * identical left-to-right non-overlapping semantics, and every
    * output is a string, long, or boolean — no float drift possible. */
  /** The gate's derived multi-line page (see [[c4Gate]]'s doc) as a
    * reusable projection — input needs (doc_id, lang, text); output
    * keeps every input column and adds `page`. Shared by [[c4Gate]]
    * and the corpus-report gate ([[CorpusReport]]), which must
    * evaluate ALL rule families over one non-degenerate input — two
    * spellings of the derivation would let the report's c4 column and
    * the c4 gate itself drift apart while both stayed green. */
  private[operators] def gatePage(docs: DataFrame): DataFrame =
    docs
      .withColumn("_p1", expr("replace(text, ' table ', concat('.', chr(10)))"))
      .withColumn("_p2",
        when(col("doc_id") % 5 === 0,
          expr("replace(_p1, 'spark', 'javascript')")).otherwise(col("_p1")))
      .withColumn("page", concat(col("_p2"),
        when(col("doc_id") % 7 === 0,
          lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit("\nconfig { x }")).otherwise(lit("")),
        when(col("lang") === "de",
          lit("\nverboten words are here now.")).otherwise(lit(""))))
      .drop("_p1", "_p2")

  def c4Gate(spark: SparkSession, d: String): DataFrame = {
    val page = gatePage(Tables.documentsSpread(spark, d)
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("page"))
    c4Clean(page, textCol = "page", blocklist = Seq("verboten"))
  }

  /** ONE spelling of the derived page in SQL too (the [[gatePage]]
    * argument applied to the oracle side): the corpus-report oracle
    * composes this same CTE body, so both gates certify the same
    * derivation. Keeps `source` for the report's grouping key. */
  private[operators] val gatePageSql: String =
    """SELECT doc_id, source,
      |    (CASE WHEN doc_id % 5 = 0
      |          THEN replace(replace(text, ' table ', '.' || chr(10)),
      |                       'spark', 'javascript')
      |          ELSE replace(text, ' table ', '.' || chr(10)) END)
      |    || (CASE WHEN doc_id % 7 = 0
      |             THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END)
      |    || (CASE WHEN doc_id % 11 = 0
      |             THEN chr(10) || 'config { x }' ELSE '' END)
      |    || (CASE WHEN lang = 'de'
      |             THEN chr(10) || 'verboten words are here now.' ELSE '' END)
      |      AS page
      |  FROM documents""".stripMargin

  // plain concatenation, NOT interpolation-then-stripMargin: the page
  // SQL's own `||` concatenations would read as margin pipes and be
  // mangled by a second stripMargin pass
  val c4GateSql: String =
    "WITH pages AS (\n  " + gatePageSql + ")," +
    """
      |sel AS (
      |  SELECT doc_id, page,
      |    string_split(page, chr(10)) AS ls,
      |    list_filter(string_split(page, chr(10)), l ->
      |      regexp_matches(rtrim(l), '[.!?"]$')
      |      AND len(string_split_regex(trim(l), ' +')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS ks
      |  FROM pages),
      |sel2 AS (
      |  -- coalesce: DuckDB array_to_string([]) is NULL, Spark
      |  -- concat_ws over an empty array is '' — '' is the spec'd
      |  -- cleans-to-empty value
      |  SELECT doc_id, page, ls, ks,
      |    coalesce(array_to_string(ks, chr(10)), '') AS tc
      |  FROM sel)
      |SELECT doc_id,
      |  tc AS text_clean,
      |  CAST(len(ls) AS BIGINT) AS n_lines,
      |  CAST(len(ks) AS BIGINT) AS n_lines_kept,
      |  CAST(len(tc) - len(regexp_replace(tc, '[.!?]', '', 'g'))
      |    AS BIGINT) AS n_sentences,
      |  (len(tc) - len(regexp_replace(tc, '[.!?]', '', 'g'))
      |    >= 3) AS flag_sentences,
      |  NOT contains(lower(page), 'lorem ipsum') AS flag_lorem,
      |  NOT contains(page, '{') AS flag_brace,
      |  NOT list_contains(string_split_regex(lower(page), '[^a-z0-9]+'),
      |                    'verboten') AS flag_blocklist,
      |  (len(tc) - len(regexp_replace(tc, '[.!?]', '', 'g')) >= 3)
      |    AND NOT contains(lower(page), 'lorem ipsum')
      |    AND NOT contains(page, '{')
      |    AND NOT list_contains(string_split_regex(lower(page), '[^a-z0-9]+'),
      |                          'verboten') AS keep
      |FROM sel2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c4_gate" -> c4Gate _)

  val oracles: Map[String, String] = Map(
    "c4_gate" -> c4GateSql)
}
