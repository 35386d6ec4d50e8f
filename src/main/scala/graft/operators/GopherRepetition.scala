package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollingWindowFp

/** E27: the Gopher REPETITION rules — the second half of the published
  * Gopher quality filter (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", Table A1;
  * reference compute.py:10-59 is the generic compute-a-signal-per-row
  * surface this specializes). E11 (`quality_gopher`) implements the
  * document-shape rules (word count, mean word length, type-token
  * ratio, stopwords); this operator implements the within-document
  * repetition rules the paper lists beside them:
  *
  *   - duplicate line / paragraph fraction (occurrences beyond the
  *     first, over the line/paragraph count),
  *   - duplicate line / paragraph CHARACTER fraction (characters of
  *     those non-first occurrences, over the document's characters),
  *   - top 2/3/4-gram character fraction (characters covered by the
  *     most-repeated n-gram: count × gram chars, over doc chars),
  *   - duplicate 5..10-gram character fraction (characters covered by
  *     ANY n-gram occurring ≥ 2 times in the doc — an exact interval
  *     UNION over token positions, so overlapping occurrences never
  *     double-count; the C8 SpanDup fold applied doc-locally).
  *
  * Scale shape — the ideal one: every signal is a function of the row
  * alone, so the whole suite is ONE narrow projection. No shuffle, no
  * join, no window, no state; 100 TB costs exactly one scan,
  * embarrassingly parallel. All nine n-gram statistics come from ONE
  * custom expression
  * ([[org.apache.spark.sql.graft.NgramRepetition]], r18): each token
  * hashed once, lengths prefix-summed once, one O(tokens) rolling-
  * fingerprint slide + open-addressed count pass per order — O(9·T)
  * flat, no sorts, no interpreted lambda dispatch (the first
  * implementation's nine `array_sort`+`aggregate` HOF chains were
  * corpus_report's measured compute floor). N-gram identity is the
  * Rabin-Karp rolling fingerprint ([[RollingWindowFp]]'s exact math);
  * the C8 collision class applies (a 2⁻⁶⁴ collision can overstate
  * repetition, never understate; SpanDupSpec pins the rolling/joined
  * paths equal on the real corpus).
  *
  * Definition choices, pinned here and mirrored by the spec's
  * single-node reference:
  *   - tokens = `split(text, " ")` (the E11 convention), lines =
  *     `split(text, "\n")`, paragraphs = `split(text, "\n\n")`; empty
  *     segments count (a run of blank lines is itself repetition).
  *   - gram characters include the gram's INTERNAL separators (the
  *     gram as it appears in the text); char fractions divide by
  *     `length(text)`.
  *   - top-gram picks the gram maximizing the statistic itself
  *     (count × chars) — deterministic, where "most frequent" leaves
  *     count-ties ambiguous. Overlapping self-repeats can push the
  *     product past 1.0 ("a a a a": 3 × "a a") — reported raw, as the
  *     published implementations do; thresholds are unaffected.
  *   - duplicate-gram coverage merges ADJACENT flagged windows (the
  *     merged token range is contiguous in the text, so the seam
  *     separator is covered).
  */
object GopherRepetition {

  /** The paper's Table A1 repetition thresholds: a document PASSES a
    * rule when the signal is ≤ the threshold. */
  val DefaultThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15, "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13, "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11, "dup_10gram_char_frac" -> 0.10)

  // aliases of the fused expression's order sets — ONE definition, so
  // the struct fields and the signal names cannot drift (review wave
  // 3, r18: wave 2 equality-ASSERTED two copies, which still ships a
  // divergence and fails only at class-load; aliasing makes it
  // impossible by construction)
  val TopNs: Seq[Int] = org.apache.spark.sql.graft.NgramRepetition.TopNs
  val DupNs: Seq[Int] = org.apache.spark.sql.graft.NgramRepetition.DupNs

  /** Characters of the duplicated-line (or paragraph) occurrences
    * beyond the first: Σ over all segments − Σ over distinct segments
    * — exactly "each occurrence after the first counts its length",
    * without ordering logic. */
  private def dupSegCols(seg: Column, prefix: String): Seq[Column] = {
    val charsAll = aggregate(seg, lit(0L), (a, x) => a + length(x))
    val charsDistinct =
      aggregate(array_distinct(seg), lit(0L), (a, x) => a + length(x))
    Seq(
      (size(seg) - size(array_distinct(seg))).cast("long").as(s"_${prefix}_dup_n"),
      size(seg).cast("long").as(s"_${prefix}_n"),
      (charsAll - charsDistinct).as(s"_${prefix}_dup_chars"))
  }

  /** All thirteen repetition signals per document — one projection, no
    * exchange (plan-audit spec'd). Input needs (idCol, textCol);
    * output: idCol, n_chars, n_tokens, n_lines, n_paras, and the
    * signal columns named as in [[DefaultThresholds]].
    *
    * The nine n-gram statistics come from ONE custom expression
    * ([[org.apache.spark.sql.graft.NgramRepetition]], r18 directive
    * 6): the first implementation ran nine interpreted
    * `array_sort`+`aggregate` higher-order-function chains per row —
    * corpus_report's measured 2.02 s compute floor at sf0.1 — where
    * duplicate detection needs only a shared-hash count pass. The
    * fused expression hashes each token once, prefix-sums lengths
    * once, and slides all nine fingerprint orders over the shared
    * arrays; identical values by the same definitions (spec-pinned
    * bit-exact against the string-keyed single-node reference, gate-
    * pinned against DuckDB's literal-gram recomputation). */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(
      Seq(col(idCol),
        length(col(textCol)).cast("long").as("_nc"),
        split(col(textCol), " ").as("_toks"),
        split(col(textCol), "\n").as("_lines"),
        split(col(textCol), "\n\n").as("_paras")): _*)
    val withSegs = base.select(
      Seq(col(idCol), col("_nc"), size(col("_toks")).cast("long").as("_nt"),
        org.apache.spark.sql.graft.NgramRepetition
          .ngramRepetition(col("_toks")).as("_rep")) ++
        dupSegCols(col("_lines"), "line") ++
        dupSegCols(col("_paras"), "para"): _*)
    def overChars(c: Column): Column =
      when(col("_nc") > 0, c.cast("double") / col("_nc")).otherwise(lit(0.0))
    withSegs.select(
      Seq(col(idCol),
        col("_nc").as("n_chars"),
        col("_nt").as("n_tokens"),
        col("_line_n").as("n_lines"),
        col("_para_n").as("n_paras"),
        (col("_line_dup_n").cast("double") / col("_line_n")).as("dup_line_frac"),
        (col("_para_dup_n").cast("double") / col("_para_n")).as("dup_para_frac"),
        overChars(col("_line_dup_chars")).as("dup_line_char_frac"),
        overChars(col("_para_dup_chars")).as("dup_para_char_frac")) ++
        TopNs.map(n => overChars(col(s"_rep.top$n")).as(s"top_${n}gram_char_frac")) ++
        DupNs.map(n => overChars(col(s"_rep.dup$n")).as(s"dup_${n}gram_char_frac")): _*)
  }

  /** Signals + one boolean flag per rule (`flag_<signal>`, true =
    * passes) + the conjoined `pass_repetition`. Still row-local — the
    * full Gopher gate is this AND E11's `pass`
    * (`QualityOps.qualityFlags`), both streamable as-is. */
  def repetitionFlags(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      thresholds: Seq[(String, Double)] = DefaultThresholds): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val sig = repetitionSignals(docs, idCol, textCol)
    val known = sig.columns.toSet
    thresholds.foreach { case (name, _) =>
      require(known.contains(name), s"unknown signal '$name' — known: " +
        sig.columns.sorted.mkString(", "))
    }
    val flagged = thresholds.foldLeft(sig) { case (df, (name, t)) =>
      df.withColumn(s"flag_$name", col(name) <= t)
    }
    flagged.withColumn("pass_repetition",
      thresholds.map { case (name, _) => col(s"flag_$name") }
        .reduce(_ && _))
  }

  /** Harness entry over the documents table (line-ified upstream by
    * callers that want line/paragraph signals on this newline-free
    * synthetic corpus). */
  def gopherRepetition(spark: SparkSession, d: String): DataFrame =
    repetitionFlags(Tables.documentsSpread(spark, d).select(col("doc_id"), col("text")))

  /** Gated subset of the signal suite: the five signals DuckDB can
    * recompute independently on this corpus — top 2/3/4-gram coverage
    * (the oracle groups the literal gram STRINGS where the engine runs
    * sorted fingerprints, so the gate pins the fingerprint path against
    * ground truth — a fp collision would surface as a hash mismatch
    * here) and the duplicate-5-gram interval union (the oracle merges
    * intervals by gaps-and-islands over flagged positions, an
    * independent derivation of the same union). The line/paragraph
    * signals are degenerate on this newline-free synthetic corpus
    * (every doc is one line), so they stay spec-gated on constructed
    * fixtures rather than wasting a trivially-constant oracle. */
  def gopherRep(spark: SparkSession, d: String): DataFrame =
    repetitionSignals(Tables.documentsSpread(spark, d)
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("top_2gram_char_frac"), col("top_3gram_char_frac"),
        col("top_4gram_char_frac"), col("dup_5gram_char_frac"))

  /** One top-n CTE pair: all n-grams as strings, then max(count×chars)
    * per doc. */
  private def topSql(n: Int): String =
    s"""g$n AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, len(w) - ${n - 1}),
       |    i -> array_to_string(w[i:i+${n - 1}], ' '))) AS gram FROM t),
       |c$n AS (SELECT doc_id, MAX(cnt * length(gram)) AS best
       |  FROM (SELECT doc_id, gram, COUNT(*) AS cnt
       |        FROM g$n GROUP BY doc_id, gram)
       |  GROUP BY doc_id)""".stripMargin

  val gopherRepSql: String =
    s"""WITH t AS (SELECT doc_id, length(text) AS n_chars,
       |  string_split(text, ' ') AS w FROM documents),
       |${topSql(2)},
       |${topSql(3)},
       |${topSql(4)},
       |g5 AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, len(w) - 4),
       |    i -> {'i': i, 'g': array_to_string(w[i:i+4], ' ')})) AS x FROM t),
       |f5 AS (SELECT doc_id, x.i AS i FROM g5
       |  QUALIFY COUNT(*) OVER (PARTITION BY doc_id, x.g) >= 2),
       |b5 AS (SELECT doc_id, i,
       |  CASE WHEN i > COALESCE(MAX(i + 5) OVER
       |    (PARTITION BY doc_id ORDER BY i
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), i)
       |  THEN 1 ELSE 0 END AS brk FROM f5),
       |i5 AS (SELECT doc_id, i, SUM(brk) OVER
       |  (PARTITION BY doc_id ORDER BY i) AS isl FROM b5),
       |v5 AS (SELECT doc_id, MIN(i) AS s, MAX(i) + 5 AS e
       |  FROM i5 GROUP BY doc_id, isl),
       |d5 AS (SELECT v5.doc_id,
       |  SUM(list_sum(list_transform(t.w[v5.s:v5.e-1], tk -> length(tk)))
       |      + (v5.e - v5.s - 1)) AS dup5
       |  FROM v5 JOIN t USING (doc_id) GROUP BY v5.doc_id)
       |SELECT t.doc_id, t.n_chars, len(t.w) AS n_tokens,
       |  CASE WHEN t.n_chars > 0
       |    THEN CAST(COALESCE(c2.best, 0) AS DOUBLE) / t.n_chars
       |    ELSE 0.0 END AS top_2gram_char_frac,
       |  CASE WHEN t.n_chars > 0
       |    THEN CAST(COALESCE(c3.best, 0) AS DOUBLE) / t.n_chars
       |    ELSE 0.0 END AS top_3gram_char_frac,
       |  CASE WHEN t.n_chars > 0
       |    THEN CAST(COALESCE(c4.best, 0) AS DOUBLE) / t.n_chars
       |    ELSE 0.0 END AS top_4gram_char_frac,
       |  CASE WHEN t.n_chars > 0
       |    THEN CAST(COALESCE(d5.dup5, 0) AS DOUBLE) / t.n_chars
       |    ELSE 0.0 END AS dup_5gram_char_frac
       |FROM t LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
       |  LEFT JOIN c4 USING (doc_id) LEFT JOIN d5 USING (doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gopher_rep" -> gopherRep _)

  val oracles: Map[String, String] = Map(
    "gopher_rep" -> gopherRepSql)
}
