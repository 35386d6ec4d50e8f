package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DATASET CARD aggregation — per-source corpus statistics a
  * curation run reports before anyone trains on its output: volume
  * (docs/tokens/chars), duplication estimate, and the pass rate of
  * every published rule gate the engine ships (Gopher document-shape
  * E11, Gopher repetition E27, C4 page rules E28). Dataset cards and
  * datasheets are the published practice (Gebru et al. 2021,
  * "Datasheets for Datasets"; the Pile/ROOTS/Dolma releases each ship
  * per-source composition tables of exactly this shape); the reference
  * repo serves features, not corpora (main.py:37-340), so this is
  * engine-added like the rest of the curation family.
  *
  * ONE DEFINITION, not a re-implementation: the rule verdicts come
  * from the same `qualityFlags` / `repetitionFlags` / `c4Clean`
  * expression trees the gates and gated queries evaluate — the G11
  * structural-parity argument applied to reporting, so a card can
  * never disagree with the gates it describes. The source column rides
  * THROUGH the cores inside a struct id (the scoreChunked convention:
  * the cores treat their id opaquely), so no doc-keyed join ever
  * re-attaches it.
  *
  * Scale shape (r17 directive 5 — ONE corpus pass): the three rule
  * cores are row-local Column trees keyed on an opaque doc_id, so they
  * COMPOSE — each stage packs what later stages need inside the id it
  * hands the next core, and Catalyst collapses the chain into a single
  * projection over a single scan (no core forked: the verdicts are the
  * literal qualityFlags / repetitionFlags / c4Clean outputs, same as
  * ever). The per-doc measures (token/char counts, text hash, three
  * verdict booleans) are projected BEFORE the rollup so the grouping-
  * set Expand duplicates cheap numeric rows, never the text; one
  * rollup(source) then yields every per-source row AND the `__total__`
  * row from one exchange whose partials collapse map-side — the
  * shuffle carries sources × partitions aggregate rows, never
  * documents. (The pre-r17 shape scanned the corpus once per family;
  * the fusion is ~3× less scan for byte-identical numerators.)
  * Duplication is estimated with HLL approx-distinct over
  * xxhash64(text) (the G12 SketchOps convention — O(1) registers;
  * `dedup_exact` is the exact twin when a count, not an estimate, is
  * needed).
  *
  * Output: one row per source plus one `__total__` row (recombined
  * from the per-source NUMERATORS, so the total is exact, not an
  * average of rates): (source, n_docs, n_tokens, n_chars,
  * mean_doc_tokens, distinct_text_est, dup_rate_est,
  * gopher_pass_rate, repetition_pass_rate, c4_keep_rate). Rates are
  * PER-RULE-FAMILY; the conjoined keep of the full stack is the
  * composed gate's job (DedupPipeline.curate / StreamingCurationGate)
  * — a card reports which gate bites, not a verdict.
  */
object CorpusReport {

  val TotalRow = "__total__"

  /** Per-source numerator frame (perSource ∪ `__total__`), the shared
    * assembly both projections read: volumes + HLL + one pass
    * numerator per rule family. Package-private so the gate and the
    * card cannot drift. */
  private[operators] def numerators(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String,
      c4Blocklist: Seq[String]): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol) &&
      docs.columns.contains(srcCol),
      s"docs needs ($idCol, $textCol, $srcCol)")
    // ONE chained projection (r17): the cores key on an opaque doc_id,
    // so each stage packs everything later stages need INSIDE the id
    // it hands on — source and text ride through qualityFlags, then
    // (that + its verdict) through repetitionFlags, then through
    // c4Clean. Catalyst's CollapseProject + GetStructField
    // simplification fold the chain into a single projection over one
    // scan; the cores themselves are called verbatim, never forked.
    val in1 = docs.select(
      struct(col(idCol).as("id"), col(srcCol).as("src"),
        col(textCol).as("text")).as("doc_id"),
      col(textCol).as("text"))
    val q = QualityOps.qualityFlags(in1)
      .select(col("doc_id"), col("pass").as("_pass_q"))
    val in2 = q.select(struct(col("doc_id"), col("_pass_q")).as("doc_id"),
      col("doc_id.text").as("text"))
    val r = GopherRepetition.repetitionFlags(in2)
      .select(col("doc_id"), col("pass_repetition").as("_pass_r"))
    val in3 = r.select(struct(col("doc_id"), col("_pass_r")).as("doc_id"),
      col("doc_id.doc_id.text").as("text"))
    val k = C4Filters.c4Clean(in3, blocklist = c4Blocklist)
      .select(col("doc_id"), col("keep").as("_keep_c4"))

    // per-doc measures BEFORE the rollup, so the grouping-set Expand
    // duplicates one narrow numeric row per doc, never the text
    val perDoc = k.select(
      col("doc_id.doc_id.doc_id.src").as("source"),
      size(filter(split(col("doc_id.doc_id.doc_id.text"), " "),
        w => length(w) > 0)).cast("long").as("_t"),
      length(col("doc_id.doc_id.doc_id.text")).cast("long").as("_c"),
      // rsd 0.01: ~8 KiB of HLL registers per group — still O(1)
      // state, tight enough that the card's duplication column is
      // decision-grade (the default 5% rsd can misstate a 10%-dup
      // source as clean)
      xxhash64(col("doc_id.doc_id.doc_id.text")).as("_h"),
      col("doc_id.doc_id._pass_q").as("_pass_q"),
      col("doc_id._pass_r").as("_pass_r"),
      col("_keep_c4"))

    // rollup(source): every per-source row AND the total row off ONE
    // aggregation exchange — integer numerators sum identically either
    // way, so the total stays the exact recombination the oracle
    // re-derives. The total's distinct_text_est is now the MERGED-HLL
    // global estimate (pre-r17 it was the per-source sum — an upper
    // bound whenever sources share texts; the merge estimates the true
    // global distinct and is what the register algebra is for).
    perDoc.rollup(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_t")).as("n_tokens"),
      sum(col("_c")).as("n_chars"),
      approx_count_distinct(col("_h"), 0.01).as("distinct_text_est"),
      sum(when(col("_pass_q"), 1L).otherwise(0L)).as("n_pass_gopher"),
      sum(when(col("_pass_r"), 1L).otherwise(0L)).as("n_pass_repetition"),
      sum(when(col("_keep_c4"), 1L).otherwise(0L)).as("n_keep_c4"),
      grouping(col("source")).as("_g"))
      .withColumn("source",
        when(col("_g") === 1, lit(TotalRow)).otherwise(col("source")))
      .drop("_g")
  }

  def report(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      c4Blocklist: Seq[String] = Seq.empty): DataFrame =
    numerators(docs, idCol, textCol, srcCol, c4Blocklist)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_docs")).as("mean_doc_tokens"),
        col("distinct_text_est"),
        (lit(1.0) - col("distinct_text_est").cast("double") / col("n_docs"))
          .as("dup_rate_est"),
        (col("n_pass_gopher").cast("double") / col("n_docs"))
          .as("gopher_pass_rate"),
        (col("n_pass_repetition").cast("double") / col("n_docs"))
          .as("repetition_pass_rate"),
        (col("n_keep_c4").cast("double") / col("n_docs")).as("c4_keep_rate"))
      .orderBy(col("source"))

  /** The card's EXACT tier (r15 verdict item 5): volumes and rule
    * numerators only — every column an integer count, a rate derived
    * by one IEEE division over exact integer partials, or the
    * recombined `__total__` row — i.e. everything DuckDB re-derives
    * independently. The HLL estimate (`distinct_text_est` /
    * `dup_rate_est`) is the card's only legitimately spec-only column
    * (register merge order is engine-internal) and stays on
    * [[report]]. */
  def reportExact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      c4Blocklist: Seq[String] = Seq.empty): DataFrame =
    numerators(docs, idCol, textCol, srcCol, c4Blocklist)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_docs")).as("mean_doc_tokens"),
        col("n_pass_gopher"), col("n_pass_repetition"), col("n_keep_c4"),
        (col("n_pass_gopher").cast("double") / col("n_docs"))
          .as("gopher_pass_rate"),
        (col("n_pass_repetition").cast("double") / col("n_docs"))
          .as("repetition_pass_rate"),
        (col("n_keep_c4").cast("double") / col("n_docs")).as("c4_keep_rate"))
      .orderBy(col("source"))

  /** Gated harness entry: the exact tier over the DERIVED multi-line
    * page ([[C4Filters.gatePage]], the c4_gate input) rather than the
    * raw single-line corpus — on raw text the c4 keep column is
    * degenerate (no terminal punctuation → zero everywhere), and a
    * constant oracle column certifies nothing. Over the page every
    * family's numerator varies on real rows, and the oracle re-derives
    * the page through the SAME SQL the c4 gate uses
    * ([[C4Filters.gatePageSql]]) plus the quality/repetition rule SQL
    * of `quality_gopher`/`gopher_rep` extended to the full 13-signal
    * pass conjunction. */
  def corpusReportGate(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val paged = C4Filters.gatePage(graft.Tables.documentsSpread(spark, d)
        .select(col("doc_id"), col("lang"), col("source"), col("text")))
      .select(col("doc_id"), col("page").as("text"), col("source"))
    reportExact(paged, c4Blocklist = Seq("verboten"))
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("corpus_report" -> corpusReportGate _)

  val oracles: Map[String, String] =
    Map("corpus_report" -> CorpusReportSql.sql)
}

/** The corpus_report oracle: DuckDB re-derives the page
  * ([[C4Filters.gatePageSql]], shared with the c4 gate), re-evaluates
  * all three rule families per doc — the E11 shape rules, the FULL
  * 13-signal repetition conjunction (the `gopher_rep` gaps-and-islands
  * pattern extended from n=5 to n=5..10 plus the line/paragraph
  * duplicate fractions), the c4 page rules with the `verboten`
  * blocklist — then recombines per-source numerators and the
  * `__total__` row. Every compared value is an integer count or one
  * IEEE division over exact integer partials, so the gate is
  * hash-exact by construction. */
private[operators] object CorpusReportSql {

  /** Top n-gram max(count × gram chars) per doc — the gopher_rep
    * oracle's pattern, distinct CTE names to coexist with the dup
    * chain. */
  private def topSql(n: Int): String =
    s"""tg$n AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, len(w) - ${n - 1}),
       |    i -> array_to_string(w[i:i+${n - 1}], ' '))) AS gram FROM t),
       |tc$n AS (SELECT doc_id, MAX(cnt * length(gram)) AS best
       |  FROM (SELECT doc_id, gram, COUNT(*) AS cnt
       |        FROM tg$n GROUP BY doc_id, gram)
       |  GROUP BY doc_id)""".stripMargin

  /** Duplicate n-gram interval-union chars per doc — the gopher_rep
    * oracle's g5..d5 chain parameterized over the order. */
  private def dupSql(n: Int): String =
    s"""rg$n AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, len(w) - ${n - 1}),
       |    i -> {'i': i, 'g': array_to_string(w[i:i+${n - 1}], ' ')})) AS x FROM t),
       |rf$n AS (SELECT doc_id, x.i AS i FROM rg$n
       |  QUALIFY COUNT(*) OVER (PARTITION BY doc_id, x.g) >= 2),
       |rb$n AS (SELECT doc_id, i,
       |  CASE WHEN i > COALESCE(MAX(i + $n) OVER
       |    (PARTITION BY doc_id ORDER BY i
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), i)
       |  THEN 1 ELSE 0 END AS brk FROM rf$n),
       |ri$n AS (SELECT doc_id, i, SUM(brk) OVER
       |  (PARTITION BY doc_id ORDER BY i) AS isl FROM rb$n),
       |rv$n AS (SELECT doc_id, MIN(i) AS s, MAX(i) + $n AS e
       |  FROM ri$n GROUP BY doc_id, isl),
       |rd$n AS (SELECT rv$n.doc_id,
       |  SUM(list_sum(list_transform(t.w[rv$n.s:rv$n.e-1], tk -> length(tk)))
       |      + (rv$n.e - rv$n.s - 1)) AS dup
       |  FROM rv$n JOIN t USING (doc_id) GROUP BY rv$n.doc_id)""".stripMargin

  private def frac(num: String): String =
    s"CASE WHEN t.nc > 0 THEN CAST($num AS DOUBLE) / t.nc ELSE 0.0 END"

  val sql: String =
    "WITH pages AS (\n  " + C4Filters.gatePageSql + "),\n" +
    """t AS (SELECT doc_id, source, page, length(page) AS nc,
      |  string_split(page, ' ') AS w,
      |  string_split(page, chr(10)) AS ls,
      |  string_split(page, chr(10) || chr(10)) AS ps
      |  FROM pages),
      |qr AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(replace(page, ' ', '')) AS BIGINT) AS n_word_chars,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(w, tok -> tok IN ('the', 'a'))) AS BIGINT) AS n_stop
      |  FROM t),
      |qp AS (SELECT doc_id,
      |    (n_words >= 25 AND n_words <= 90
      |      AND CAST(n_word_chars AS DOUBLE)/n_words >= 3.0
      |      AND CAST(n_word_chars AS DOUBLE)/n_words <= 4.6
      |      AND CAST(n_distinct AS DOUBLE)/n_words >= 0.35
      |      AND CAST(n_stop AS DOUBLE)/n_words >= 0.01) AS pass_q
      |  FROM qr),
      |""".stripMargin +
    Seq(2, 3, 4).map(topSql).mkString(",\n") + ",\n" +
    Seq(5, 6, 7, 8, 9, 10).map(dupSql).mkString(",\n") + ",\n" +
    s"""rs AS (SELECT t.doc_id,
      |    CAST(len(t.ls) - len(list_distinct(t.ls)) AS DOUBLE)
      |      / len(t.ls) AS dup_line_frac,
      |    CAST(len(t.ps) - len(list_distinct(t.ps)) AS DOUBLE)
      |      / len(t.ps) AS dup_para_frac,
      |    ${frac("list_sum(list_transform(t.ls, x -> length(x)))" +
                 " - list_sum(list_transform(list_distinct(t.ls), x -> length(x)))")}
      |      AS dup_line_char_frac,
      |    ${frac("list_sum(list_transform(t.ps, x -> length(x)))" +
                 " - list_sum(list_transform(list_distinct(t.ps), x -> length(x)))")}
      |      AS dup_para_char_frac,
      |    ${frac("COALESCE(tc2.best, 0)")} AS top2,
      |    ${frac("COALESCE(tc3.best, 0)")} AS top3,
      |    ${frac("COALESCE(tc4.best, 0)")} AS top4,
      |    ${frac("COALESCE(rd5.dup, 0)")} AS dup5,
      |    ${frac("COALESCE(rd6.dup, 0)")} AS dup6,
      |    ${frac("COALESCE(rd7.dup, 0)")} AS dup7,
      |    ${frac("COALESCE(rd8.dup, 0)")} AS dup8,
      |    ${frac("COALESCE(rd9.dup, 0)")} AS dup9,
      |    ${frac("COALESCE(rd10.dup, 0)")} AS dup10
      |  FROM t
      |  LEFT JOIN tc2 USING (doc_id) LEFT JOIN tc3 USING (doc_id)
      |  LEFT JOIN tc4 USING (doc_id) LEFT JOIN rd5 USING (doc_id)
      |  LEFT JOIN rd6 USING (doc_id) LEFT JOIN rd7 USING (doc_id)
      |  LEFT JOIN rd8 USING (doc_id) LEFT JOIN rd9 USING (doc_id)
      |  LEFT JOIN rd10 USING (doc_id)),
      |rp AS (SELECT doc_id,
      |    (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
      |      AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
      |      AND top2 <= 0.20 AND top3 <= 0.18 AND top4 <= 0.16
      |      AND dup5 <= 0.15 AND dup6 <= 0.14 AND dup7 <= 0.13
      |      AND dup8 <= 0.12 AND dup9 <= 0.11 AND dup10 <= 0.10) AS pass_r
      |  FROM rs),
      |ksel AS (SELECT doc_id, page,
      |    list_filter(string_split(page, chr(10)), l ->
      |      regexp_matches(rtrim(l), '[.!?"]$$')
      |      AND len(string_split_regex(trim(l), ' +')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS ks
      |  FROM t),
      |kp AS (SELECT doc_id,
      |    ((len(tc) - len(regexp_replace(tc, '[.!?]', '', 'g')) >= 3)
      |      AND NOT contains(lower(page), 'lorem ipsum')
      |      AND NOT contains(page, '{')
      |      AND NOT list_contains(
      |        string_split_regex(lower(page), '[^a-z0-9]+'), 'verboten')
      |    ) AS keep
      |  FROM (SELECT doc_id, page,
      |          coalesce(array_to_string(ks, chr(10)), '') AS tc FROM ksel)),
      |per AS (SELECT t.source,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(list_filter(t.w, x -> len(x) > 0))) AS BIGINT)
      |      AS n_tokens,
      |    CAST(SUM(t.nc) AS BIGINT) AS n_chars,
      |    CAST(SUM(CASE WHEN qp.pass_q THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_pass_gopher,
      |    CAST(SUM(CASE WHEN rp.pass_r THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_pass_repetition,
      |    CAST(SUM(CASE WHEN kp.keep THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_keep_c4
      |  FROM t JOIN qp USING (doc_id) JOIN rp USING (doc_id)
      |         JOIN kp USING (doc_id)
      |  GROUP BY t.source),
      |nums AS (
      |  SELECT * FROM per
      |  UNION ALL
      |  SELECT '__total__',
      |    CAST(SUM(n_docs) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT),
      |    CAST(SUM(n_chars) AS BIGINT), CAST(SUM(n_pass_gopher) AS BIGINT),
      |    CAST(SUM(n_pass_repetition) AS BIGINT),
      |    CAST(SUM(n_keep_c4) AS BIGINT)
      |  FROM per)
      |SELECT source, n_docs, n_tokens, n_chars,
      |  CAST(n_tokens AS DOUBLE)/n_docs AS mean_doc_tokens,
      |  n_pass_gopher, n_pass_repetition, n_keep_c4,
      |  CAST(n_pass_gopher AS DOUBLE)/n_docs AS gopher_pass_rate,
      |  CAST(n_pass_repetition AS DOUBLE)/n_docs AS repetition_pass_rate,
      |  CAST(n_keep_c4 AS DOUBLE)/n_docs AS c4_keep_rate
      |FROM nums
      |ORDER BY source""".stripMargin
}
