package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StripAccentsExpr.stripAccents

/** E34: dedup-key text normalization — the CCNet recipe (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data" §3.1/text_normalizer: paragraphs are hashed AFTER
  * lowercasing, accent folding, digit unification and non-printing
  * removal, so trivially-different copies — "Page 1 of 4" vs "Page 2
  * of 4", "café" vs "cafe" — deduplicate as one). The reference repo
  * stores and serves exact values only (models.py:25-42); this is the
  * curation-stack normalization every published dedup pipeline runs
  * before its exact tier.
  *
  * The pinned chain, in order (each step motivated by what it merges):
  *   1. lowercase                  — case variants
  *   2. accent fold                — NFD, drop Mn marks ([[stripAccents]],
  *                                   the codegen'd expression; CJK and
  *                                   undecomposable letters untouched)
  *   3. digits → '0'               — page numbers, dates, counters
  *                                   ([0-9] explicitly: Unicode digit
  *                                   classes vary by regex engine, and
  *                                   cross-engine reproducibility is a
  *                                   design goal of every key in this
  *                                   repo — the md5-bucket precedent)
  *   4. strip non-printing (\p{C}) — invisible variation (zero-widths,
  *                                   control chars, BOM)
  *   5. collapse whitespace runs to one space — layout variation
  *   6. trim                       — edge whitespace, including what
  *                                   steps 4-5 may have exposed there
  *
  * Two orderings are load-bearing and spec-pinned: control-stripping
  * precedes whitespace collapse (a control char inside a space run
  * would otherwise split the run in two), and trim runs LAST (a
  * trailing control char becomes a trailing space under 4-5; trimming
  * first would leave it, and the chain would not be idempotent). With
  * that order the chain IS idempotent — its image is its own fixed
  * point — which the dedup composition relies on: normalizing an
  * already-normalized key never creates a new identity.
  *
  * NORMALIZATION IS FOR KEYS, NOT CONTENT: the normalized form decides
  * duplicate identity; the KEPT text is always the original (the
  * LineDedup/SpanDup convention — curation never rewrites survivors).
  * [[dedupNormalized]] composes exactly like `Dedup.exact` but groups
  * on the normalized hash.
  *
  * Scale shape: steps 1/3/4/5 are built-in codegen'd string functions,
  * step 2 the native expression — one row-local projection, zero
  * exchange, stream-transparent as-is.
  */
object TextNorm {

  /** The normalization chain as a Column over a string column. */
  def normalizeCol(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            stripAccents(lower(c)),
            "[0-9]", "0"),
          "\\p{C}", ""),
        "\\s+", " "))

  /** (input columns..., text_norm). */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("text_norm", normalizeCol(col(textCol)))

  /** 64-bit normalized dedup key (xxhash64 of the normalized text —
    * the SpanDup/MinHash fingerprint-width convention; the 2⁻⁶⁴
    * collision class can merge two distinct docs, never split a
    * duplicate pair). */
  def normKey(c: Column): Column = xxhash64(normalizeCol(c))

  /** Exact dedup on the NORMALIZED key: one representative (min id)
    * per normalized-identity cluster with its copy count — the
    * `dedup_exact` output shape, but merging case/accent/digit/layout
    * variants. One hash-partitioned groupBy on an 8-byte key; the
    * kept id's text is the ORIGINAL, untouched. */
  def dedupNormalized(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), normKey(col(textCol)).as("norm_key"))
      .groupBy(col("norm_key"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Gated harness entry: the whole chain against ground truth, on the
    * NORMALIZED TEXT rather than the 64-bit key (xxhash64 is
    * Spark-internal; the text itself is the engine-independent form).
    * The ASCII corpus carries none of the variation the chain exists
    * to merge, so the query derives it (the url_gate precedent): each
    * doc contributes its original text plus a variant copy — upper-
    * cased (≡0 mod 2), accent-injected `a`→`á` (≡0 mod 3),
    * space-doubled (≡0 mod 7), a trailing control char (≡0 mod 5) —
    * and the pair gets the CCNet motivating suffix (" Page 1 of 4" vs
    * " Page 2 of 4", merged by digit unification). Grouping on the
    * normalized text must merge every variant with its original
    * (n_copies ≥ 2, keep_id = the original id); the DuckDB oracle
    * re-derives the variants and re-runs the chain with its own
    * lower/strip_accents/regexp engine, so lowercase, NFD accent
    * folding, digit unification, \p{C} stripping, whitespace collapse
    * and trim order are all independently confirmed. */
  def normClean(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documentsSpread(spark, d).select(col("doc_id"), col("text"))
    val orig = docs.select(col("doc_id"),
      concat(col("text"), lit(" Page 1 of 4")).as("t"))
    val variant = docs
      .withColumn("_v", when(col("doc_id") % 2 === 0, upper(col("text")))
        .otherwise(col("text")))
      .withColumn("_vv", when(col("doc_id") % 3 === 0,
        expr("replace(_v, 'a', 'á')")).otherwise(col("_v")))
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(
          when(col("doc_id") % 7 === 0,
            expr("replace(_vv, ' ', '  ')")).otherwise(col("_vv")),
          lit(" Page 2 of 4"),
          when(col("doc_id") % 5 === 0, lit("\u0001")).otherwise(lit("")))
          .as("t"))
    orig.unionAll(variant)
      .groupBy(normalizeCol(col("t")).as("text_norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  val normCleanSql: String =
    """WITH rows_ AS (
      |  SELECT doc_id, text || ' Page 1 of 4' AS t FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    (CASE WHEN doc_id % 7 = 0 THEN replace(vv, ' ', '  ') ELSE vv END)
      |    || ' Page 2 of 4'
      |    || (CASE WHEN doc_id % 5 = 0 THEN chr(1) ELSE '' END) AS t
      |  FROM (SELECT doc_id,
      |          CASE WHEN doc_id % 3 = 0 THEN replace(v, 'a', 'á') ELSE v END AS vv
      |        FROM (SELECT doc_id,
      |                CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END AS v
      |              FROM documents) a) b)
      |SELECT
      |  trim(regexp_replace(regexp_replace(regexp_replace(
      |         strip_accents(lower(t)), '[0-9]', '0', 'g'),
      |       '\p{C}', '', 'g'), '\s+', ' ', 'g')) AS text_norm,
      |  min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM rows_
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("norm_clean" -> normClean _)

  val oracles: Map[String, String] = Map(
    "norm_clean" -> normCleanSql)
}
