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
}
