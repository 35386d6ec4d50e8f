package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document LINE deduplication — boilerplate removal, the
  * line-granular member of the dedup family (C1-C8 are doc- and
  * span-level). Web pages repeat navigation text, cookie banners and
  * footers VERBATIM as whole lines across millions of otherwise-distinct
  * pages; the published curation recipes remove them at line
  * granularity: CCNet deduplicates hashed lines across shards (Wenzek
  * et al. 2020 §3.1) and RefinedWeb/MassiveText apply line-wise
  * filtering and dedup before doc-level MinHash (Penedo et al. 2023;
  * Rae et al. 2021). This differs from C8 span dedup in both unit and
  * rule: a LINE is flagged when its trimmed content appears in at least
  * `minDocs` DISTINCT documents, and then ALL its occurrences are
  * removed — boilerplate has no meaningful "first occurrence" to keep
  * (divergence from C8's keep-first excision, deliberate and per the
  * published recipes). Intra-document line repetition alone (a chat
  * log's repeated "ok") is NOT boilerplate and never flags here — E7
  * text_repetition measures that signal.
  *
  * Lines are compared by their TRIMMED content (an indented copy of a
  * footer is the same footer); removal excises the original line
  * verbatim. Lines whose trimmed length is below `minLineChars` are
  * never flagged — blank/separator lines are structure, not
  * boilerplate, and would otherwise match across every document.
  *
  * Scale shape (the SpanDup discipline): lines are a narrow posexplode
  * fan-out; the distinct-document count is ONE keyed aggregation (the
  * partial-distinct shape, map-combined per partition); flagged hashes
  * join back by fingerprint, so the join's build side is bounded by
  * ACTUAL boilerplate, never the corpus; the rebuild is a per-document
  * index filter over that doc's own lines — state bounded by the
  * document. No stage is single-partition. Fingerprints are xxhash64 of
  * the trimmed line: a collision (≈2⁻⁶⁴ per pair) can flag a
  * non-duplicated line, never miss a duplicated one — the SpanDup
  * collision class, documented there.
  */
object LineDedup {

  /** `sep` is used BOTH as the split pattern and the rejoin literal,
    * so it must be a metacharacter-free literal string ("\n" for
    * lines, "\n\n" for PARAGRAPHS — the RefinedWeb/MassiveText
    * paragraph-granular variant comes free through this one knob). */
  private def linesOf(textCol: String, sep: String): Column =
    split(col(textCol), java.util.regex.Pattern.quote(sep))

  /** (idCol, p, fp) — one row per CANDIDATE line (trimmed length ≥
    * minLineChars); the one frame stats and removal both build on, so
    * they can never disagree about what a line is (the SpanDup
    * spanFrame convention). */
  private def lineFrame(docs: DataFrame, idCol: String, textCol: String,
      minLineChars: Int, sep: String): DataFrame = {
    require(minLineChars >= 1, s"minLineChars $minLineChars must be >= 1")
    require(sep.nonEmpty, "sep must be non-empty")
    docs.select(col(idCol), posexplode(linesOf(textCol, sep)).as(Seq("p", "_l")))
      .filter(length(trim(col("_l"))) >= minLineChars)
      .select(col(idCol), col("p").cast("long").as("p"),
        xxhash64(trim(col("_l"))).as("fp"))
  }

  /** Fingerprints seen in ≥ minDocs distinct documents. */
  private def dupFps(lines: DataFrame, minDocs: Long, idCol: String): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2 — 1 would flag " +
      "every candidate line")
    lines.groupBy(col("fp"))
      .agg(count_distinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("fp"))
  }

  /** Per-document boilerplate coverage: (idCol, n_lines, dup_lines,
    * dup_fraction) — the drop-or-clean signal a pipeline thresholds on
    * (RefinedWeb drops documents past a duplicate-fraction cut).
    * `n_lines` counts ALL lines of the document (split on \n — one line
    * for empty text); `dup_lines` counts flagged candidate occurrences;
    * `dup_fraction` is their ratio. Every input document appears. */
  def lineDupStats(docs: DataFrame, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame =
    lineDupStatsAgainst(docs,
      boilerplateIndex(docs, minDocs, idCol, textCol, minLineChars, sep),
      idCol, textCol, minLineChars, sep)

  /** The boilerplate REPORT: the `k` most widespread flagged lines as
    * (line, n_docs, n_occurrences), ordered by (n_docs desc,
    * n_occurrences desc, line) — deterministic, layout-free. Keys on
    * the trimmed line CONTENT (the output needs the string; exactness
    * is free). Driver result is k rows — bounded by construction. */
  def topBoilerplate(docs: DataFrame, k: Int, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    require(minLineChars >= 1, s"minLineChars $minLineChars must be >= 1")
    docs.select(col(idCol), explode(linesOf(textCol, sep)).as("_l"))
      .select(col(idCol), trim(col("_l")).as("line"))
      .filter(length(col("line")) >= minLineChars)
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("line"))
      .limit(k)
  }

  /** The flagged-line fingerprint set as a STANDALONE frame — (fp),
    * one row per boilerplate line. Compute it ONCE on the big corpus
    * and apply to deltas with [[dedupLinesAgainst]] (O(delta) per
    * batch, the IncrementalDedup economics), persist it with [[save]],
    * or serve it online by running dedupLinesAgainst inside
    * foreachBatch (the G21 StreamingModelGate shape — the verdict for
    * a line depends only on the frozen index, so batch/online parity
    * is structural). Bounded by ACTUAL boilerplate, not the corpus. */
  def boilerplateIndex(docs: DataFrame, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame = {
    val lines = lineFrame(docs, idCol, textCol, minLineChars, sep)
    dupFps(lines, minDocs, idCol)
  }

  /** Line REMOVAL: every occurrence of every flagged line is excised
    * and the document rebuilt from its remaining lines (joined with
    * \n — lossless for what split preserved). Returns every input
    * document as (idCol, text, n_lines, removed_lines) — text VERBATIM
    * and removed 0 for untouched docs; `n_lines` counts the REMAINING
    * lines. */
  def dedupLines(docs: DataFrame, minDocs: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame =
    dedupLinesAgainst(docs,
      boilerplateIndex(docs, minDocs, idCol, textCol, minLineChars, sep),
      idCol, textCol, minLineChars, sep)

  /** [[lineDupStats]] against a FROZEN index — the coverage signal
    * (how boilerplate-laden is this batch?) for deltas and streams,
    * with the same frozen semantics as [[dedupLinesAgainst]]: a line
    * counts as duplicated iff the INDEX knows it. The RefinedWeb
    * drop-threshold applied per delta without rescanning the corpus. */
  def lineDupStatsAgainst(docs: DataFrame, index: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame = {
    val lines = lineFrame(docs, idCol, textCol, minLineChars, sep)
    val perDoc = lines
      .join(index.select(col("fp").cast("long").as("fp")).distinct(), Seq("fp"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("dup_lines"))
    docs.select(col(idCol),
        size(linesOf(textCol, sep)).cast("long").as("n_lines"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("dup_lines"), lit(0L)).as("dup_lines"),
        (coalesce(col("dup_lines"), lit(0L)).cast("double") /
          col("n_lines")).as("dup_fraction"))
  }

  /** [[dedupLines]] against a FROZEN index ((fp) rows — a
    * [[boilerplateIndex]] from another corpus, another time, or
    * [[load]]): lines matching the index excise; lines duplicated only
    * WITHIN `docs` do not flag — frozen-index semantics, what makes
    * delta application O(delta) and streaming service stateless.
    * `minLineChars` must match the index's build floor for exact
    * equivalence (a lower floor here can only excise more). */
  def dedupLinesAgainst(docs: DataFrame, index: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, sep: String = "\n"): DataFrame = {
    val lines = lineFrame(docs, idCol, textCol, minLineChars, sep)
    // defensive distinct: a duplicated index row would double-count
    // removed_lines through the join fan-out
    val removePos = lines
      .join(index.select(col("fp").cast("long").as("fp")).distinct(), Seq("fp"))
      .groupBy(col(idCol)).agg(collect_list(col("p")).as("_ps"))
    docs.select(col(idCol), col(textCol), linesOf(textCol, sep).as("_ls"))
      .join(removePos, Seq(idCol), "left")
      // index filter over the doc's own lines; O(lines × flagged) per
      // doc worst case, both factors document-bounded
      .withColumn("_kept", when(col("_ps").isNotNull,
        filter(col("_ls"), (l, i) =>
          !array_contains(col("_ps"), i.cast("long")))))
      .select(col(idCol),
        when(col("_kept").isNotNull,
          concat_ws(sep, col("_kept")))
          .otherwise(col(textCol)).as(textCol),
        when(col("_kept").isNotNull, size(col("_kept")))
          .otherwise(size(col("_ls"))).cast("long").as("n_lines"),
        coalesce(size(col("_ps")), lit(0)).cast("long").as("removed_lines"))
  }

  /** Persist a [[boilerplateIndex]] durably on the [[ModelStore]]
    * `_meta` atomic-commit convention (writer-locked, keep-two
    * retention) — the QualityClassifier.save twin for the line index.
    * The row count is validated against the WRITTEN files and recorded
    * in the meta, so a torn table fails the next [[load]] loudly. */
  def save(index: DataFrame, path: String): Unit = {
    val spark = index.sparkSession
    ModelStore.withLock(spark, path, "line boilerplate index") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "fps")
      index.select(col("fp").cast("long").as("fp")).distinct()
        .write.mode("overwrite").parquet(dir)
      val n = spark.read.parquet(dir).count()
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "line_boilerplate", "gen" -> g.toString,
        "nFps" -> n.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed index: the (fp) frame [[dedupLinesAgainst]]
    * takes, lazily over the committed generation's parquet, row count
    * cross-checked against the meta. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "line boilerplate index")
    ModelStore.checkKind(kv, path, "line_boilerplate", "1")
    val df = spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "fps"))
    val n = df.count()
    require(n == kv("nFps").toLong,
      s"line boilerplate index at $path is torn: ${kv("nFps")} fingerprints " +
        s"committed, $n readable — re-save")
    df
  }
}
