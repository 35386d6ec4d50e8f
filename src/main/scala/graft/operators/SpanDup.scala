package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document SPAN duplication — the signal behind exact substring
  * deduplication (Lee et al. 2021, "Deduplicating Training Data Makes
  * Language Models Better": web corpora carry verbatim multi-sentence
  * spans repeated across otherwise-distinct pages; doc-level dedup
  * (C1-C6) cannot see them). Every length-`window` word span is
  * fingerprinted; a span whose fingerprint occurs ≥ `minDupCount`
  * times corpus-wide (intra-doc repeats count — the reference
  * formulation dedups within documents too) is DUPLICATED, and each
  * document reports how much of it is covered by duplicated spans —
  * the trim-or-drop signal a curation pipeline thresholds on.
  *
  * Scale shape: windows are a narrow ≤1-row-per-token fan-out (the
  * text_chunk explode shape); the fingerprint count is ONE
  * map-side-combinable keyed aggregation; flagged windows join back by
  * fingerprint (duplicated fingerprints only — the join's build side
  * shrinks to actual duplication, it is NOT corpus-sized on a clean
  * corpus); coverage is a per-document interval-union fold over that
  * doc's own flagged window starts — state bounded by the document's
  * window count, never the corpus. No stage is single-partition
  * (plan-audit spec).
  *
  * Fingerprints approximate the paper's suffix-array exactness: a
  * collision (≈2⁻⁶⁴ per pair) can flag a non-duplicated span, never
  * miss a duplicated one. Callers needing certainty verify flagged
  * spans by string compare within fingerprint groups downstream. TWO
  * fingerprint paths, spec'd to flag identical window sets on the real
  * corpus (the choice is cost/robustness, never semantics):
  *  - `rolling = true` (default): a Rabin-Karp rolling hash
  *    ([[org.apache.spark.sql.graft.RollingWindowFp]], codegen'd) —
  *    O(1) per position, each word hashed once; at window 50 that is
  *    ~50× less hashing on the one corpus-sized pass (measured at §6).
  *    Non-avalanching and adversarially collidable, like any
  *    polynomial fingerprint.
  *  - `rolling = false`: xxhash64 of the Sep-joined span — builtin,
  *    avalanching, O(window) per position. The path to pick when the
  *    corpus is adversarial (crafted collisions inflate flagged
  *    coverage; they still never cause a MISS).
  */
object SpanDup {

  private[operators] def wordsOf(textCol: String): Column =
    filter(split(col(textCol), " "), w => length(w) > 0)

  /** THE span frame both operators build on — (idCol, p, fp), one row
    * per span start — so the stats and the removal can never disagree
    * about what a span is (the prunedScan convention). Shared with
    * [[Contamination.spanDecontaminate]], whose flagged windows must
    * mean exactly what this operator's flagged windows mean. */
  private[operators] def spanFrame(docs: DataFrame, window: Int, idCol: String,
      textCol: String, rolling: Boolean): DataFrame = {
    require(window >= 1, s"window $window must be >= 1")
    val base = docs.select(col(idCol), wordsOf(textCol).as("_ws"))
      .filter(size(col("_ws")) >= window)
    if (rolling)
      base.select(col(idCol),
        posexplode(org.apache.spark.sql.graft.RollingWindowFp
          .rollingFp(col("_ws"), window)).as(Seq("p", "fp")))
        .select(col(idCol), col("p").cast("long").as("p"), col("fp"))
    else
      base.select(col(idCol),
        explode(sequence(lit(0), size(col("_ws")) - window)).as("p"),
        col("_ws"))
      .select(col(idCol), col("p").cast("long").as("p"),
        xxhash64(concat_ws(NgramLm.Sep,
          slice(col("_ws"), col("p") + 1, lit(window)))).as("fp"))
  }

  /** Per-document span-duplication coverage: (idCol, n_tokens,
    * dup_windows, dup_covered_tokens, dup_fraction). Documents shorter
    * than `window` words have no spans and report zero coverage;
    * `dup_fraction` is duplicated-token coverage over n_tokens (0 for
    * empty docs). */
  def spanDupStats(docs: DataFrame, window: Int = 50,
      minDupCount: Long = 2L, idCol: String = "doc_id",
      textCol: String = "text", rolling: Boolean = true): DataFrame = {
    require(minDupCount >= 2, s"minDupCount $minDupCount must be >= 2 — " +
      "1 would flag every span")
    val spans = spanFrame(docs, window, idCol, textCol, rolling)
    // corpus-wide duplicated fingerprints: keyed count, map-combined;
    // the surviving table is bounded by actual duplication
    val dups = spans.groupBy(col("fp")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minDupCount).select(col("fp"))
    // per-doc interval union over the doc's own sorted flagged starts:
    // each start covers [p, p+window); the fold's state is two numbers
    val perDoc = spans.join(dups, Seq("fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_windows"),
        array_sort(collect_list(col("p"))).as("_ps"))
      .withColumn("dup_covered_tokens",
        aggregate(col("_ps"),
          struct(lit(0L).as("tot"), lit(0L).as("until")),
          (acc, p) => struct(
            (acc.getField("tot") +
              greatest(lit(0L),
                p + window - greatest(acc.getField("until"), p))).as("tot"),
            greatest(acc.getField("until"), p + window).as("until")),
          acc => acc.getField("tot")))
      .select(col(idCol), col("dup_windows"), col("dup_covered_tokens"))
    // every input document appears, zero-covered when clean/short
    docs.select(col(idCol),
        size(wordsOf(textCol)).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_covered_tokens"), lit(0L)).as("dup_covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_covered_tokens"), lit(0L)).cast("double") /
            col("n_tokens")).otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** Variable-length MAXIMAL duplicated spans — the output shape of
    * the paper's suffix-array formulation (one row per maximal
    * duplicated region, not per fixed window): adjacent/overlapping
    * flagged windows merge into one span per document, reported as
    * (idCol, span_start, span_len, n_windows, min_occurrences).
    * `span_start`/`span_len` are word offsets/counts;
    * `min_occurrences` is the minimum corpus-wide occurrence count
    * over the span's windows — a LOWER bound on whole-span occurrences
    * (every window of the span occurs at least that often; the span
    * need not repeat as one unit). A span shorter than `window` words
    * is still invisible — the fixed-window floor is inherent to the
    * fingerprint approximation (object doc).
    *
    * Scale shape: identical to [[spanDupStats]] — the merge fold rides
    * the same per-document sorted-starts aggregation, now carrying
    * (start, count) pairs; the explode emits at most one row per
    * flagged window. */
  def spanDupSpans(docs: DataFrame, window: Int = 50,
      minDupCount: Long = 2L, idCol: String = "doc_id",
      textCol: String = "text", rolling: Boolean = true): DataFrame = {
    require(minDupCount >= 2, s"minDupCount $minDupCount must be >= 2 — " +
      "1 would flag every span")
    val spans = spanFrame(docs, window, idCol, textCol, rolling)
    val dups = spans.groupBy(col("fp")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minDupCount)
    val W = lit(window.toLong)
    spans.join(dups, Seq("fp"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("p"), col("_n")))).as("_pn"))
      .select(col(idCol), explode(aggregate(col("_pn"),
        array().cast("array<struct<f:bigint,u:bigint,nw:bigint,mn:bigint>>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1).getField("u") >= x.getField("p"),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(element_at(acc, -1).getField("f").as("f"),
              greatest(element_at(acc, -1).getField("u"),
                x.getField("p") + W).as("u"),
              (element_at(acc, -1).getField("nw") + 1L).as("nw"),
              least(element_at(acc, -1).getField("mn"),
                x.getField("_n")).as("mn")))))
          .otherwise(concat(acc, array(struct(x.getField("p").as("f"),
            (x.getField("p") + W).as("u"), lit(1L).as("nw"),
            x.getField("_n").as("mn"))))))).as("_iv"))
      .select(col(idCol),
        col("_iv").getField("f").as("span_start"),
        (col("_iv").getField("u") - col("_iv").getField("f")).as("span_len"),
        col("_iv").getField("nw").as("n_windows"),
        col("_iv").getField("mn").as("min_occurrences"))
  }

  /** [[spanDupSpans]] with EXACT whole-span occurrence counts — the
    * Lee et al. suffix-array output exactly, closing the documented
    * lower-bound gap: `min_occurrences` (every window of the span
    * occurs at least that often) stays, and `occurrences` reports how
    * many corpus positions carry the span's FULL word sequence
    * (including the span itself, so ≥ 1; always ≤ min_occurrences,
    * since a whole-span occurrence contributes one occurrence of every
    * constituent window).
    *
    * The second keyed pass: candidate positions are the flagged
    * occurrences of the span's FIRST window — a provable superset of
    * true occurrences (an occurrence's first window shares content,
    * hence fingerprint, with the span's first window, whose count
    * already cleared minDupCount) — verified by an xxhash64 content
    * hash of the exact word slice at the candidate. Both joins' build
    * sides are bounded by ACTUAL duplication (flagged occurrences ×
    * spans sharing a first window), the verify is O(span_len) per
    * candidate, and only documents containing flagged windows are ever
    * re-tokenized. Collision class unchanged: a collision can
    * OVER-count (≈2⁻⁶⁴ per pair), never miss. */
  def spanDupSpansExact(docs: DataFrame, window: Int = 50,
      minDupCount: Long = 2L, idCol: String = "doc_id",
      textCol: String = "text", rolling: Boolean = true): DataFrame = {
    val maximal = spanDupSpans(docs, window, minDupCount, idCol, textCol,
      rolling)
    val spans = spanFrame(docs, window, idCol, textCol, rolling)
    val dups = spans.groupBy(col("fp")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minDupCount).select(col("fp"))
    val flagged = spans.join(dups, Seq("fp")) // (idCol, p, fp)
    val words = docs
      .join(flagged.select(col(idCol)).distinct(), Seq(idCol))
      .select(col(idCol), wordsOf(textCol).as("_ws"))
    def sliceHash(ws: Column, start: Column, len: Column): Column =
      xxhash64(concat_ws(NgramLm.Sep,
        slice(ws, (start + 1L).cast("int"), len.cast("int"))))
    // span signature: first-window fp (the candidate join key) + the
    // content hash of the exact slice in the source document
    val sigs = maximal
      .join(flagged.select(col(idCol), col("p").as("span_start"),
        col("fp").as("_ffp")), Seq(idCol, "span_start"))
      .join(words, Seq(idCol))
      .select(col(idCol).as("_sid"), col("span_start"), col("span_len"),
        col("n_windows"), col("min_occurrences"), col("_ffp"),
        sliceHash(col("_ws"), col("span_start"), col("span_len")).as("_sig"))
    flagged.select(col(idCol).as("_cid"), col("p").as("_cp"),
        col("fp").as("_ffp"))
      .join(sigs, Seq("_ffp"))
      .join(words.select(col(idCol).as("_cid"), col("_ws")), Seq("_cid"))
      .filter(size(col("_ws")).cast("long") >= col("_cp") + col("span_len") &&
        sliceHash(col("_ws"), col("_cp"), col("span_len")) === col("_sig"))
      .groupBy(col("_sid"), col("span_start"), col("span_len"),
        col("n_windows"), col("min_occurrences"))
      .agg(count(lit(1)).as("occurrences"))
      .select(col("_sid").as(idCol), col("span_start"), col("span_len"),
        col("n_windows"), col("min_occurrences"), col("occurrences"))
  }

  /** Span REMOVAL — the paper's keep-first-occurrence excision: for
    * each duplicated fingerprint the globally-first occurrence (min
    * (doc, start) — deterministic, layout-independent) is the KEEPER;
    * every other occurrence's [p, p+window) token range is excised and
    * the document's text rebuilt from what remains. Returns every
    * input document as (idCol, text, n_tokens, removed_tokens) — text
    * unchanged and removed 0 for clean/short docs; n_tokens counts the
    * REMAINING words. Mid-sentence cuts are inherent to the published
    * approach (the dedup operates on token ranges, not sentences); a
    * keeper's own span can still lose tokens to a DIFFERENT
    * fingerprint's overlapping removal, exactly as with byte-range
    * suffix-array dedup.
    *
    * Scale shape, beyond [[spanDupStats]]: the keeper argmin is the
    * same keyed aggregation as the count (one pass produces both); the
    * rebuild is two per-document folds — sorted removal starts →
    * merged disjoint intervals, then intervals → the kept word slices
    * (O(len + intervals), cursor state only) — all builtin
    * higher-order expressions, state bounded by the document. */
  /** Fold 1 of the excision rebuild: sorted removal starts → merged
    * disjoint [f, u) intervals of fixed width `w` (touching ranges
    * merge — one continuous excision). Starts may be NEGATIVE (a
    * buffered caller clamps AFTER merging — clamping first would
    * break the fixed-width merge arithmetic); the fold is monotone in
    * the sorted order either way. Shared with
    * [[Contamination.spanDecontaminate]] — one definition of what an
    * excision is. */
  private[operators] def mergedIvs(starts: Column, w: Column): Column =
    aggregate(starts,
      array().cast("array<struct<f:bigint,u:bigint>>"),
      (acc, p) => when(
        size(acc) > 0 && element_at(acc, -1).getField("u") >= p,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(element_at(acc, -1).getField("f").as("f"),
            greatest(element_at(acc, -1).getField("u"), p + w).as("u")))))
        .otherwise(concat(acc, array(struct(p.as("f"), (p + w).as("u"))))))

  /** Fold 2 of the excision rebuild: disjoint sorted in-range
    * intervals → the kept words, a cursor walk emitting the
    * inter-interval slices (slice start is 1-based). */
  private[operators] def keptWords(ws: Column, ivs: Column): Column =
    aggregate(ivs,
      struct(array().cast("array<string>").as("kept"), lit(0L).as("cur")),
      (acc, iv) => struct(
        concat(acc.getField("kept"),
          slice(ws, (acc.getField("cur") + 1L).cast("int"),
            (iv.getField("f") - acc.getField("cur")).cast("int")))
          .as("kept"),
        iv.getField("u").as("cur")),
      acc => when(size(ws) > acc.getField("cur"),
        concat(acc.getField("kept"),
          slice(ws, (acc.getField("cur") + 1L).cast("int"),
            (size(ws) - acc.getField("cur")).cast("int"))))
        .otherwise(acc.getField("kept")))

  def spanDedup(docs: DataFrame, window: Int = 50,
      minDupCount: Long = 2L, idCol: String = "doc_id",
      textCol: String = "text", rolling: Boolean = true): DataFrame = {
    require(minDupCount >= 2, s"minDupCount $minDupCount must be >= 2 — " +
      "1 would excise every span")
    val spans = spanFrame(docs, window, idCol, textCol, rolling)
    // one keyed pass: occurrence count AND the keeper argmin per print
    val keepers = spans
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col(idCol).as("_kid"), col("p").as("_kp"))).as("_keep"))
      .filter(col("_n") >= minDupCount)
      .select(col("fp"), col("_keep"))
    val removeStarts = spans.join(keepers, Seq("fp"))
      .filter(!(col(idCol) === col("_keep").getField("_kid") &&
        col("p") === col("_keep").getField("_kp")))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("p"))).as("_starts"))

    val W = lit(window.toLong)
    docs.select(col(idCol), col(textCol), wordsOf(textCol).as("_ws"))
      .join(removeStarts, Seq(idCol), "left")
      .withColumn("_ivs", when(col("_starts").isNotNull,
        mergedIvs(col("_starts"), W)))
      .withColumn("_kept", when(col("_ivs").isNotNull,
        keptWords(col("_ws"), col("_ivs"))))
      .select(col(idCol),
        when(col("_kept").isNotNull, concat_ws(" ", col("_kept")))
          .otherwise(col(textCol)).as(textCol),
        when(col("_kept").isNotNull, size(col("_kept")))
          .otherwise(size(col("_ws"))).cast("long").as("n_tokens"),
        coalesce(aggregate(col("_ivs"), lit(0L),
          (acc, iv) => acc + iv.getField("u") - iv.getField("f")), lit(0L))
          .as("removed_tokens"))
  }
}
