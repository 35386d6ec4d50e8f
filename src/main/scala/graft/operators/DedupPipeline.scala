package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data deduplication pipeline — the single
  * entry point a corpus-curation job calls (previously this composition
  * lived only in the stress harness). Standard order, standard reasons:
  *
  *  1. EXACT dedup first (md5 hash-groupBy): web-scale corpora are
  *     mostly byte-identical copies; collapsing them first means the
  *     quadratic-ish near-dup stage never pays pair cost inside exact
  *     groups.
  *  2. NEAR-DUP candidate pairs over the exact representatives only
  *     ([[NgramDedup.scalablePairs]]: df-capped shingle blocking, exact
  *     Jaccard verification — never all-pairs).
  *  3. Connected components over the verified pairs
  *     ([[DedupClusters.connectedComponents]]: min-label propagation
  *     with pointer doubling, O(log diameter) rounds).
  *  4. One representative per cluster: the minimum doc id. Exact-group
  *     members inherit their representative's cluster, so `cluster_id`
  *     is the global minimum id of the merged exact+near cluster and
  *     `keep` is true for exactly that one document.
  *
  * Every input row comes back labeled — dropping rows would hide the
  * dedup rate; downstream filters on `keep`.
  */
object DedupPipeline {

  /** The full published curation recipe (Lee et al. 2021 run BOTH
    * levels): doc-level dedup ([[dedup]] — exact → near-dup → CC →
    * keeper) THEN exact-substring span excision over the keepers
    * ([[SpanDup.spanDedup]]). Doc-level removal cannot see a verbatim
    * paragraph shared by otherwise-distinct pages; span-level removal
    * alone would shred near-duplicate documents token-by-token instead
    * of dropping them — the recipe needs both, in this order (the span
    * stage runs over keepers only, so a 10-copy cluster contributes ONE
    * document's spans, not ten; running spans first would flag every
    * window of every copy).
    *
    * Returns one row per INPUT document: (idCol, cluster_id, keep,
    * textCol, n_tokens, removed_tokens). Keepers carry their
    * span-excised text and the excision accounting; dropped duplicates
    * keep their ORIGINAL text with removed_tokens 0 (labeled, not
    * destroyed — the same honesty convention as [[dedup]]; downstream
    * filters on `keep`). `spanWindow`/`spanMinDupCount` are
    * [[SpanDup.spanDedup]]'s knobs. ≡-composition spec'd: this equals
    * running [[dedup]], filtering to keepers, and spanDedup over them
    * (DedupPipelineSpec), and [[dedup]]'s own contract is untouched.
    *
    * Scale shape: adds exactly [[SpanDup.spanDedup]]'s stages (one
    * keyed fingerprint pass bounded by actual duplication, two per-doc
    * folds) over the keeper subset, plus two keyed joins to relabel —
    * nothing single-partition, nothing corpus-buffered.
    *
    * `lineMinDocs ≥ 2` opts in a LINE-level boilerplate stage
    * ([[LineDedup.dedupLines]]) BEFORE the document level — the CCNet
    * order (Wenzek et al. 2020 dedup lines first): two pages differing
    * only in nav/footer chrome become byte-identical once the chrome is
    * gone, so exact dedup catches what it would otherwise miss, and the
    * span stage never wastes windows on boilerplate. All downstream
    * stages (hashing, shingles, spans, n_tokens) see the CLEANED text;
    * non-keepers carry their cleaned (not raw) text back, consistent
    * with every stage after the opt-in operating on it. 0 = off. */
  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.8, maxDf: Int = 1000,
      spanWindow: Int = 50, spanMinDupCount: Long = 2L,
      lineMinDocs: Long = 0L, lineMinChars: Int = 1): DataFrame = {
    require(lineMinDocs == 0L || lineMinDocs >= 2L,
      s"lineMinDocs $lineMinDocs must be 0 (off) or >= 2 (LineDedup's floor)")
    val id = col(idCol)
    // the line stage's lineage (posexplode -> distinct-doc count ->
    // flagged join -> per-doc rebuild) feeds THREE consumers below
    // (labels, keepers, the final relabel join); checkpoint it once so
    // it computes once — the DedupClusters/SemDedup lineage convention
    // (same pattern measured 4-6x there). Off = passthrough projection,
    // nothing to save.
    val base = if (lineMinDocs >= 2L)
      LineDedup.dedupLines(docs, lineMinDocs, idCol, textCol, lineMinChars)
        .select(id, col(textCol)).localCheckpoint()
    else docs.select(id, col(textCol))
    val labels = dedup(base, idCol, textCol, threshold, maxDf)
    val keepers = base
      .join(labels.filter(col("keep")).select(id), Seq(idCol))
      .select(id, col(textCol))
    val excised = SpanDup.spanDedup(keepers, spanWindow, spanMinDupCount,
        idCol, textCol)
      .select(id, col(textCol).as("_sp_text"),
        col("n_tokens").as("_sp_n"), col("removed_tokens").as("_sp_rm"))
    base
      .join(labels.select(id, col("cluster_id"), col("keep")), Seq(idCol))
      .join(excised, Seq(idCol), "left")
      .select(id, col("cluster_id"), col("keep"),
        coalesce(col("_sp_text"), col(textCol)).as(textCol),
        coalesce(col("_sp_n"),
          size(filter(split(col(textCol), " "), w => length(w) > 0))
            .cast("long")).as("n_tokens"),
        coalesce(col("_sp_rm"), lit(0L)).as("removed_tokens"))
  }

  /** (id, cluster_id, keep) for every input document. */
  def dedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxDf: Int = 1000): DataFrame = {
    val id = col(idCol)
    // 1. exact groups -> per-doc exact representative (min id)
    val hashed = docs.select(id, col(textCol), md5(col(textCol)).as("_h"))
    val exactRep = hashed.groupBy(col("_h")).agg(min(id).as("_rep"))
    val mapped = hashed.join(exactRep, Seq("_h"))
      .select(id, col(textCol), col("_rep"))
    // 2. shingle the representatives only
    val reps = mapped.filter(id === col("_rep")).select(id, col(textCol))
    val shingled = reps
      .select(id, split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(id, explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
    val pairs = NgramDedup.scalablePairs(shingled, idCol, threshold, maxDf)
    // 3. near-dup components over representatives
    val comps = DedupClusters.connectedComponents(pairs, "id_a", "id_b")
    // 4. docs inherit their representative's component; min-label CC
    // means cluster_id is the global min id of the merged cluster
    mapped.join(comps, mapped("_rep") === comps("id"), "left")
      .select(id, coalesce(col("comp"), col("_rep")).as("cluster_id"))
      .withColumn("keep", id === col("cluster_id"))
  }
}
