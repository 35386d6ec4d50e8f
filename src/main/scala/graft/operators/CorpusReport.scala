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
  * Scale shape: each signal family is one row-local projection over
  * the corpus followed by one groupBy(source) whose partials collapse
  * map-side — the shuffle carries sources × partitions aggregate rows,
  * never documents; the text column never crosses an exchange. The
  * per-source frames (sources rows each) then broadcast-join into one
  * card. The corpus is scanned once per family (three rule families +
  * the volume scan) — persist the input upstream if scan cost
  * dominates; folding the families into one projection would trade the
  * shared rule-core definitions for a scan, the wrong side of the G11
  * argument. Duplication is estimated with HLL approx-distinct over
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

  def report(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      c4Blocklist: Seq[String] = Seq.empty): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol) &&
      docs.columns.contains(srcCol),
      s"docs needs ($idCol, $textCol, $srcCol)")
    // the cores key on an opaque doc_id: pack (id, source) so source
    // survives without a join-back
    val packed = docs.select(
      struct(col(idCol).as("id"), col(srcCol).as("src")).as("doc_id"),
      col(textCol).as("text"))
    val src = col("doc_id").getField("src").as("source")

    val vol = packed.groupBy(src).agg(
      count(lit(1)).as("n_docs"),
      sum(size(filter(split(col("text"), " "), w => length(w) > 0))
        .cast("long")).as("n_tokens"),
      sum(length(col("text")).cast("long")).as("n_chars"),
      // rsd 0.01: ~8 KiB of HLL registers per source — still O(1)
      // state, tight enough that the card's duplication column is
      // decision-grade (the default 5% rsd can misstate a 10%-dup
      // source as clean)
      approx_count_distinct(xxhash64(col("text")), 0.01)
        .as("distinct_text_est"))
    val gop = QualityOps.qualityFlags(packed).groupBy(src).agg(
      sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass_gopher"))
    val rep = GopherRepetition.repetitionFlags(packed).groupBy(src).agg(
      sum(when(col("pass_repetition"), 1L).otherwise(0L)).as("n_pass_repetition"))
    val c4 = C4Filters.c4Clean(packed, blocklist = c4Blocklist)
      .groupBy(src).agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep_c4"))

    // numerator frame: sources rows — broadcast joins, exact total row
    // recombined from numerators before any rate is computed
    val perSource = vol
      .join(broadcast(gop), Seq("source"))
      .join(broadcast(rep), Seq("source"))
      .join(broadcast(c4), Seq("source"))
    val total = perSource.groupBy(lit(TotalRow).as("source")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      // HLL registers don't re-merge through this sum; the total
      // distinct estimate is the per-source sum — exact when sources
      // don't share texts, an upper bound otherwise (documented)
      sum(col("distinct_text_est")).as("distinct_text_est"),
      sum(col("n_pass_gopher")).as("n_pass_gopher"),
      sum(col("n_pass_repetition")).as("n_pass_repetition"),
      sum(col("n_keep_c4")).as("n_keep_c4"))

    perSource.unionByName(total)
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
  }
}
