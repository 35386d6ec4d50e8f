package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MojibakeExpr.fixMojibake

/** E37: encoding repair — the stage BEFORE the first text gate. Web
  * crawls carry a steady fraction of mojibake (UTF-8 bytes mis-decoded
  * as Latin-1/Windows-1252 somewhere upstream: "cafÃ©", "donâ€™t",
  * "â€” and â€¦ everywhere"), and every downstream signal misreads it —
  * tokenizers mint garbage types, language ID sees spurious
  * non-ASCII, dedup keys diverge for texts that are the same sentence.
  * ftfy (Speer 2019) is the published fix; [[fixMojibake]] is its
  * `fix_encoding` core as the repo's THIRD native codegen'd expression
  * (the StripAccents/VecDot precedent — a scalar UDF would box per row
  * and break whole-stage codegen for the chain this runs inside), with
  * the conservative all-or-nothing acceptance rule pinned in
  * MojibakeFunctions.scala: under-repair, never over-repair.
  *
  * Ordering contract with its neighbors, following ftfy's own
  * pipeline: repair runs BEFORE [[HtmlExtract]] only when entities
  * were double-corrupted, and always before [[TextNorm]] — the E34
  * key chain folds accents, so "cafÃ©" and "café" produce DIFFERENT
  * keys unless repair runs first ("cafÃ©" normalizes to "cafa©";
  * repaired first it is "café" → "cafe" — the spec pins this
  * composition).
  *
  * Scale shape: one row-local projection, zero exchange,
  * stream-transparent (the rule-gate convention). [[repairStats]] adds
  * one map-side-combinable global agg for the dataset-card counters.
  */
object TextRepair {

  /** The repair as a Column. */
  def fixedCol(c: Column): Column = fixMojibake(c)

  /** Every row back with `text_fixed` + `was_mojibake` (the routing
    * flag: repaired docs are the ones whose every downstream feature
    * just changed — a pipeline re-scoring only those pays O(repaired),
    * the flagged-join discipline). */
  def fixEncoding(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_fixed", fixedCol(col(textCol)))
      .withColumn("was_mojibake", col("text_fixed") =!= col(textCol))

  /** Corpus counters for the dataset card: docs repaired, docs still
    * carrying the classic markers after repair (double-encoded beyond
    * the 3-round cap, or mixed text the all-or-nothing rule vetoed —
    * the honest residue, counted not hidden), and total docs. */
  def repairStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val fixed = fixedCol(col(textCol))
    val marker = fixed.contains("Ã") || fixed.contains("â€") ||
      fixed.contains("ï¿½")
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(when(fixed =!= col(textCol), 1L).otherwise(0L)).as("n_repaired"),
      sum(when(marker, 1L).otherwise(0L)).as("n_residual_markers"))
  }
}
