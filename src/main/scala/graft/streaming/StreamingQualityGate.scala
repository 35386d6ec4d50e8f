package graft.streaming

import graft.operators.QualityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online corpus-quality gating (SURVEY §2 G11) — the streaming
  * counterpart of `QualityOps.quality_gopher` (E11). The rules are
  * row-local (per-document token statistics, no aggregation), so the
  * operator is STATELESS BY CONSTRUCTION: no watermark, no state store,
  * verdicts emit in the arrival micro-batch — the same shape as
  * StreamingContamination (G10).
  *
  * Parity with batch is structural, not re-implemented: both paths call
  * `QualityOps.qualityFlags`, ONE expression tree, so a threshold change
  * lands in batch and online simultaneously (the drift class the G7
  * banding unification killed is impossible here by design).
  */
object StreamingQualityGate {

  /** All documents with their per-rule flags. `docs` may be a streaming
    * DataFrame with (doc_id, text). */
  def flags(docs: DataFrame): DataFrame = QualityOps.qualityFlags(docs)

  /** Only the documents that clear every rule — the keep-side of the
    * curation pipeline. */
  def passing(docs: DataFrame): DataFrame = flags(docs).filter(col("pass"))

  /** Only the rejected documents with the reason flags — the audit side. */
  def rejected(docs: DataFrame): DataFrame = flags(docs).filter(!col("pass"))
}
