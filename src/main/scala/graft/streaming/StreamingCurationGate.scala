package graft.streaming

import graft.operators.{LineDedup, NgramLm, QualityOps}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The COMPOSED online curation gate — the published cleaning order
  * (CCNet: dedup lines first, then filter; Wenzek et al. 2020 §3) as
  * ONE foreachBatch: frozen-index line clean (G21's line gate) → rule
  * gate over the CLEANED text (G11/E11 Gopher rules — chrome must not
  * count against a page's word stats) → perplexity model gate (E23)
  * over the cleaned text, conjoined into a single `keep` verdict with
  * every stage's evidence kept as columns for the audit side.
  *
  * One micro-batch pays exactly the three batch operators, sized by
  * the batch: the line stage is a flagged-hash join bounded by actual
  * boilerplate, the rule gate is row-local expressions, the model gate
  * one model join + per-doc fold. Zero cross-batch state — every
  * verdict is a pure function of (the document's text, the frozen
  * index, the frozen model) — so replays reproduce bit-for-bit and
  * arbitrary arrival splits cannot change a verdict (spec'd against
  * the batch path). The E24 classifier tier composes the same way
  * (StreamingModelGate.classifier on the kept side) when a learned
  * classifier follows the perplexity cut.
  *
  * A document whose every line is boilerplate cleans to EMPTY text:
  * the rule gate fails it (zero words) and the model gate reports a
  * null ppl (NgramLm's empty-doc convention) — it appears in the
  * output with keep = false, never silently vanishes.
  */
object StreamingCurationGate {

  /** The batch composition — also the offline comparator the streaming
    * parity spec pins against. Output: (idCol, textCol cleaned,
    * n_lines, removed_lines, rule_pass, ppl, keep) with
    * keep = rule_pass ∧ (ppl ≤ maxPpl), null ppl failing closed. */
  def verdicts(batch: DataFrame, index: DataFrame, model: DataFrame,
      maxPpl: Double, idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, alpha: Double = 0.4,
      broadcastModel: Boolean = true): DataFrame = {
    require(maxPpl > 0, s"maxPpl $maxPpl must be > 0")
    val cleaned = LineDedup.dedupLinesAgainst(batch, index, idCol, textCol,
      minLineChars)
    // downstream operators speak (doc_id, text); rename in, rename out
    val canon = cleaned.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col("n_lines"), col("removed_lines"))
    val flags = QualityOps.qualityFlags(canon.select("doc_id", "text"))
      .select(col("doc_id"), col("pass").as("rule_pass"))
    val ppl = NgramLm.score(canon.select("doc_id", "text"), model,
        "doc_id", "text", alpha, broadcastModel)
      .select(col("doc_id"), col("ppl"))
    canon
      .join(flags, Seq("doc_id"))
      .join(ppl, Seq("doc_id"), "left") // empty-cleaned docs: null ppl
      .withColumn("keep",
        col("rule_pass") && coalesce(col("ppl") <= lit(maxPpl), lit(false)))
      .select(col("doc_id").as(idCol), col("text").as(textCol),
        col("n_lines"), col("removed_lines"), col("rule_pass"), col("ppl"),
        col("keep"))
  }

  /** The streaming form: every micro-batch runs [[verdicts]] and hands
    * the result to `sink`. Start with `.start()`. */
  def gate(docs: DataFrame, index: DataFrame, model: DataFrame,
      maxPpl: Double, idCol: String = "doc_id", textCol: String = "text",
      minLineChars: Int = 1, alpha: Double = 0.4,
      broadcastModel: Boolean = true)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(maxPpl > 0, s"maxPpl $maxPpl must be > 0")
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(verdicts(batch.toDF(), index, model, maxPpl, idCol, textCol,
        minLineChars, alpha, broadcastModel), batchId)
    }
  }
}
