package graft.streaming

import graft.operators.{LineDedup, NgramLm, QualityClassifier}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Online MODEL-based gating — the streaming serving path for the two
  * durable model artifacts the curation pipeline learns: the n-gram-LM
  * perplexity filter (E23, CCNet's tier) and the learned quality
  * classifier (E24, GPT-3's tier). The rule gates stream as pure
  * row-local expressions (G11); a model gate instead needs a
  * model-table join and a per-document fold, so its honest streaming
  * shape is `foreachBatch`: the model loads ONCE at query start
  * (lazy frames over the committed artifact generation), and every
  * micro-batch runs THE batch operator as a batch job — parity with
  * offline scoring is structural (one implementation), state across
  * batches is zero (a document's verdict depends only on its own text
  * and the frozen model), and no watermark is involved.
  *
  * This is the repo's G11 drift argument applied to models: batch and
  * online cannot disagree because they are the same code — and the
  * artifact layer (ModelStore `_meta` commits) guarantees the model
  * under a running query stays readable across ONE concurrent re-save
  * (keep-two retention), after which the operator restarts on the new
  * generation by reloading.
  *
  * At scale: each micro-batch pays the batch operator's plan — a
  * broadcast-or-shuffle model join plus one keyed fold per document —
  * sized by the BATCH, never by history. The model frames are
  * vocabulary/dim-bounded, loaded lazily from parquet, so executors
  * fetch them via the usual broadcast machinery per batch.
  */
object StreamingModelGate {

  /** Gate a streaming (idCol, textCol) frame with a [[QualityClassifier]]
    * model: every micro-batch is scored by the batch operator and passed
    * to `sink` as (idCol, n_grams, log_odds, prob, keep) — `keep` by the
    * deterministic Pareto rule (seeded, so a replayed batch reproduces
    * its verdicts bit-for-bit; exactly-once sinks stay idempotent).
    * Start with `.start()` on the returned writer. */
  def classifier(docs: DataFrame, model: DataFrame,
      paretoAlpha: Double = 9.0, seed: Long = 0L,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 1.0, broadcastModel: Boolean = true)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val scored = QualityClassifier.score(batch.toDF(), model, idCol,
        textCol, alpha, broadcastModel)
      sink(QualityClassifier.paretoKeep(scored, paretoAlpha, idCol, "prob",
        seed), batchId)
    }

  /** Gate a streaming (idCol, textCol) frame with an [[NgramLm]] model:
    * every micro-batch is scored by the batch operator and passed to
    * `sink` as (idCol, n_tokens, log_prob, avg_log_prob, ppl, keep) —
    * `keep` = ppl ≤ maxPpl, the CCNet low-perplexity cut. */
  def perplexity(docs: DataFrame, model: DataFrame, maxPpl: Double,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 0.4, broadcastModel: Boolean = true)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(maxPpl > 0, s"maxPpl $maxPpl must be > 0")
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val scored = NgramLm.score(batch.toDF(), model, idCol, textCol,
        alpha, broadcastModel)
      sink(scored.withColumn("keep", col("ppl") <= lit(maxPpl)), batchId)
    }
  }

  /** Clean a streaming (idCol, textCol) frame against a FROZEN line
    * boilerplate index (C9 [[LineDedup.boilerplateIndex]], typically
    * [[LineDedup.load]]ed): every micro-batch runs the batch operator
    * and passes (idCol, textCol, n_lines, removed_lines) to `sink`. A
    * document's cleaned form depends only on its own text and the
    * frozen index — zero cross-batch state, replays reproduce
    * bit-for-bit, and lines duplicated only WITHIN the stream never
    * excise (frozen-index semantics, exactly the batch contract). */
  def lines(docs: DataFrame, index: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineChars: Int = 1)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(LineDedup.dedupLinesAgainst(batch.toDF(), index, idCol, textCol,
        minLineChars), batchId)
    }
}
