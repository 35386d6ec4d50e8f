package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.registry.ValueStoreFormat

/** Streaming CDC apply — the online twin of the G30 MERGE verb: a
  * stream of correction rows (the value store's long format —
  * late-arriving fixes, backfill corrections, upstream restatements)
  * merged into the store per micro-batch through
  * [[ValueStoreFormat.merge]].
  *
  * The foreachBatch shape (the G21/G28 convention): the per-batch body
  * IS the batch-mode merge path — one definition, structural
  * batch/online parity. Per batch:
  *
  *   1. COLLAPSE the batch to the latest row per
  *      (feature_name, version, entity_id) — a CDC stream may carry
  *      several corrections for one entity in one batch, and MERGE's
  *      duplicate-key guard is (rightly) loud; latest-wins is decided
  *      by `computed_at` with the max-struct tie rule, the repo's
  *      keeper convention. Batch-sized aggregation, never
  *      state-store-sized: cross-batch ordering needs no state because
  *      merge itself is last-writer-wins — a later batch's row simply
  *      replaces the earlier batch's.
  *   2. [[ValueStoreFormat.merge]] commits per touched partition
  *      (generation-pinned on the parquet format: concurrent readers
  *      never see a missing or half-merged partition).
  *
  * Exactly-once, stated not hidden (the StreamingIndexedSink candor):
  * foreachBatch is at-least-once under retries. A replayed batch
  * re-merges the SAME collapsed rows, and merge is CONTENT-IDEMPOTENT
  * (upserting a row equal to what the store already holds changes
  * nothing), so a retry converges to the same store state — the
  * at-least-once window costs rewrite work, never correctness drift.
  */
object StreamingUpsert {

  /** The per-batch body — public so batch code and tests share the
    * exact definition the stream runs. `batch` must carry the store's
    * long format; rows collapse latest-per-key on `tsCol` before the
    * merge. An empty batch is a no-op. Returns whether anything merged
    * (false = empty batch), so composed sinks (StreamingOnlineRefresh)
    * can gate their follow-on work without re-running the emptiness
    * job on the same frame. */
  def applyBatch(store: ValueStoreFormat, batch: DataFrame,
      tsCol: String = "computed_at"): Boolean = {
    if (batch.isEmpty) return false
    val keys = Seq("feature_name", "version", "entity_id")
    val payload = batch.columns.filterNot(keys.contains).toSeq
    val latest = batch
      .groupBy(keys.map(col): _*)
      .agg(max(struct((col(tsCol) +: payload.filterNot(_ == tsCol)
        .map(col)): _*)).as("_w"))
      .select(keys.map(col) ++ payload.map(c => col(s"_w.$c").as(c)): _*)
    store.merge(latest)
    true
  }

  /** Wire a stream of long-format correction rows to the store.
    * Caller starts it and owns trigger/checkpoint like any writer. */
  def writer(stream: DataFrame, store: ValueStoreFormat,
      checkpoint: String,
      tsCol: String = "computed_at"): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(store, batch.toDF(), tsCol): Unit
      }
}
