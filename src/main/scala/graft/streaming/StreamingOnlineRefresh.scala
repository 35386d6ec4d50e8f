package graft.streaming

import graft.registry.{FeatureStore, ValueStoreFormat}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming batch→online handoff — closes the loop between the CDC
  * apply (G33 [[StreamingUpsert]]) and the generation-pinned online
  * publish (G40 `FeatureStore.publishOnlineGeneration`): one
  * foreachBatch sink that, per micro-batch,
  *
  *   1. merges the batch's correction rows into the value store
  *      ([[StreamingUpsert.applyBatch]] — latest-wins collapse, then
  *      the generation-pinned MERGE),
  *   2. invalidates the driver-side serving cache (a served vector
  *      must never outlive the correction that falsified it),
  *   3. republishes the online view as a FRESH `gen=<n>/` directory
  *      and atomically swaps the `_latest` pointer.
  *
  * A reader polling `FeatureStore.readOnlineVectorLatest` mid-stream
  * therefore only ever resolves a COMPLETE generation — the old one
  * until the swap, the new one after it, never a half-written layout
  * (spec-pinned by a concurrent poller in StreamingOnlineRefreshSpec).
  *
  * Exactly-once, stated not hidden (the repo's foreachBatch candor):
  * retries are at-least-once. The merge is content-idempotent, so a
  * replayed batch converges to the same store state; the re-publish
  * then writes a new generation with IDENTICAL vectors — readers see
  * value-identical state either way, the only cost is one redundant
  * generation directory, which pruning reclaims.
  *
  * Storage lifecycle: publishing per micro-batch creates one
  * generation per non-empty batch, so the sink prunes after each
  * publish (`keep` newest generations; the pointer target always
  * survives). With this serving path's always-fresh resolution —
  * `readOnlineVectorLatest` re-resolves per lookup — any `keep ≥ 2`
  * is safe; the default 8 gives slow external readers a wide window.
  * Pass `keep = None` to never reclaim (archival replay layouts).
  */
object StreamingOnlineRefresh {

  /** The per-batch body — public so batch code and tests share the
    * exact definition the stream runs (the G21/G33 convention). An
    * empty batch is a FULL no-op: no merge, no generation churn.
    * Returns the published generation path, if any. */
  def applyBatch(fs: FeatureStore, store: ValueStoreFormat,
      batch: DataFrame, basePath: String, buckets: Int = 64,
      tsCol: String = "computed_at",
      keep: Option[Int] = Some(8)): Option[String] = {
    // the ONE emptiness check lives in the upsert (its return value) —
    // a second batch.isEmpty here would run a redundant limit-1 job on
    // every non-empty micro-batch of the hot path
    if (!StreamingUpsert.applyBatch(store, batch, tsCol)) return None
    fs.invalidateCache()
    val gen = fs.publishOnlineGeneration(basePath, buckets)
    keep.foreach { k =>
      FeatureStore.pruneOnlineGenerations(batch.sparkSession, basePath, k): Unit
    }
    Some(gen)
  }

  /** Wire a stream of long-format correction rows to the store + the
    * online view. `store` must be the SAME [[ValueStoreFormat]] the
    * FeatureStore was built over (`valueFormat = Some(store)`) — the
    * publish reads the vectors the merge just updated. Caller starts
    * the query and owns trigger/checkpoint like any writer. */
  def writer(stream: DataFrame, fs: FeatureStore, store: ValueStoreFormat,
      basePath: String, checkpoint: String, buckets: Int = 64,
      tsCol: String = "computed_at",
      keep: Option[Int] = Some(8)): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(fs, store, batch.toDF(), basePath, buckets, tsCol,
          keep): Unit
      }
}
