package graft.streaming

import graft.operators.DriftMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** G23: ONLINE feature drift monitoring — the streaming twin of
  * [[graft.operators.DriftMonitor]] (G22), shaped like the rest of the
  * streaming family: the STATEFUL part is Spark's own watermarked
  * tumbling-window aggregation, the SCORING part is THE batch operator
  * run per micro-batch, so batch/online parity is structural (the
  * G11/G21 argument — one definition of the smoothing rule, one
  * definition of the alignment).
  *
  * The deployment picture: a FROZEN reference histogram (training-time
  * distribution, [[DriftMonitor.histogram]] output saved once — the
  * C9/C10 frozen-index convention) versus the live feature stream cut
  * into event-time windows. Per closed window: exact bin counts, then
  * PSI/KL/TVD/chi² against the reference.
  *
  *   - [[windowedHistogram]]: watermark + tumbling window + the SAME
  *     literal-edge bin rule, one stateful aggregation in append mode —
  *     a window's counts emit exactly once, when the watermark passes
  *     its end. State is (windows in flight × bins) rows — bounded by
  *     the watermark horizon, never by stream length. A window with no
  *     events emits nothing (there is no distribution to score).
  *   - [[compareWindows]] / [[windowSummaries]]: the BATCH comparator —
  *     align each window's counts full-outer against the reference
  *     (zero-filled both ways; a reference bin the window never hit is
  *     exactly the drift signal smoothing exists for), then
  *     [[DriftMonitor.driftSummary]] grouped by the window bounds.
  *   - [[monitor]]: the composition — append-mode windowed histogram
  *     into foreachBatch, each batch's closed windows scored and handed
  *     to the caller's sink. Because a closed window's bins all emit in
  *     the SAME micro-batch (they close together, at one watermark
  *     advance), per-batch scoring never sees half a window; replaying
  *     a batch reproduces its verdicts (deterministic arithmetic over
  *     exact counts — idempotent against exactly-once sinks). The
  *     integer tier (counts, totals, K) is EXACT across batch/online;
  *     the float scores agree to summation-order tolerance (a Σ over
  *     shuffled partitions does not pin add order — the documented
  *     float-tier convention).
  */
object StreamingDriftMonitor {

  /** Tumbling-window exact bin counts of a (possibly streaming) frame:
    * (window_start, window_end, bin, cur_n). Append mode on a stream —
    * rows emit when the watermark (`delayThreshold` behind max event
    * time) passes the window end. On a BATCH frame the same call is the
    * per-window histogram directly (withWatermark is a no-op), which is
    * what makes parity testable structurally. */
  def windowedHistogram(events: DataFrame, tsCol: String, valueCol: String,
      edges: Seq[Double], windowDuration: String = "1 hour",
      delayThreshold: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration).as("_w"),
        DriftMonitor.binCol(col(valueCol), edges).as("bin"))
      .agg(count(lit(1)).as("cur_n"))
      .select(col("_w.start").as("window_start"),
        col("_w.end").as("window_end"), col("bin"), col("cur_n"))

  /** CATEGORICAL twin of [[windowedHistogram]]: per-window exact counts
    * of a category column (language mix of a crawl stream, event-type
    * mix of a feed) — same watermark/append semantics, the key is the
    * category itself instead of a numeric bin. NULL categories count
    * under a NULL key (the G22 convention: a null-rate shift is drift). */
  def windowedCategoricalHistogram(events: DataFrame, tsCol: String,
      catCol: String, windowDuration: String = "1 hour",
      delayThreshold: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration).as("_w"),
        col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).as("cur_n"))
      .select(col("_w.start").as("window_start"),
        col("_w.end").as("window_end"), col("category"), col("cur_n"))

  /** Align per-window counts against the frozen reference histogram
    * ((keyCol, n) — [[DriftMonitor.histogram]] output for numeric bins,
    * a grouped count for categories): one row per (window, key in
    * either side), zero-filled; null-safe on the key (a NULL category
    * aligns with the reference's NULL row). Batch-side: the frames here
    * are windows-per-batch × keys — bounded, never stream-sized. */
  def compareWindows(winHist: DataFrame, refHist: DataFrame,
      keyCol: String = "bin"): DataFrame = {
    // every left-side column re-aliased: the left derives from winHist
    // itself, and unaliased names would make the self-join ambiguous
    val wins = winHist
      .select(col("window_start").as("_ws"), col("window_end").as("_we"))
      .distinct()
    val ref = wins.crossJoin(
      refHist.select(col(keyCol).as("_rk"), col("n").as("_rn")))
    ref.join(winHist,
        col("_ws") === col("window_start") && col("_we") === col("window_end") &&
          col("_rk") <=> col(keyCol), "full_outer")
      .select(
        coalesce(col("_ws"), col("window_start")).as("window_start"),
        coalesce(col("_we"), col("window_end")).as("window_end"),
        coalesce(col("_rk"), col(keyCol)).as(keyCol),
        coalesce(col("_rn"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
  }

  /** One summary row per window: (window_start, window_end, n_ref,
    * n_cur, n_bins, psi, kl, tvd, chi2) — THE batch scoring, shared. */
  def windowSummaries(winHist: DataFrame, refHist: DataFrame,
      keyCol: String = "bin"): DataFrame =
    DriftMonitor.driftSummary(compareWindows(winHist, refHist, keyCol),
      by = Seq("window_start", "window_end"))

  /** The serving composition: score each closed window as it emits and
    * hand the per-window summary rows to `sink`. Start with
    * `.queryName(...).start()`; the caller owns checkpointing/output
    * options on the returned writer. */
  def monitor(events: DataFrame, tsCol: String, valueCol: String,
      edges: Seq[Double], refHist: DataFrame,
      windowDuration: String = "1 hour",
      delayThreshold: String = "10 minutes")(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    windowedHistogram(events, tsCol, valueCol, edges, windowDuration,
        delayThreshold)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(windowSummaries(batch, refHist))
      }

  /** Categorical serving composition: closed windows of the category
    * mix scored against a frozen reference count frame ((category, n)
    * — [[DriftMonitor.categoricalHistogram]] output). */
  def monitorCategorical(events: DataFrame, tsCol: String, catCol: String,
      refHist: DataFrame, windowDuration: String = "1 hour",
      delayThreshold: String = "10 minutes")(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    windowedCategoricalHistogram(events, tsCol, catCol, windowDuration,
        delayThreshold)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(windowSummaries(batch, refHist, "category"))
      }
}
