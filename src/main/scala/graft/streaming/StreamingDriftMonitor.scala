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

  /** Align per-window counts against the frozen reference histogram
    * ((bin, n) — [[DriftMonitor.histogram]] output): one row per
    * (window, bin in either side), zero-filled. Batch-side: the frames
    * here are windows-per-batch × bins — bounded, never stream-sized. */
  def compareWindows(winHist: DataFrame, refHist: DataFrame): DataFrame = {
    val wins = winHist.select("window_start", "window_end").distinct()
    val ref = wins.crossJoin(
      refHist.select(col("bin"), col("n").as("ref_n")))
    ref.join(winHist, Seq("window_start", "window_end", "bin"), "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
  }

  /** One summary row per window: (window_start, window_end, n_ref,
    * n_cur, n_bins, psi, kl, tvd, chi2) — THE batch scoring, shared. */
  def windowSummaries(winHist: DataFrame, refHist: DataFrame): DataFrame =
    DriftMonitor.driftSummary(compareWindows(winHist, refHist),
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
}
