package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G15: streaming purchase attribution — a genuine STREAM-STREAM
  * interval join, the one Structured Streaming shape the other streaming
  * operators (all keyed-state based) don't exercise.
  *
  * Two live streams — views and purchases — are joined on user with the
  * same 7-day lookback as the batch operator (`IntervalJoin.attribViews7d`):
  * every (purchase, view) pair where the view landed within the 7 days
  * before the purchase is emitted exactly once, in append mode, as soon
  * as both sides have arrived.
  *
  * State is bounded BY THE WATERMARKS, not by key cardinality: Spark
  * buffers each side only until the other side's watermark passes the
  * end of the join range — with a 1-day allowed lateness that is ≤ 8
  * days of views and ≤ 1 day of purchases per user, irrespective of
  * total stream length. The range predicate rides the equi-key
  * (`user`) exactly like the batch bucket trick; no bucketing is needed
  * online because the state manager already indexes by event time.
  *
  * Parity with batch is asserted pairwise in StreamingAttributionSpec:
  * same (event_id, view-ts) edge set on the real events table, any
  * arrival order within the watermark bound.
  */
object StreamingAttribution {
  /** views: (user_id, v_ts TIMESTAMP, value) — watermarked 1 day.
    * purchases: (event_id, p_user, p_ts TIMESTAMP) — watermarked 1 day.
    * Returns append-mode (event_id, p_user, p_ts, v_ts, value) edges. */
  def attributionEdges(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id"), col("v_ts"), col("value"))
      .withWatermark("v_ts", "1 day")
    val p = purchases
      .select(col("event_id"), col("p_user"), col("p_ts"))
      .withWatermark("p_ts", "1 day")
    p.join(v,
      col("user_id") === col("p_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS") &&
        col("v_ts") < col("p_ts"))
      .select(col("event_id"), col("p_user"), col("p_ts"),
        col("v_ts"), col("value"))
  }
}
