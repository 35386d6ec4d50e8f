package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Streaming feature materialization (SURVEY §2 A14): the online-refresh
  * counterpart of FeatureStore.computeVersion. An event stream is
  * watermarked, windowed per entity, and appended to the value store —
  * `readStream → withWatermark → groupBy(window, entity) → agg →
  * writeStream`. State is bounded by the watermark; at scale the shuffle
  * keys on (entity, window) which Spark distributes evenly.
  */
object StreamingMaterializer {

  /** Tumbling windowed per-entity aggregate over a (ts, user_id, value)
    * stream: feature = sum/count of `value` per window. */
  def windowedFeatures(events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id").cast("string").as("entity_id"),
        col("window.start").as("window_start"),
        col("n_events"), col("total_value"))
  }

  /** Wire a windowed-feature stream into an append sink (parquet value
    * store in production; memory sink in tests). */
  def writer(features: DataFrame, queryName: String): DataStreamWriter[Row] =
    features.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
}
