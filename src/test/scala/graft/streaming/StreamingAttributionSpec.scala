package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingAttributionSpec extends SparkSpec {
  case class V(user_id: Long, v_ts: Timestamp, value: Double)
  case class P(event_id: Long, p_user: Long, p_ts: Timestamp)

  test("stream-stream interval join matches the batch 7-day attribution edges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = Tables.events(spark, sf)
    // batch truth: every (purchase, view) edge within the lookback —
    // the same predicate IntervalJoin evaluates via week buckets
    val batchEdges = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .join(
        ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts")),
        col("v_user") === col("p_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS") &&
          col("v_ts") < col("p_ts"))
      .select(col("event_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(batchEdges.nonEmpty, "expected attribution edges in the events table")

    val views = MemoryStream[V]
    val purchases = MemoryStream[P]
    val joined = StreamingAttribution.attributionEdges(
      views.toDF(), purchases.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_stream").start()
    try {
      val vRows = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value").collect()
        .map(r => V(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      val pRows = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts").collect()
        .map(r => P(r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      // purchases arrive BEFORE the views that convert them — the join
      // must buffer and still emit every edge exactly once
      purchases.addData(pRows.toSeq: _*)
      q.processAllAvailable()
      views.addData(vRows.toSeq: _*)
      q.processAllAvailable()

      val online = spark.table("attrib_stream")
        .select("event_id", "v_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(online == batchEdges,
        s"online ${online.size} edges != batch ${batchEdges.size}")
    } finally q.stop()
  }
}
