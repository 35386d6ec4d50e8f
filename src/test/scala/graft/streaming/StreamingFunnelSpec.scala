package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TemporalOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingFunnelSpec extends SparkSpec {
  import StreamingFunnel._

  private def t(s: String) = Timestamp.valueOf(s)

  test("online conversions match the batch funnel on the real events table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // batch truth: per-user first view / last purchase, converted when
    // the purchase follows — same per-user extremes event_funnel reduces
    val batchConverted = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      .filter(col("first_view").isNotNull &&
        col("last_purchase") > col("first_view"))
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap

    val rows = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type").collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val mem = MemoryStream[Ev]
    val q = conversions(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("funnel_stream").start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val online = spark.table("funnel_stream")
        .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
      assert(online.keySet === batchConverted.keySet)
      online.foreach { case (u, v) =>
        assert(v === batchConverted(u), s"user $u: online $v != batch ${batchConverted(u)}")
      }
      assert(online.nonEmpty, "expected conversions in the events table")
      // cross-check the scalar funnel query's converted count
      val funnelRow = TemporalOps.eventFunnel(spark, sf).collect()(0)
      assert(funnelRow.getLong(1) === online.size.toLong)
    } finally q.stop()
  }

  test("out-of-order arrival: a late earlier view retro-converts exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = conversions(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("funnel_ooo").start()
    try {
      // batch 1: purchase only — no view yet, nothing emits
      mem.addData(Ev(7L, t("2024-01-01 12:00:00"), "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_ooo").count() === 0)
      // batch 2: the view that predates the purchase arrives late
      mem.addData(Ev(7L, t("2024-01-01 09:00:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_ooo").collect()
      assert(got.length === 1)
      assert(got(0).getLong(0) === 7L)
      assert(got(0).getTimestamp(1) === t("2024-01-01 09:00:00"))
      assert(got(0).getTimestamp(2) === t("2024-01-01 12:00:00"))
      // batch 3: more purchases do not re-emit
      mem.addData(Ev(7L, t("2024-01-01 13:00:00"), "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_ooo").count() === 1)
    } finally q.stop()
  }
}
