package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class SEv(ts: Timestamp, user_id: Long, value: Double)

/** Streaming session windows — the online counterpart of feat_sessionize:
  * `session_window(ts, gap)` merges events within the inactivity gap into
  * one state entry per (entity, session), closed by the watermark. */
class SessionWindowSpec extends SparkSpec {
  test("session_window groups events by 30-min inactivity gaps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SEv]
    val sessions = mem.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"), col("total"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_stream").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        SEv(t("2024-01-01 10:00:00"), 1L, 1.0),
        SEv(t("2024-01-01 10:10:00"), 1L, 2.0),   // same session (gap 10m)
        SEv(t("2024-01-01 11:30:00"), 1L, 4.0))   // new session (gap 80m)
      q.processAllAvailable()
      mem.addData(SEv(t("2024-01-02 00:00:00"), 2L, 0.0)) // advance watermark
      q.processAllAvailable()
      val out = spark.table("sessions_stream")
      val u1 = out.filter(col("user_id") === 1L).orderBy("s_start").collect()
      assert(u1.length === 2)
      assert(u1(0).getAs[Long]("n_events") === 2)
      assert(math.abs(u1(0).getAs[Double]("total") - 3.0) < 1e-12)
      assert(u1(1).getAs[Long]("n_events") === 1)
    } finally q.stop()
  }
}
