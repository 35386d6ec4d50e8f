package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSessionizerSpec extends SparkSpec {
  import StreamingSessionizer._

  test("custom-state sessionizer closes on gap and flushes via timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessEvent]
    val q = sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessionizer_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        SessEvent(1L, t("2024-01-01 10:00:00"), 1.0),
        SessEvent(1L, t("2024-01-01 10:10:00"), 2.0),
        SessEvent(1L, t("2024-01-01 11:30:00"), 4.0),  // gap 80m: closes s1
        SessEvent(2L, t("2024-01-01 10:00:00"), 8.0))
      q.processAllAvailable()
      // advance watermark twice so EventTimeTimeout fires for open sessions
      mem.addData(SessEvent(99L, t("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(SessEvent(99L, t("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()

      val out = spark.table("sessionizer_out").filter(col("user_id") < 99)
      val u1 = out.filter(col("user_id") === 1L).orderBy("session_start").collect()
      assert(u1.length === 2)
      assert(u1(0).getAs[Long]("n_events") === 2)
      assert(math.abs(u1(0).getAs[Double]("total_value") - 3.0) < 1e-12)
      assert(u1(0).getAs[Timestamp]("session_end") === Timestamp.valueOf("2024-01-01 10:10:00"))
      assert(u1(1).getAs[Long]("n_events") === 1)
      val u2 = out.filter(col("user_id") === 2L).collect()
      assert(u2.length === 1 && u2(0).getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("sessionizer agrees with the batch sessionize query semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // deterministic mini-stream: 3 users, known gaps
    def t(s: String) = Timestamp.valueOf(s)
    val evs = Seq(
      SessEvent(1L, t("2024-01-01 09:00:00"), 1.0),
      SessEvent(1L, t("2024-01-01 09:20:00"), 1.0),
      SessEvent(1L, t("2024-01-01 09:55:00"), 1.0),   // 35m gap: new session
      SessEvent(2L, t("2024-01-01 12:00:00"), 1.0),
      SessEvent(3L, t("2024-01-01 01:00:00"), 1.0),
      SessEvent(3L, t("2024-01-01 01:29:00"), 1.0))   // 29m: same session
    val mem = MemoryStream[SessEvent]
    val q = sessionize(mem.toDS(), 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessionizer_parity").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(SessEvent(99L, t("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(SessEvent(99L, t("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
      val online = spark.table("sessionizer_parity").filter(col("user_id") < 99)
        .select("user_id", "session_start", "n_events")

      // batch equivalent (lag + cumsum), same gap rule
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      val batch = evs.toDF()
        .withColumn("prev", lag(col("ts").cast("long"), 1).over(w))
        .withColumn("is_new", when(col("prev").isNull ||
          col("ts").cast("long") - col("prev") > 1800, 1).otherwise(0))
        .withColumn("sid", sum(col("is_new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "n_events")
      assert(batch.except(online).count() === 0)
      assert(online.except(batch).count() === 0)
    } finally q.stop()
  }
}
