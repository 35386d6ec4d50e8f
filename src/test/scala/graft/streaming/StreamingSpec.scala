package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, value: Double)

class StreamingSpec extends SparkSpec {
  test("windowed streaming materialization emits per-entity window features") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val features = StreamingMaterializer.windowedFeatures(
      mem.toDF(), windowLength = "1 hour", watermark = "2 hours")
    val q = StreamingMaterializer.writer(features, "feat_stream")
      .format("memory").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        Ev(t("2024-01-01 10:05:00"), 1L, 2.0),
        Ev(t("2024-01-01 10:55:00"), 1L, 3.0),
        Ev(t("2024-01-01 11:05:00"), 1L, 7.0),
        Ev(t("2024-01-01 10:10:00"), 2L, 1.0))
      q.processAllAvailable()
      // advance far past the watermark so the 10:00 and 11:00 windows close
      mem.addData(Ev(t("2024-01-02 00:00:00"), 1L, 0.0))
      q.processAllAvailable()
      val out = spark.table("feat_stream")
      val u1w10 = out.filter(col("entity_id") === "1" &&
        col("window_start") === t("2024-01-01 10:00:00")).collect()
      assert(u1w10.length === 1)
      assert(u1w10(0).getAs[Long]("n_events") === 2)
      assert(math.abs(u1w10(0).getAs[Double]("total_value") - 5.0) < 1e-12)
      assert(out.filter(col("entity_id") === "2").count() === 1)
    } finally q.stop()
  }
}
