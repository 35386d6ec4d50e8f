package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Doc(ts: Timestamp, doc_hash: String, payload: String)

/** Streaming exact dedup — the online counterpart of dedup_exact: state
  * keyed by content hash, bounded by the watermark, so an unbounded
  * ingest stream keeps only first-seen documents. */
class StreamingDedupSpec extends SparkSpec {
  test("dropDuplicatesWithinWatermark keeps first occurrence per hash") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val deduped = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("doc_hash")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        Doc(t("2024-01-01 10:00:00"), "h1", "a"),
        Doc(t("2024-01-01 10:01:00"), "h1", "a-dup"),
        Doc(t("2024-01-01 10:02:00"), "h2", "b"))
      q.processAllAvailable()
      mem.addData(Doc(t("2024-01-01 10:03:00"), "h1", "a-dup-2"))
      q.processAllAvailable()
      val out = spark.table("dedup_stream")
      assert(out.count() === 2)
      assert(out.filter(col("doc_hash") === "h1").count() === 1)
      assert(out.filter(col("doc_hash") === "h1")
        .select("payload").first().getString(0) === "a")
    } finally q.stop()
  }
}
