package graft.streaming

import graft.SparkSpec
import graft.operators.Scd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingScd2Spec extends SparkSpec {
  import StreamingScd2._

  private def t(s: String) = Timestamp.valueOf(s)

  /** Batch reference: closed (non-current) versions of the same log. */
  private def batchClosed(changes: Seq[Change]) = {
    import spark.implicits._
    val df = changes.map(c => (c.key, c.attr, c.ts, c.tie))
      .toDF("key", "attr", "ts", "tie")
    Scd2.build(df, Seq("key"), Seq("attr"), "ts", Seq("tie"))
      .filter(!col("is_current"))
      .select("key", "attr", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
  }

  private def runStream(batches: Seq[Seq[Change]], name: String,
                        delay: String = "10 minutes") = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Change]
    val q = versions(mem.toDS(), delay)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // two flush batches: first advances the max event time, second lets
      // the new watermark take effect and fire timeouts
      mem.addData(Change(999L, Some("zz"), t("2030-01-01 00:00:00"), 0))
      q.processAllAvailable()
      mem.addData(Change(999L, Some("zz"), t("2030-01-02 00:00:00"), 1))
      q.processAllAvailable()
      spark.table(name).filter(col("key") < 999)
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)),
          r.getTimestamp(2), r.getTimestamp(3))).toSet
    } finally q.stop()
  }

  test("in-order change stream emits exactly the batch build's closed versions") {
    val log = Seq(
      Change(1L, Some("A"), t("2024-01-01 10:00:00"), 1),
      Change(1L, Some("A"), t("2024-01-01 10:05:00"), 2), // no-op
      Change(1L, Some("B"), t("2024-01-01 10:30:00"), 3),
      Change(1L, Some("A"), t("2024-01-01 11:00:00"), 4),
      Change(2L, Some("X"), t("2024-01-01 10:00:00"), 5)) // stays open
    val got = runStream(Seq(log), "scd2s_inorder")
    assert(got === batchClosed(log))
    assert(got.size === 2) // key 1: A->B, B->A; key 2 never closes
  }

  test("out-of-order arrival inside the watermark lands in correct interval position") {
    // the 10:15 change arrives AFTER the 10:30 change but must slot
    // between 10:00 and 10:30; the 30-minute disorder bound keeps the
    // watermark at 10:00 after batch 1, so the straggler is admissible
    val b1 = Seq(
      Change(1L, Some("A"), t("2024-01-01 10:00:00"), 1),
      Change(1L, Some("C"), t("2024-01-01 10:30:00"), 3))
    val b2 = Seq(
      Change(1L, Some("B"), t("2024-01-01 10:15:00"), 2))
    val got = runStream(Seq(b1, b2), "scd2s_ooo", delay = "30 minutes")
    assert(got === batchClosed(b1 ++ b2))
    val attrs = got.toSeq.sortBy(_._3.getTime).map(_._2)
    assert(attrs === Seq(Some("A"), Some("B")))
  }

  test("late-beyond-watermark changes are dropped, not misfiled (the stated contract)") {
    // identical log to the out-of-order test, but the 10-minute bound
    // lets batch 1 push the watermark to 10:20 — the 10:15 straggler is
    // late, Spark drops it, and the history reads as if it never existed
    val b1 = Seq(
      Change(1L, Some("A"), t("2024-01-01 10:00:00"), 1),
      Change(1L, Some("C"), t("2024-01-01 10:30:00"), 3))
    val b2 = Seq(
      Change(1L, Some("B"), t("2024-01-01 10:15:00"), 2))
    val got = runStream(Seq(b1, b2), "scd2s_late", delay = "10 minutes")
    assert(got === batchClosed(b1)) // b2 contributed nothing
  }

  test("same-instant flips order by the tie column; null attr is a state") {
    val log = Seq(
      Change(1L, Some("B"), t("2024-01-01 10:00:00"), 2),
      Change(1L, Some("A"), t("2024-01-01 10:00:00"), 1),
      Change(1L, None, t("2024-01-01 10:20:00"), 3),
      Change(1L, None, t("2024-01-01 10:25:00"), 4), // no-op on null
      Change(1L, Some("A"), t("2024-01-01 10:40:00"), 5))
    val got = runStream(Seq(log), "scd2s_ties")
    assert(got === batchClosed(log))
    // zero-length A version closed by B at the same instant
    assert(got.exists(v => v._2 === Some("A") && v._3 === v._4))
  }

  test("versions only close once the watermark certifies them") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[Change]
    val mem = MemoryStream[Change]
    val q = versions(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2s_wm").start()
    try {
      mem.addData(
        Change(1L, Some("A"), t("2024-01-01 10:00:00"), 1),
        Change(1L, Some("B"), t("2024-01-01 10:01:00"), 2))
      q.processAllAvailable()
      // watermark is still 09:51 — nothing may emit yet
      assert(spark.table("scd2s_wm").count() === 0)
    } finally q.stop()
  }
}
