package graft.streaming

import graft.SparkSpec
import graft.operators.DriftMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class DEv(ts: Timestamp, value: Double)
case class LEv(ts: Timestamp, lang: String)

/** G23 streaming drift: stateful windowed histograms in append mode,
  * per-window scores ≡ the batch operator on the same rows, window
  * closure semantics, and drifted-window detection. */
class StreamingDriftMonitorSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private val edges = Seq(0.0, 10.0, 20.0, 30.0)

  // three 10-minute windows of events: W1/W2 reference-like, W3 shifted up
  private val w1 = Seq(1.0, 5.0, 12.0, 15.0, 22.0).map((t("2024-01-01 10:02:00"), _))
  private val w2 = Seq(2.0, 7.0, 11.0, 18.0, 25.0).map((t("2024-01-01 10:14:00"), _))
  private val w3 = Seq(28.0, 31.0, 35.0, 40.0, 45.0).map((t("2024-01-01 10:27:00"), _))
  private val sentinel = (t("2024-01-02 10:00:00"), 1.0) // advances the watermark
  private def refHist = {
    import spark.implicits._
    DriftMonitor.histogram(
      Seq(1.0, 4.0, 8.0, 11.0, 14.0, 17.0, 21.0, 26.0).toDF("value"),
      "value", edges)
  }

  test("per-window summaries: streaming across arbitrary splits ≡ batch scoring") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = refHist.cache()
    val events = w1 ++ w2 ++ w3

    val collected = collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val mem = MemoryStream[DEv]
    val q = StreamingDriftMonitor.monitor(
        mem.toDS().toDF(), "ts", "value", edges, ref,
        windowDuration = "10 minutes", delayThreshold = "1 minute") { df =>
      collected ++= df.collect()
    }.queryName("drift_mon").start()
    try {
      // arbitrary arrival split: W1 + half of W2, then the rest + W3,
      // then the sentinel that closes every tested window
      mem.addData(events.take(7).map { case (ts, v) => DEv(ts, v) }: _*)
      q.processAllAvailable()
      mem.addData(events.drop(7).map { case (ts, v) => DEv(ts, v) }: _*)
      q.processAllAvailable()
      mem.addData(DEv(sentinel._1, sentinel._2))
      q.processAllAvailable()
    } finally q.stop()

    val online = collected.map(r =>
      r.getAs[Timestamp]("window_start") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("n_bins"), r.getAs[Double]("psi"),
          r.getAs[Double]("chi2"))).toMap
    assert(online.keySet === Set(t("2024-01-01 10:00:00"),
      t("2024-01-01 10:10:00"), t("2024-01-01 10:20:00")),
      s"exactly the three closed windows: ${online.keySet}")

    // batch scoring of the same rows — the shared comparator path
    val batchHist = StreamingDriftMonitor.windowedHistogram(
      events.toDF("ts", "value"), "ts", "value", edges, "10 minutes")
    val batch = StreamingDriftMonitor.windowSummaries(batchHist, ref)
      .collect().map(r =>
        r.getAs[Timestamp]("window_start") ->
          (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
            r.getAs[Long]("n_bins"), r.getAs[Double]("psi"),
            r.getAs[Double]("chi2"))).toMap
    // integer tiers exact; the float scores match to summation-order
    // tolerance (a Σ over shuffled partitions does not pin add order —
    // the bm25 float-tier precedent)
    assert(online.keySet === batch.keySet)
    online.foreach { case (w, (nr, nc, k, psi, x2)) =>
      val (bnr, bnc, bk, bpsi, bx2) = batch(w)
      assert((nr, nc, k) === ((bnr, bnc, bk)), s"window $w integer tier")
      assert(math.abs(psi - bpsi) < 1e-12 && math.abs(x2 - bx2) < 1e-9,
        s"window $w scores: online ($psi, $x2) vs batch ($bpsi, $bx2)")
    }

    // and one window checked against the INDEPENDENT numeric path:
    // numericDrift(ref raw, window slice) builds the same comparison
    val refRaw = Seq(1.0, 4.0, 8.0, 11.0, 14.0, 17.0, 21.0, 26.0).toDF("value")
    val w1Rows = w1.map(_._2).toDF("value")
    val independent = DriftMonitor.driftSummary(
      DriftMonitor.numericDrift(refRaw, w1Rows, "value", edges))
      .collect().head
    val (nr, nc, k, psi, _) = online(t("2024-01-01 10:00:00"))
    assert(independent.getAs[Long]("n_ref") === nr)
    assert(independent.getAs[Long]("n_cur") === nc)
    assert(independent.getAs[Long]("n_bins") === k)
    assert(math.abs(independent.getAs[Double]("psi") - psi) < 1e-12)

    // the shifted window is the drifted one, by a wide margin
    val psiW1 = online(t("2024-01-01 10:00:00"))._4
    val psiW3 = online(t("2024-01-01 10:20:00"))._4
    assert(psiW3 > psiW1 + 0.25,
      s"shifted window must dominate: w1=$psiW1 w3=$psiW3")
  }

  test("append emission: a window's counts emit once, only after closure") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DEv]
    val hist = StreamingDriftMonitor.windowedHistogram(
      mem.toDS().toDF(), "ts", "value", edges, "10 minutes", "1 minute")
    val q = hist.writeStream.outputMode("append")
      .format("memory").queryName("drift_hist_stream").start()
    try {
      mem.addData(DEv(t("2024-01-01 10:02:00"), 5.0),
        DEv(t("2024-01-01 10:03:00"), 15.0))
      q.processAllAvailable()
      assert(spark.table("drift_hist_stream").count() === 0,
        "open window must not emit")
      // watermark passes 10:10 -> the window closes with BOTH bins
      mem.addData(DEv(t("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("drift_hist_stream")
        .collect().map(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[Int]("bin"), r.getAs[Long]("cur_n"))).toSet
      assert(rows === Set(
        (t("2024-01-01 10:00:00"), 1, 1L),
        (t("2024-01-01 10:00:00"), 2, 1L)))
    } finally q.stop()
  }

  test("categorical windows: mix shift detected, null-safe category alignment") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference mix: mostly 'en' with some 'de' and a NULL slice
    val ref = DriftMonitor.categoricalHistogram(
      (Seq.fill(8)(Some("en")) ++ Seq.fill(3)(Some("de")) ++
        Seq.fill(1)(Option.empty[String])).toDF("lang"), "lang").cache()

    val w1 = Seq.fill(8)("en") ++ Seq.fill(3)("de") ++ Seq(null) // ref-like
    val w2 = Seq.fill(10)("fr") ++ Seq.fill(2)("en")             // novel mix
    val collected = collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val mem = MemoryStream[LEv]
    val q = StreamingDriftMonitor.monitorCategorical(
        mem.toDS().toDF(), "ts", "lang", ref,
        windowDuration = "10 minutes", delayThreshold = "1 minute") { df =>
      collected ++= df.collect()
    }.queryName("drift_cat_mon").start()
    try {
      mem.addData(w1.map(LEv(t("2024-01-01 10:02:00"), _)) ++
        w2.map(LEv(t("2024-01-01 10:14:00"), _)): _*)
      q.processAllAvailable()
      mem.addData(LEv(t("2024-01-02 10:00:00"), "en"))
      q.processAllAvailable()
    } finally q.stop()

    val byWin = collected.map(r =>
      r.getAs[Timestamp]("window_start") ->
        (r.getAs[Long]("n_cur"), r.getAs[Double]("psi"))).toMap
    assert(byWin.keySet === Set(t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00")))
    val (n1, psi1) = byWin(t("2024-01-01 10:00:00"))
    val (n2, psi2) = byWin(t("2024-01-01 10:10:00"))
    assert(n1 === 12L && n2 === 12L)
    assert(psi1 === 0.0, s"identical mix incl. the NULL slice scores exact zero: $psi1")
    assert(psi2 > 1.0, s"novel-dominated window must alarm: $psi2")
  }

  test("a reference bin the window never hit still scores (zero-filled)") {
    import spark.implicits._
    // window saw only bin 1; reference covers bins 1..3
    val winHist = Seq((t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00"), 1, 4L))
      .toDF("window_start", "window_end", "bin", "cur_n")
    val cmp = StreamingDriftMonitor.compareWindows(winHist, refHist)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("ref_n"), r.getAs[Long]("cur_n"))).toMap
    assert(cmp === Map(1 -> (3L, 4L), 2 -> (3L, 0L), 3 -> (2L, 0L)))
    val s = DriftMonitor.driftSummary(
      StreamingDriftMonitor.compareWindows(winHist, refHist),
      by = Seq("window_start", "window_end")).collect().head
    assert(s.getAs[Double]("psi") > 0.0 && !s.isNullAt(s.fieldIndex("chi2")))
  }
}
