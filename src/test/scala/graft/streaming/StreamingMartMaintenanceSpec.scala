package graft.streaming

import graft.SparkSpec
import graft.operators.SupplyMart
import graft.registry.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class MartRow(l_partkey: Long, l_suppkey: Long,
    l_extendedprice: Double, l_quantity: Double, l_shipdate: Timestamp)

/** The real-lineitem shape: a unique row key ((l_orderkey,
  * l_linenumber)) rides beside the measures — what `foldBack(keyCols)`
  * needs for duplicate-exact repair (r18 directive 3). */
case class KeyedMartRow(l_orderkey: Long, l_linenumber: Int,
    l_partkey: Long, l_suppkey: Long,
    l_extendedprice: Double, l_quantity: Double, l_shipdate: Timestamp)

/** Directive: the IncrementalProtocol × Streaming loop — out-of-order
  * micro-batches must converge to EXACTLY the batch full compute
  * (the event-time watermark genuinely handles disorder within the
  * bound, instead of the high-water caveat merely documenting it), a
  * replayed batch must not double SUM partials, and rows beyond the
  * lateness bound are dropped measurably, not silently merged wrong. */
class StreamingMartMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-smm-$tag")
      .toString + "/mart"

  private def ts(day: Int) = Timestamp.valueOf(f"1995-01-$day%02d 12:00:00")

  private def row(pk: Long, sk: Long, price: Double, qty: Double, day: Int) =
    MartRow(pk, sk, price, qty, ts(day))

  /** Full mart row set (all five stored fields) — "byte-identical"
    * means this, not just the serving projection. */
  private def martRows(path: String): Set[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select("l_partkey", "l_suppkey", "cost_c", "value_c", "max_ship_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("out-of-order micro-batches converge byte-identical to the batch full compute", graft.Slow) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-smm-e2e").toString
    val mart = s"$dir/mart"

    // six days of activity, deliberately disordered ACROSS batches
    // (day 2 arrives after day 3) and WITHIN them — all inside the
    // 2-day lateness bound
    val b1 = Seq(row(1, 1, 100.0, 2, 3), row(2, 1, 90.0, 3, 1),
      row(1, 2, 50.0, 1, 2), row(1, 1, 80.0, 1, 1))
    val b2 = Seq(row(2, 1, 120.0, 2, 2), row(1, 1, 70.0, 1, 4),
      row(3, 3, 200.0, 4, 2))
    val b3 = Seq(row(2, 2, 30.0, 1, 5), row(3, 3, 150.0, 3, 6),
      row(1, 2, 60.0, 2, 6))
    val real = b1 ++ b2 ++ b3
    // sentinel far past every real window + lateness: advances the
    // stream watermark so all real day windows finalize; its own
    // window never closes and must NOT reach the mart
    val sentinel = row(999, 999, 1.0, 1, 28)
    // beyond-bound late row: arrives after the watermark passed its
    // day by more than the bound — the stream drops it (measured via
    // numRowsDroppedByWatermark), the mart must not absorb it
    val tooLate = row(1, 1, 10.0, 1, 1)

    val mem = MemoryStream[MartRow]
    val q = StreamingMartMaintenance.writer(mem.toDS().toDF(), mart,
        checkpoint = s"$dir/ckpt", buckets = 8, lateness = "2 days")
      .queryName("mart_maintenance").start()
    val droppedByWatermark = try {
      Seq(b1, b2, b3, Seq(sentinel), Seq(tooLate)).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    } finally q.stop()

    // batch twin over the REAL rows only (no sentinel, no dropped row)
    val twin = tmp("twin")
    SupplyMart.refresh(spark, real.toDF(), twin, buckets = 8)
    assert(martRows(mart) === martRows(twin),
      "stream-fed mart diverged from the batch full compute")
    // the beyond-bound drop is a reported number, not a silent one —
    // the streaming twin of the batch path's lateRows audit
    assert(droppedByWatermark >= 1L,
      s"the beyond-bound row was not reported dropped ($droppedByWatermark)")
    // mart-fed reader parity: the stream-built mart serves the same
    // projection the batch-built one does
    assert(SupplyMart.read(spark, mart).collect().length ===
      SupplyMart.read(spark, twin).collect().length)
  }

  test("quarantine tee: rows of committed days land row-for-row; mart stays byte-identical; reconcile folds them back", graft.Slow) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-smm-q").toString
    val mart = s"$dir/mart"
    val quarantine = s"$dir/quarantine"

    val b1 = Seq(row(1, 1, 100.0, 2, 3), row(2, 1, 90.0, 3, 1),
      row(1, 2, 50.0, 1, 2))
    val b2 = Seq(row(2, 1, 120.0, 2, 2), row(1, 1, 70.0, 1, 4))
    val real = b1 ++ b2
    val sentinel = row(999, 999, 1.0, 1, 28) // finalizes all real days
    // late rows arriving AFTER their days folded — the stream drops
    // them; the tee must capture them row-for-row. One is timestamped
    // PAST the mart's stored max ship of its day (day 4 at 18:00 vs
    // the folded 12:00) — the bare-watermark predicate would miss it;
    // committed DAYS are the unreachable class, which is why the tee
    // keys on the day floor
    val late1 = row(1, 1, 10.0, 1, 1)
    val late2 = MartRow(7, 7, 33.0, 1,
      Timestamp.valueOf("1995-01-04 18:00:00"))

    val mem = MemoryStream[MartRow]
    val src = mem.toDS().toDF()
    val martQ = StreamingMartMaintenance.writer(src, mart,
      checkpoint = s"$dir/ckpt-mart", buckets = 8, lateness = "2 days")
      .start()
    val teeQ = StreamingMartMaintenance.quarantineWriter(src, mart,
      quarantine, checkpoint = s"$dir/ckpt-tee").start()
    try {
      // tee first, then the fold (the documented operating order: a
      // tee that lags a fold can only over-quarantine)
      Seq(b1, b2, Seq(sentinel), Seq(late1, late2)).foreach { batch =>
        mem.addData(batch: _*)
        teeQ.processAllAvailable()
        martQ.processAllAvailable()
      }
    } finally { martQ.stop(); teeQ.stop() }

    // row-for-row: exactly the two late rows, nothing absorbed
    val schema = Seq.empty[MartRow].toDF().schema
    val q = StreamingMartMaintenance.quarantined(spark, quarantine, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(q === Set((1L, 1L, 10.0), (7L, 7L, 33.0)),
      s"quarantine must hold exactly the dropped rows: $q")

    // the mart itself is byte-identical to the batch twin of the
    // ABSORBED rows — the tee observed, never perturbed
    val twin = tmp("q-twin")
    SupplyMart.refresh(spark, real.toDF(), twin, buckets = 8)
    assert(martRows(mart) === martRows(twin))

    // the repair loop: foldBack (reconcile over log ∪ (quarantine −
    // log), the documented verb) folds the dropped rows in, converging
    // to the full compute over everything
    assert(StreamingMartMaintenance.foldBack(spark, real.toDF(),
      quarantine, mart, buckets = 8) > 0)
    val twinAll = tmp("q-twin-all")
    SupplyMart.refresh(spark, (real ++ Seq(late1, late2)).toDF(), twinAll, 8)
    assert(martRows(mart) === martRows(twinAll),
      "foldBack over log + quarantine diverged from the full compute")

    // at-least-once redelivery of a tee batch overwrites, never appends
    val n1 = StreamingMartMaintenance.quarantineBatch(spark,
      Seq(late1).toDF(), mart, quarantine, batchId = 777L)
    val n2 = StreamingMartMaintenance.quarantineBatch(spark,
      Seq(late1).toDF(), mart, quarantine, batchId = 777L)
    assert(n1 === 1L && n2 === 1L)
    assert(StreamingMartMaintenance.quarantined(spark, quarantine, schema)
      .filter(col("l_partkey") === 1 && col("l_suppkey") === 1).count()
      === 2L, // the streamed capture + ONE copy from batch 777
      "a replayed tee batch appended instead of overwriting")

    // an empty mart quarantines nothing (no committed boundary yet)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(late1).toDF(), s"$dir/never-built", quarantine, 1L) === 0L)
  }

  test("a LAGGING tee over-quarantines an absorbed row: foldBack stays exact where the blind union double-counts", graft.Slow) {
    // ADVICE r16: nothing enforces tee-before-fold in production — a
    // tee processing offsets AFTER the fold committed their day
    // classifies absorbed rows as unreachable and quarantines them.
    // Drive the bodies directly in exactly that order.
    val dir = java.nio.file.Files.createTempDirectory("graft-smm-lag").toString
    val mart = s"$dir/mart"
    val quarantine = s"$dir/quarantine"
    def partialsOf(rows: Seq[MartRow]): DataFrame =
      rows.toDF()
        .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
        .groupBy(window(col("_ship_ts"), "1 day"),
          col("l_partkey"), col("l_suppkey"))
        .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
        .drop("window", "_ship_ts")

    val absorbed = Seq(row(1, 1, 100.0, 2, 1), row(2, 1, 90.0, 3, 2))
    val genuinelyLate = row(3, 3, 50.0, 1, 1)
    // fold FIRST (both days commit), tee only afterwards — the lag
    StreamingMartMaintenance.applyBatch(spark, partialsOf(absorbed), mart, 8)
    // the lagging tee replays an absorbed row + delivers the late one:
    // both days are committed, so BOTH rows land in quarantine
    val n = StreamingMartMaintenance.quarantineBatch(spark,
      Seq(absorbed.head, genuinelyLate).toDF(), mart, quarantine, 1L)
    assert(n === 2L, s"the lagging tee should over-capture both rows, got $n")

    val truth = tmp("lag-truth")
    SupplyMart.refresh(spark, (absorbed :+ genuinelyLate).toDF(), truth, 8)

    // the seam is real: the BLIND union double-counts the absorbed row
    val schema = Seq.empty[MartRow].toDF().schema
    val blindTwin = tmp("lag-blind")
    SupplyMart.refresh(spark, absorbed.toDF().unionByName(
      StreamingMartMaintenance.quarantined(spark, quarantine, schema)),
      blindTwin, 8)
    assert(martRows(blindTwin) !== martRows(truth),
      "expected the blind log ∪ quarantine union to double-count — " +
        "if it no longer does, the over-capture seam moved; re-derive")

    // foldBack subtracts the over-captured copy and converges exactly
    assert(StreamingMartMaintenance.foldBack(spark, absorbed.toDF(),
      quarantine, mart, buckets = 8) > 0)
    assert(martRows(mart) === martRows(truth),
      "foldBack must count an over-quarantined absorbed row exactly once")

    // bag semantics: TRUE duplicate rows keep their multiplicity — two
    // identical absorbed copies in the log, one over-captured: the
    // subtraction removes one quarantine copy per log copy, and the
    // repair still counts both absorbed copies
    val dupDir = java.nio.file.Files.createTempDirectory("graft-smm-dup").toString
    val dupMart = s"$dupDir/mart"; val dupQ = s"$dupDir/quarantine"
    val twice = Seq(row(5, 5, 10.0, 1, 1), row(5, 5, 10.0, 1, 1))
    StreamingMartMaintenance.applyBatch(spark, partialsOf(twice), dupMart, 8)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(twice.head).toDF(), dupMart, dupQ, 1L) === 1L)
    StreamingMartMaintenance.foldBack(spark, twice.toDF(), dupQ, dupMart, 8)
    val dupTruth = tmp("dup-truth")
    SupplyMart.refresh(spark, twice.toDF(), dupTruth, 8)
    assert(martRows(dupMart) === martRows(dupTruth),
      "bag subtraction must preserve legitimate duplicate multiplicity")
  }

  // ---- keyed foldBack (r18 directive 3) --------------------------------

  private def krow(ok: Long, ln: Int, pk: Long, sk: Long, price: Double,
      qty: Double, day: Int) =
    KeyedMartRow(ok, ln, pk, sk, price, qty, ts(day))

  private def keyedPartials(rows: Seq[KeyedMartRow]): DataFrame =
    rows.toDF()
      .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
      .groupBy(window(col("_ship_ts"), "1 day"),
        col("l_partkey"), col("l_suppkey"))
      .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
      .drop("window", "_ship_ts")

  test("a split duplicate mis-repairs under the bag form and repairs EXACTLY under keyCols") {
    // the documented bag residual, planted: rows A (absorbed) and B
    // (dropped→quarantined) are byte-identical in every MEASURE column
    // — same part, supplier, price, quantity, day — and differ only in
    // the unique row key. Bag subtraction cannot tell B from A's log
    // copy and removes it; key subtraction cannot confuse them.
    val a = krow(100, 1, 1, 1, 50.0, 2, 1)
    val b = krow(200, 7, 1, 1, 50.0, 2, 1) // same bytes, different key
    val dir = java.nio.file.Files.createTempDirectory("graft-smm-key").toString
    val quarantine = s"$dir/quarantine"

    val truth = tmp("key-truth")
    SupplyMart.refresh(spark, Seq(a, b).toDF(), truth, 8)

    // bag form over the KEYLESS projection (the 5-column MartRow shape
    // the residual is documented on — with the key columns present even
    // exceptAll can tell A from B): the subtraction eats B
    val bagMart = s"$dir/bag-mart"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), bagMart, 8)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(b).toDF(), bagMart, quarantine, 1L) === 1L)
    StreamingMartMaintenance.foldBack(spark,
      Seq(a).toDF().drop("l_orderkey", "l_linenumber"), quarantine,
      bagMart, 8)
    assert(martRows(bagMart) !== martRows(truth),
      "expected the bag form to PROVABLY mis-repair the planted split " +
        "duplicate — if it converged, the planted case no longer " +
        "exercises the residual; re-derive it")

    // keyed form over the SAME quarantine: B survives the subtraction
    val keyMart = s"$dir/key-mart"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), keyMart, 8)
    assert(StreamingMartMaintenance.foldBack(spark, Seq(a).toDF(), quarantine,
      keyMart, 8, keyCols = Seq("l_orderkey", "l_linenumber")) > 0)
    assert(martRows(keyMart) === martRows(truth),
      "keyCols must repair the split duplicate exactly")
  }

  test("keyed foldBack stays exact under tee over-capture, and refuses a broken key contract", graft.Slow) {
    // over-capture under keys: the lagging tee quarantined the absorbed
    // row A (same key on both sides) AND the genuinely-late row B — the
    // keyed subtraction drops exactly A's copy
    val a = krow(300, 1, 2, 2, 80.0, 1, 1)
    val b = krow(301, 1, 3, 3, 60.0, 2, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-smm-keyoc").toString
    val mart = s"$dir/mart"; val quarantine = s"$dir/quarantine"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), mart, 8)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(a, b).toDF(), mart, quarantine, 1L) === 2L)
    val truth = tmp("keyoc-truth")
    SupplyMart.refresh(spark, Seq(a, b).toDF(), truth, 8)
    StreamingMartMaintenance.foldBack(spark, Seq(a).toDF(), quarantine, mart,
      8, keyCols = Seq("l_orderkey", "l_linenumber"))
    assert(martRows(mart) === martRows(truth),
      "keyed subtraction must count an over-quarantined absorbed row once")

    // a repeated "unique" key refuses loudly instead of corrupting
    val dupDir = java.nio.file.Files.createTempDirectory("graft-smm-keydup").toString
    val dm = s"$dupDir/mart"; val dq = s"$dupDir/quarantine"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), dm, 8)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(b, b).toDF(), dm, dq, 1L) === 2L)
    val eDup = intercept[IllegalStateException] {
      StreamingMartMaintenance.foldBack(spark, Seq(a).toDF(), dq, dm, 8,
        keyCols = Seq("l_orderkey", "l_linenumber"))
    }
    assert(eDup.getMessage.contains("not unique"))

    // a shared key with DIFFERENT payload bytes refuses loudly — the
    // key does not determine the row, so no silent absorb
    val misDir = java.nio.file.Files.createTempDirectory("graft-smm-keymis").toString
    val mm = s"$misDir/mart"; val mq = s"$misDir/quarantine"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), mm, 8)
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      Seq(a.copy(l_extendedprice = 999.0)).toDF(), mm, mq, 1L) === 1L)
    val eMis = intercept[IllegalStateException] {
      StreamingMartMaintenance.foldBack(spark, Seq(a).toDF(), mq, mm, 8,
        keyCols = Seq("l_orderkey", "l_linenumber"))
    }
    assert(eMis.getMessage.contains("does not determine"))

    // a key column the frames lack refuses at the door
    val eMissing = intercept[IllegalArgumentException] {
      StreamingMartMaintenance.foldBack(spark, Seq(a).toDF(), mq, mm, 8,
        keyCols = Seq("no_such_col"))
    }
    assert(eMissing.getMessage.contains("no_such_col"))

    // a NULL key refuses — an equi-join never matches null keys, so a
    // null-keyed absorbed row would silently survive the subtraction
    // and double-count (review wave r18)
    val nullDir = java.nio.file.Files.createTempDirectory("graft-smm-keynull").toString
    val nm = s"$nullDir/mart"; val nq = s"$nullDir/quarantine"
    StreamingMartMaintenance.applyBatch(spark, keyedPartials(Seq(a)), nm, 8)
    val nullKeyed = Seq(a).toDF()
      .withColumn("l_orderkey", lit(null).cast("long"))
    assert(StreamingMartMaintenance.quarantineBatch(spark,
      nullKeyed, nm, nq, 1L) === 1L)
    val eNull = intercept[IllegalStateException] {
      StreamingMartMaintenance.foldBack(spark, nullKeyed, nq, nm, 8,
        keyCols = Seq("l_orderkey", "l_linenumber"))
    }
    assert(eNull.getMessage.contains("NULL"), eNull.getMessage)
  }

  test("a replayed micro-batch is shed exactly — SUM partials never double") {
    val mart = tmp("replay")
    def partialsOf(rows: Seq[MartRow]): DataFrame =
      rows.toDF()
        .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
        .groupBy(window(col("_ship_ts"), "1 day"),
          col("l_partkey"), col("l_suppkey"))
        .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
        .drop("window", "_ship_ts")

    val b1 = partialsOf(Seq(row(1, 1, 100.0, 2, 1), row(2, 1, 90.0, 3, 1)))
    val b2 = partialsOf(Seq(row(1, 1, 80.0, 1, 2), row(2, 2, 40.0, 2, 2)))
    StreamingMartMaintenance.applyBatch(spark, b1, mart, buckets = 8)
    StreamingMartMaintenance.applyBatch(spark, b2, mart, buckets = 8)
    val settled = martRows(mart)
    val b2Count = b2.count()

    // plain at-least-once redelivery: watermark already advanced, the
    // whole batch is below the mark — full no-op
    val redelivered = StreamingMartMaintenance.applyBatch(spark, b2, mart, 8)
    assert(redelivered.touched === 0)
    assert(martRows(mart) === settled, "redelivered batch changed the mart")

    // the harder window: mart commit landed, watermark write lost —
    // the per-partition guard must shed the replay row-for-row
    val wmAfterB1 = {
      // reconstruct: b1's max ship is the mark the crash rewound to
      b1.agg(max(col("max_ship_us"))).head().getLong(0)
    }
    Incremental.writeWatermark(spark, mart, wmAfterB1)
    val retry = StreamingMartMaintenance.applyBatch(spark, b2, mart, 8)
    assert(retry.touched === 0)
    assert(retry.replayShedRows === b2Count,
      s"expected the full replay ($b2Count rows) shed, got ${retry.replayShedRows}")
    assert(martRows(mart) === settled,
      "crash-retry replay double-counted SUM partials")
    // the retry re-advanced the mark (the value the crashed attempt
    // was about to write), so the next delivery is a clean no-op
    assert(Incremental.watermark(spark, mart) > wmAfterB1)
  }

  test("a day window straddling a mid-day batch watermark refuses loudly (no double count)") {
    // review-wave finding: mart seeded by a batch refresh whose raw
    // rows end MID-day; the stream then finalizes that whole day's
    // window — its partial contains the morning rows already in the
    // mart but carries a later max ship, so the guard would admit it
    // whole and double the SUMs. The fold must refuse, not corrupt.
    val mart = tmp("straddle")
    val morning = MartRow(1, 1, 100.0, 2,
      Timestamp.valueOf("1995-01-03 08:00:00"))
    SupplyMart.refresh(spark, Seq(morning).toDF(), mart, 8) // wm mid-day 3
    val fullDay3 = Seq(morning,
      MartRow(1, 1, 80.0, 1, Timestamp.valueOf("1995-01-03 18:00:00"))).toDF()
      .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
      .groupBy(window(col("_ship_ts"), "1 day"),
        col("l_partkey"), col("l_suppkey"))
      .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
      .drop("window", "_ship_ts")
    val before = martRows(mart)
    val e = intercept[IllegalStateException] {
      StreamingMartMaintenance.applyBatch(spark, fullDay3, mart, 8)
    }
    assert(e.getMessage.contains("day-straddling"),
      s"refusal must name the contract: ${e.getMessage}")
    assert(martRows(mart) === before, "refused batch still wrote state")
    // the lock must not leak from the refusal; a day-aligned feed works
    val day4 = Seq(MartRow(2, 1, 50.0, 1,
      Timestamp.valueOf("1995-01-04 09:00:00"))).toDF()
      .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
      .groupBy(window(col("_ship_ts"), "1 day"),
        col("l_partkey"), col("l_suppkey"))
      .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
      .drop("window", "_ship_ts")
    assert(StreamingMartMaintenance.applyBatch(spark, day4, mart, 8)
      .touched > 0)
  }

  test("empty batches are full no-ops; stream- and batch-fed refreshes interleave") {
    val mart = tmp("mixed")
    val empty = StreamingMartMaintenance.applyBatch(spark,
      Seq.empty[MartRow].toDF()
        .select(col("l_partkey"), col("l_suppkey"),
          lit(0L).as("cost_c"), lit(0L).as("value_c"),
          lit(0L).as("max_ship_us")),
      mart, buckets = 8)
    assert(empty.touched === 0)
    assert(!new java.io.File(mart).exists() ||
      new java.io.File(mart).listFiles().isEmpty,
      "an empty first batch must not create mart state")

    // batch seeds, stream extends — same layout, same guards
    SupplyMart.refresh(spark, Seq(row(1, 1, 100.0, 2, 1)).toDF(), mart, 8)
    val part = Seq(row(1, 1, 80.0, 1, 2), row(2, 1, 90.0, 3, 2)).toDF()
      .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
      .groupBy(window(col("_ship_ts"), "1 day"),
        col("l_partkey"), col("l_suppkey"))
      .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
      .drop("window", "_ship_ts")
    val r = StreamingMartMaintenance.applyBatch(spark, part, mart, 8)
    assert(r.touched > 0)
    val twin = tmp("mixedtwin")
    SupplyMart.refresh(spark, Seq(row(1, 1, 100.0, 2, 1),
      row(1, 1, 80.0, 1, 2), row(2, 1, 90.0, 3, 2)).toDF(), twin, 8)
    assert(martRows(mart) === martRows(twin))
  }
}
