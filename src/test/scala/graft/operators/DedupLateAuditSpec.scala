package graft.operators

import graft.{SparkSpec, Tables}
import graft.registry.Incremental
import org.apache.spark.sql.functions._

/** The id-axis late-arrival audit (r15 verdict item 2): the two
  * remaining high-water consumers — [[IncrementalDedup]] (doc ids) and
  * [[IncrementalEmbedDedup]] (vec ids) — shed below-watermark arrivals
  * BY DESIGN, and now measure the shed exactly like the ts-axis
  * protocol does (LateAuditSpec's contract, re-pinned here per
  * operator): zero on an ordered feed, the exact arrival count on an
  * out-of-order one, never inflated by crash-retry replays, and
  * repaired by each operator's `reconcile` (a documented full rebuild
  * — cluster labels are corpus-global min-ids, so no partition grain
  * exists to repair at). */
class DedupLateAuditSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dla-$tag").toString

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")
  private def vecs = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("text dedup: ordered feed audits zero late rows at every refresh", graft.Slow) {
    val state = tmp("txt-ordered")
    for (cut <- Seq(200L, 350L, Long.MaxValue)) {
      val r = IncrementalDedup.refresh(spark,
        docs.filter(col("doc_id") < cut), state, threshold = 0.5)
      assert(r.lateRows === 0L, s"ordered feed (cut $cut) read late rows")
    }
  }

  test("text dedup: out-of-order ids surface the exact late count; reconcile repairs to one-shot parity") {
    val state = tmp("txt-ooo")
    val lateSet = docs.filter(col("doc_id") < 200)
    val lateCount = lateSet.count()
    // high ids arrive first and advance the mark over the low ones
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") >= 200),
      state, threshold = 0.5)
    val r = IncrementalDedup.refresh(spark, docs, state, threshold = 0.5)
    assert(r.fresh === 0L, "below-mark docs must not be merged")
    assert(r.lateRows === lateCount,
      s"expected exactly $lateCount late docs, got ${r.lateRows}")
    // cumulative, not additive
    assert(IncrementalDedup.refresh(spark, docs, state, threshold = 0.5)
      .lateRows === lateCount)

    val rec = IncrementalDedup.reconcile(spark, docs, state, threshold = 0.5)
    assert(rec.fresh === docs.count())
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "reconciled cluster state diverged from the one-shot recompute")
    val after = IncrementalDedup.refresh(spark, docs, state, threshold = 0.5)
    assert(after.fresh === 0L && after.lateRows === 0L,
      "audit must read clean after reconcile")
  }

  test("text dedup: crash retry reads replays as zero late loss; delta feeds under-report clamped", graft.Slow) {
    val state = tmp("txt-crash")
    val d = Seq((1L, "a b c d e f"), (2L, "p q r s t u"),
      (3L, "x y z w v u"), (4L, "m n o p q r")).toDF("doc_id", "text")
    IncrementalDedup.refresh(spark, d.filter(col("doc_id") <= 2), state,
      threshold = 0.35)
    val (wm1, tally1) = Incremental.watermarkState(spark, state)
    IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    // the crash window: batch dirs committed, watermark write lost —
    // restore the pre-crash mark AND tally (one file, one swap)
    Incremental.writeWatermark(spark, state, wm1, tally1)
    val retry = IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    assert(retry.fresh === 2L, "retry must re-derive the lost batch")
    assert(retry.lateRows === 0L, "replays misread as late loss")
    assert(IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
      .lateRows === 0L)

    // delta-fed refreshes (chunks that no longer carry incorporated
    // rows) must under-report clamped at zero, and the next full-corpus
    // refresh must read exact again
    val state2 = tmp("txt-chunks")
    IncrementalDedup.refresh(spark, d.filter(col("doc_id") <= 2), state2,
      threshold = 0.35)
    val chunk = IncrementalDedup.refresh(spark,
      d.filter(col("doc_id") > 2), state2, threshold = 0.35)
    assert(chunk.fresh === 2L && chunk.lateRows === 0L)
    assert(IncrementalDedup.refresh(spark, d, state2, threshold = 0.35)
      .lateRows === 0L, "full-corpus read after delta feeds must be exact")
  }

  test("embed dedup: ordered feed zero, out-of-order exact, reconcile repairs to one-shot parity", graft.Slow) {
    val stateOrd = tmp("emb-ordered")
    for (cut <- Seq(150L, 350L, Long.MaxValue)) {
      val r = IncrementalEmbedDedup.refresh(spark,
        vecs.filter(col("vec_id") < cut), stateOrd, threshold = 0.3)
      assert(r.lateRows === 0L, s"ordered feed (cut $cut) read late rows")
    }

    val state = tmp("emb-ooo")
    val lateCount = vecs.filter(col("vec_id") < 150).count()
    IncrementalEmbedDedup.refresh(spark, vecs.filter(col("vec_id") >= 150),
      state, threshold = 0.3)
    val r = IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3)
    assert(r.fresh === 0L)
    assert(r.lateRows === lateCount,
      s"expected exactly $lateCount late vectors, got ${r.lateRows}")

    val rec = IncrementalEmbedDedup.reconcile(spark, vecs, state,
      threshold = 0.3)
    assert(rec.fresh === vecs.count())
    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64,
      threshold = 0.3)
    assert(full.count() > 0, "scenario degenerate: no pairs to find")
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "reconciled pair set diverged from the one-shot operator")
    val after = IncrementalEmbedDedup.refresh(spark, vecs, state,
      threshold = 0.3)
    assert(after.fresh === 0L && after.lateRows === 0L,
      "audit must read clean after reconcile")
  }

  test("embed dedup: crash retry zero late loss; the delta-feed contract stays clamped", graft.Slow) {
    val state = tmp("emb-crash")
    IncrementalEmbedDedup.refresh(spark, vecs.filter(col("vec_id") < 250),
      state, threshold = 0.3)
    val (wm1, tally1) = Incremental.watermarkState(spark, state)
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") >= 250), state, threshold = 0.3)
    Incremental.writeWatermark(spark, state, wm1, tally1) // crash window
    // the retry arrives with ONLY its delta (the operator's documented
    // feed shape): replays re-derive, late stays zero
    val retry = IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") >= 250), state, threshold = 0.3)
    assert(retry.fresh === vecs.filter(col("vec_id") >= 250).count())
    assert(retry.lateRows === 0L, "replays misread as late loss")
    // and the full-corpus audit reads exact afterwards
    assert(IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3)
      .lateRows === 0L)
  }

  test("an interrupted reconcile wipe refuses plain refresh; reconcile retry repairs", graft.Slow) {
    // review wave r16: the rebuild lands at batch=init (tag MinValue),
    // and a pre-wipe snapshot dir SURVIVING a mid-wipe crash would
    // outrank it in latest-tag resolution once the mark re-advances —
    // stale labels under a fresh mark, audit reading zero. The
    // _rebuild_pending marker makes any non-reconcile entry refuse.
    val state = tmp("txt-wipe")
    val d = Seq((1L, "a b c d e f"), (2L, "p q r s t u"),
      (3L, "x y z w v u")).toDF("doc_id", "text")
    IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    // reconstruct the crash: marker written, watermark gone, one
    // snapshot dir still standing
    graft.operators.BatchedState.beginRebuild(spark, state)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$state/._watermark.crc"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$state/_watermark"))
    val e = intercept[IllegalStateException] {
      IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    }
    assert(e.getMessage.contains("reconcile"), e.getMessage)
    // the blessed recovery: reconcile re-wipes idempotently
    val rec = IncrementalDedup.reconcile(spark, d, state, threshold = 0.35)
    assert(rec.fresh === 3L)
    assert(!new java.io.File(s"$state/_rebuild_pending").exists)
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(d, threshold = 0.35)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0)
    // and refresh works again afterwards
    assert(IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
      .fresh === 0L)

    val state2 = tmp("emb-wipe")
    IncrementalEmbedDedup.refresh(spark, vecs.limit(100), state2,
      threshold = 0.3)
    graft.operators.BatchedState.beginRebuild(spark, state2)
    val e2 = intercept[IllegalStateException] {
      IncrementalEmbedDedup.refresh(spark, vecs, state2, threshold = 0.3)
    }
    assert(e2.getMessage.contains("reconcile"), e2.getMessage)
    assert(IncrementalEmbedDedup.reconcile(spark, vecs, state2,
      threshold = 0.3).fresh === vecs.count())
  }

  test("lateSink captures the below-mark rows exactly; reconcile over log ∪ captured ≡ one-shot; retries collapse", graft.Slow) {
    // r17 directive 4: G48 counted late arrivals — the sink keeps the
    // ROWS (the G45 quarantine convention on the id axis), so the
    // repair has evidence and the fold-back identity is checkable.
    val state = tmp("txt-sink")
    val sink = tmp("txt-sink-q")
    val log = docs.filter(col("doc_id") >= 200) // the delivered feed
    val missed = docs.filter(col("doc_id") < 200)
    IncrementalDedup.refresh(spark, log, state, threshold = 0.5)
    // the out-of-order full-corpus delivery, capture on
    val r = IncrementalDedup.refresh(spark, docs, state, threshold = 0.5,
      lateSink = Some(sink))
    val captured = IncrementalDedup.lateArrivals(spark, sink)
    assert(captured.count() === r.lateRows,
      "capture and count must agree on a full-corpus feed")
    assert(captured.select("doc_id").except(missed.select("doc_id")).count() === 0 &&
      missed.select("doc_id").except(captured.select("doc_id")).count() === 0,
      "captured set must be EXACTLY the below-mark rows the state never saw")
    // a crash retry of the same delivery appends a duplicate capture;
    // the reader collapses by id — still exact
    IncrementalDedup.refresh(spark, docs, state, threshold = 0.5,
      lateSink = Some(sink))
    assert(IncrementalDedup.lateArrivals(spark, sink).count() === r.lateRows,
      "duplicate captures from retries must collapse by id")
    // the fold-back identity: reconcile over log ∪ captured ≡ one-shot
    IncrementalDedup.reconcile(spark,
      log.unionByName(IncrementalDedup.lateArrivals(spark, sink)), state,
      threshold = 0.5)
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "reconcile over log ∪ captured diverged from the one-shot")

    // membership-exactness needs NO full-corpus feed: a late-only
    // delta delivery captures exactly itself (where the tally
    // arithmetic under-reports, clamped — the documented contrast)
    val state2 = tmp("txt-sink-delta")
    val sink2 = tmp("txt-sink-delta-q")
    IncrementalDedup.refresh(spark, log, state2, threshold = 0.5)
    val lateOnly = docs.filter(col("doc_id") < 100)
    val r2 = IncrementalDedup.refresh(spark, lateOnly, state2,
      threshold = 0.5, lateSink = Some(sink2))
    assert(r2.lateRows === 0L, "tally under-reports on a delta feed (documented)")
    assert(IncrementalDedup.lateArrivals(spark, sink2).count() ===
      lateOnly.count(),
      "capture must be row-exact even on the delta feed the tally clamps on")

    // embed twin: capture ≡ below-mark set, fold-back ≡ one-shot
    val state3 = tmp("emb-sink")
    val sink3 = tmp("emb-sink-q")
    val vlog = vecs.filter(col("vec_id") >= 150)
    IncrementalEmbedDedup.refresh(spark, vlog, state3, threshold = 0.3)
    val r3 = IncrementalEmbedDedup.refresh(spark, vecs, state3,
      threshold = 0.3, lateSink = Some(sink3))
    val vCaptured = IncrementalEmbedDedup.lateArrivals(spark, sink3)
    assert(vCaptured.count() === r3.lateRows)
    assert(vCaptured.select("vec_id")
      .except(vecs.filter(col("vec_id") < 150).select("vec_id")).count() === 0)
    IncrementalEmbedDedup.reconcile(spark,
      vlog.unionByName(vCaptured), state3, threshold = 0.3)
    val incP = IncrementalEmbedDedup.pairs(spark, state3)
    val fullP = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64,
      threshold = 0.3)
    assert(incP.except(fullP).count() === 0 && fullP.except(incP).count() === 0,
      "embed reconcile over log ∪ captured diverged from the one-shot")
  }

  test("a mis-fed reconcile refuses BEFORE the wipe: empty and below-mark feeds leave state intact") {
    // ADVICE r16: reconcile wiped the watermark and every state dir
    // before looking at its input — an empty (or delta-fed) frame
    // destroyed all committed state and returned (0, 0) silently.
    val d = Seq((1L, "a b c d e f"), (2L, "p q r s t u"),
      (3L, "x y z w v u")).toDF("doc_id", "text")

    val state = tmp("txt-guard")
    IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    val before = IncrementalDedup.assignments(spark, state)
      .collect().map(_.toSeq).toSet
    val wmBefore = Incremental.watermark(spark, state)

    val eEmpty = intercept[IllegalStateException] {
      IncrementalDedup.reconcile(spark, d.filter(col("doc_id") > 99),
        state, threshold = 0.35)
    }
    assert(eEmpty.getMessage.contains("EMPTY"), eEmpty.getMessage)
    // a frame missing the state's highest ids is provably not the corpus
    val eBelow = intercept[IllegalStateException] {
      IncrementalDedup.reconcile(spark, d.filter(col("doc_id") <= 2),
        state, threshold = 0.35)
    }
    assert(eBelow.getMessage.contains("BELOW the committed watermark"),
      eBelow.getMessage)
    // nothing was wiped: state, mark, and refreshability all intact
    assert(Incremental.watermark(spark, state) === wmBefore)
    assert(IncrementalDedup.assignments(spark, state)
      .collect().map(_.toSeq).toSet === before,
      "a refused reconcile must leave the label state untouched")
    assert(!new java.io.File(s"$state/_rebuild_pending").exists,
      "a refused reconcile must not leave the rebuild marker standing")
    assert(IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
      .fresh === 0L)
    // max id EQUAL to the mark is the legal repair shape (late rows
    // add no new ids) — the guard must not block it
    assert(IncrementalDedup.reconcile(spark, d, state, threshold = 0.35)
      .fresh === 3L)

    // same guard, embed operator
    val state2 = tmp("emb-guard")
    IncrementalEmbedDedup.refresh(spark, vecs, state2, threshold = 0.3)
    val wm2 = Incremental.watermark(spark, state2)
    val pairsBefore = IncrementalEmbedDedup.pairs(spark, state2).count()
    intercept[IllegalStateException] {
      IncrementalEmbedDedup.reconcile(spark,
        vecs.filter(col("vec_id") < 0), state2, threshold = 0.3)
    }
    val eB2 = intercept[IllegalStateException] {
      IncrementalEmbedDedup.reconcile(spark,
        vecs.filter(col("vec_id") < 150), state2, threshold = 0.3)
    }
    assert(eB2.getMessage.contains("BELOW the committed watermark"))
    assert(Incremental.watermark(spark, state2) === wm2)
    assert(IncrementalEmbedDedup.pairs(spark, state2).count() === pairsBefore,
      "a refused embed reconcile must leave the pair state untouched")
  }

  test("a partial feed CONTAINING the max id refuses on the count floor; the late-repair superset passes — both operators", graft.Slow) {
    // r18 directive 4 — the one-directional guard's blind spot: a
    // partial feed that happens to include the newest document reaches
    // the watermark and used to sail through, wiping state. The
    // committed corpus tally (stored beside the mark, one swap) is the
    // second direction: feed count < tally = provably partial.
    val d = Seq((1L, "a b c d e f"), (2L, "p q r s t u"),
      (4L, "x y z w v u"), (5L, "m n o p q r")).toDF("doc_id", "text")
    val state = tmp("txt-floor")
    IncrementalDedup.refresh(spark, d, state, threshold = 0.35) // tally = 4
    val before = IncrementalDedup.assignments(spark, state)
      .collect().map(_.toSeq).toSet
    val e = intercept[IllegalStateException] {
      IncrementalDedup.reconcile(spark, d.filter(col("doc_id") >= 4),
        state, threshold = 0.35) // contains max id 5, but 2 rows < 4
    }
    assert(e.getMessage.contains("incorporated"), e.getMessage)
    assert(IncrementalDedup.assignments(spark, state)
      .collect().map(_.toSeq).toSet === before,
      "the count-floor refusal must leave state untouched")
    // the LEGAL late-repair superset (log ∪ a below-mark arrival the
    // state never saw): count 5 ≥ 4, max id = mark — passes
    val late = Seq((3L, "h i j k l m")).toDF("doc_id", "text")
    assert(IncrementalDedup.reconcile(spark, d.unionByName(late), state,
      threshold = 0.35).fresh === 5L)

    // same floor, embed operator
    val state2 = tmp("emb-floor")
    val n = vecs.count()
    IncrementalEmbedDedup.refresh(spark, vecs, state2, threshold = 0.3)
    val maxVec = vecs.agg(max(col("vec_id"))).head().getLong(0)
    val e2 = intercept[IllegalStateException] {
      IncrementalEmbedDedup.reconcile(spark,
        vecs.filter(col("vec_id") > maxVec / 2), state2, threshold = 0.3)
    }
    assert(e2.getMessage.contains("incorporated"), e2.getMessage)
    // the identical re-feed (count == tally) stays legal
    assert(IncrementalEmbedDedup.reconcile(spark, vecs, state2,
      threshold = 0.3).fresh === n)

    // honest degradation: an UNAUDITED refresh drops the tally, so the
    // floor is unavailable and only the max-id direction holds — the
    // documented trade until the next audited refresh re-baselines
    val state3 = tmp("txt-unaudited")
    IncrementalDedup.refresh(spark, d, state3, threshold = 0.35,
      audit = false)
    assert(IncrementalDedup.reconcile(spark, d.filter(col("doc_id") >= 4),
      state3, threshold = 0.35).fresh === 2L,
      "without a tally the partial-with-max-id feed is undetectable, as documented")
  }

  test("the baselining refresh must be full-fed: a delta-fed baseline over-reports, as documented", graft.Slow) {
    // the protocol's chunk-fed caveat on the id axis (review wave r16,
    // pinned as DOCUMENTED behavior, not fixed away: with no stored
    // tally the engine cannot distinguish 'this delta is everything'
    // from 'a corpus predates this delta')
    val state = tmp("txt-baseline")
    val d = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"),
      (4L, "j k l")).toDF("doc_id", "text")
    IncrementalDedup.refresh(spark, d.filter(col("doc_id") <= 2), state,
      threshold = 0.35)
    // drop the tally (legacy/bare mark)
    val wm = Incremental.watermark(spark, state)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$state/._watermark.crc"))
    val w = new java.io.FileWriter(s"$state/_watermark")
    w.write(wm.toString); w.close()
    // the baselining refresh arrives DELTA-FED: baseline pins at 0
    IncrementalDedup.refresh(spark, d.filter(col("doc_id") > 2), state,
      threshold = 0.35): Unit
    // the next full feed over-reports the pre-baseline docs as late —
    // exactly what the caveat documents; reconcile clears it
    val r = IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
    assert(r.lateRows === 2L,
      "documented over-report: pre-baseline docs read as late after a " +
        s"delta-fed baseline (got ${r.lateRows})")
    IncrementalDedup.reconcile(spark, d, state, threshold = 0.35): Unit
    assert(IncrementalDedup.refresh(spark, d, state, threshold = 0.35)
      .lateRows === 0L)
  }

  test("legacy bare-long watermark baselines on first audited read, both operators", graft.Slow) {
    def rewriteBare(state: String): Unit = {
      val wm = Incremental.watermark(spark, state)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$state/._watermark.crc"))
      val w = new java.io.FileWriter(s"$state/_watermark")
      w.write(wm.toString); w.close()
      assert(Incremental.watermarkState(spark, state) === (wm, None))
    }
    val s1 = tmp("txt-legacy")
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") >= 200), s1,
      threshold = 0.5)
    rewriteBare(s1)
    // pre-upgrade below-mark docs are presumed incorporated: late = 0
    assert(IncrementalDedup.refresh(spark, docs, s1, threshold = 0.5)
      .lateRows === 0L)
    assert(Incremental.watermarkState(spark, s1)._2.isDefined,
      "baseline was not pinned on the no-op audited refresh")

    val s2 = tmp("emb-legacy")
    IncrementalEmbedDedup.refresh(spark, vecs.filter(col("vec_id") >= 150),
      s2, threshold = 0.3)
    rewriteBare(s2)
    assert(IncrementalEmbedDedup.refresh(spark, vecs, s2, threshold = 0.3)
      .lateRows === 0L)
    assert(Incremental.watermarkState(spark, s2)._2.isDefined)
  }
}
