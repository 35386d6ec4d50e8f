package graft.registry

import graft.{SparkSpec, Tables}
import graft.operators.{BatchedState, SupplyMart}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The high-water tier's last silent-loss boundary, converted to a
  * measured signal (r14 directive 1): rows arriving below the
  * committed watermark are shed BY DESIGN, and
  * [[IncrementalProtocol.RefreshResult.lateRows]] must count them
  * EXACTLY — zero on an ordered log, the precise arrival count on an
  * out-of-order one, never inflated by crash-retry replays. Both
  * callers (day-partitioned events, bucket-partitioned supply mart)
  * are covered, plus the `_pending_commit` tear detection for the
  * delete-then-rename window inside dynamic partition overwrite. */
class LateAuditSpec extends SparkSpec {

  private def events: DataFrame = Tables.events(spark, sf)
  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-late-$tag")
      .toString + "/snap"

  private def tsUs = unix_micros(col("ts"))

  test("ordered log: zero late rows, zero replay shed, at every refresh") {
    val p = tmpDir("ordered")
    val bounds = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.33, 0.66), 0.0).map(_.toLong)
    // full-log contract: each refresh sees everything ingested SO FAR
    val feeds = Seq(
      events.filter(tsUs <= bounds(0)),
      events.filter(tsUs <= bounds(1)),
      events)
    feeds.foreach { feed =>
      val r = Incremental.refresh(spark, feed, p)
      assert(r.lateRows === 0L, "ordered ingestion reported late rows")
      assert(r.replayShedRows === 0L, "no crash, yet replays were shed")
    }
  }

  test("out-of-order log: the exact shed count surfaces, and stays exact") {
    val p = tmpDir("ooo")
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    val early = events.filter(tsUs <= bound)
    val earlyCount = early.count()
    assert(earlyCount > 0)

    // the late half arrives FIRST and advances the mark over the early
    // half — the classic non-ingestion-ordered log
    Incremental.refresh(spark, events.filter(tsUs > bound), p)
    // now the full log (early rows newly visible, all below the mark)
    val r2 = Incremental.refresh(spark, events, p)
    assert(r2.touched === 0, "below-mark rows must not be merged")
    assert(r2.lateRows === earlyCount,
      s"expected exactly $earlyCount shed rows, got ${r2.lateRows}")
    // cumulative, not additive: the same reading on every refresh
    val r3 = Incremental.refresh(spark, events, p)
    assert(r3.lateRows === earlyCount)
    // audit is a measurement, not a merge: snapshot content unchanged
    assert(Incremental.read(spark, p).count() ===
      events.filter(tsUs > bound)
        .select(date_format(col("ts"), "yyyy-MM-dd"), col("user_id"))
        .distinct().count())
  }

  test("crash retry: replays are counted as shed replays, never as late loss") {
    val p = tmpDir("crash")
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    Incremental.refresh(spark, events.filter(tsUs <= bound), p)
    val wmEarly = Incremental.watermark(spark, p)
    Incremental.refresh(spark, events, p)
    val replaySize = events.filter(tsUs > wmEarly).count()

    // the crash window: snapshot committed, watermark write lost
    Incremental.writeWatermark(spark, p, wmEarly)
    val quarantined = collection.mutable.ArrayBuffer.empty[Long]
    val retry = Incremental.refresh(spark, events, p,
      shedSink = Some(df => quarantined += df.count()))
    assert(retry.touched === 0)
    assert(retry.replayShedRows === replaySize,
      "the retry's replay set must surface exactly")
    assert(retry.lateRows === 0L, "replays misread as late loss")
    assert(quarantined.sum === replaySize,
      "shedSink must receive exactly the replay rows")
    // the retry re-advances the mark to what the crashed attempt was
    // about to write, so the NEXT refresh is a clean no-op
    assert(Incremental.watermark(spark, p) > wmEarly)
    val after = Incremental.refresh(spark, events, p)
    assert(after.replayShedRows === 0L && after.lateRows === 0L)
  }

  test("legacy bare-long watermark upgrades in place; arrivals after upgrade are measured") {
    val p = tmpDir("upgrade")
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    val firstHalf = events.filter(tsUs > bound) // late half first (ooo)
    Incremental.refresh(spark, firstHalf, p)
    val wm = Incremental.watermark(spark, p)
    // rewrite the watermark as the PRE-TALLY bare long (v1 format)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$p/._watermark.crc"))
    val w = new java.io.FileWriter(s"$p/_watermark")
    w.write(wm.toString); w.close()
    assert(Incremental.watermarkState(spark, p) === (wm, None))
    // first audited full-log refresh baselines: pre-upgrade rows below
    // the mark are presumed incorporated, so this reads 0 ...
    val r = Incremental.refresh(spark, events, p)
    assert(r.lateRows === 0L)
    assert(Incremental.watermarkState(spark, p)._2.isDefined,
      "baseline was not pinned to the upgraded watermark file")
  }

  test("an unaudited refresh drops the tally; the next audited one re-baselines honestly") {
    val p = tmpDir("optout")
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.4, 0.7), 0.0).map(_.toLong)
    assert(Incremental.refresh(spark, events.filter(tsUs <= bound(0)), p)
      .lateRows === 0L)
    assert(Incremental.watermarkState(spark, p)._2.isDefined)
    // opt-out refresh: incorporates more rows but writes a bare mark —
    // the tally is DROPPED, by design (arrivals during the unaudited
    // window cannot be attributed, so pretending continuity would lie)
    val unaudited = Incremental.refresh(spark,
      events.filter(tsUs <= bound(1)), p, audit = false)
    assert(unaudited.lateRows === -1L)
    assert(Incremental.watermarkState(spark, p)._2.isEmpty,
      "unaudited refresh must not carry a stale tally forward")
    // the next audited full-log refresh re-baselines: rows below the
    // mark are presumed incorporated, late restarts from zero
    assert(Incremental.refresh(spark, events, p).lateRows === 0L)
    assert(Incremental.watermarkState(spark, p)._2.isDefined)
  }

  test("supply mart: out-of-order shipdates surface the exact late count") {
    val li = Tables.lineitem(spark, sf)
    val mart = tmpDir("mart")
    val lateYears = li.filter(year(col("l_shipdate")) > 1995)
    val earlyCount = li.filter(year(col("l_shipdate")) <= 1995).count()
    SupplyMart.refresh(spark, lateYears, mart)
    val r = SupplyMart.refresh(spark, li, mart)
    assert(r.lateRows === earlyCount,
      s"mart audit expected $earlyCount, got ${r.lateRows}")
    assert(SupplyMart.refresh(spark, li, mart).lateRows === earlyCount)
  }

  test("reconcile folds the audited late rows in, rewriting only drifted day partitions") {
    val p = tmpDir("reconcile")
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    Incremental.refresh(spark, events.filter(tsUs > bound), p)
    val audited = Incremental.refresh(spark, events, p)
    assert(audited.lateRows > 0, "scenario degenerate: nothing was shed")

    // the snapshot's max day is complete in the late half — reconcile
    // must leave its files untouched (continuous serving on clean
    // partitions is the point of partition-grain repair)
    val maxDayDir = new java.io.File(p).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .maxBy(_.getName)
    val filesBefore = maxDayDir.listFiles
      .map(f => (f.getName, f.lastModified())).sorted.toSeq

    val repaired = Incremental.reconcile(spark, events, p)
    assert(repaired > 0)
    assert(maxDayDir.listFiles.map(f => (f.getName, f.lastModified()))
      .sorted.toSeq === filesBefore,
      "reconcile rewrote a partition whose content had not drifted")

    // byte-identity to the full compute, at the partials grain
    val fullP = tmpDir("reconcile-full")
    Incremental.full(spark, events, fullP)
    def partialRows(path: String) = spark.read.parquet(path)
      .select("user_id", "day", "n_events", "value_cents", "n_purchases",
        "max_ts_us")
      .collect().map(_.toSeq).toSet
    assert(partialRows(p) === partialRows(fullP),
      "reconciled snapshot diverged from the full compute")

    // and the audit reads clean from here on
    val after = Incremental.refresh(spark, events, p)
    assert(after.lateRows === 0L && after.touched === 0)
  }

  test("reconcile on a clean snapshot rewrites nothing") {
    val p = tmpDir("reconcile-clean")
    Incremental.refresh(spark, events, p)
    assert(Incremental.reconcile(spark, events, p) === 0)
  }

  test("supply mart reconcile: late shipdates fold in, audit reads clean") {
    val li = Tables.lineitem(spark, sf)
    val mart = tmpDir("mart-reconcile")
    SupplyMart.refresh(spark, li.filter(year(col("l_shipdate")) > 1995), mart)
    assert(SupplyMart.refresh(spark, li, mart).lateRows > 0)
    assert(SupplyMart.reconcile(spark, li, mart) > 0)
    val fullDirect = tmpDir("mart-reconcile-full")
    SupplyMart.refresh(spark, li, fullDirect)
    def rows(path: String) = SupplyMart.read(spark, path).collect()
      .map(_.toSeq).toSet
    assert(rows(mart) === rows(fullDirect))
    val after = SupplyMart.refresh(spark, li, mart)
    assert(after.lateRows === 0L && after.touched === 0)
  }

  test("torn dynamic-overwrite commit: an emptied recorded partition refuses loudly") {
    val p = tmpDir("torn")
    Incremental.refresh(spark, events, p)
    val days = new java.io.File(p).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).sorted
    assert(days.length >= 2)
    // the committer's window, reconstructed: the marker says these
    // partitions held data when the overwrite began; one of them was
    // delete()d and its rename never landed
    BatchedState.writePointer(spark, new Path(p, "_pending_commit"),
      Seq(days.head, days.last).mkString("\n"))
    val victim = new java.io.File(s"$p/day=${days.head}")
    victim.listFiles.foreach(_.delete())
    assert(victim.delete())
    val e = intercept[IllegalStateException] {
      Incremental.refresh(spark, events, p)
    }
    assert(e.getMessage.contains(s"day=${days.head}"),
      s"refusal must name the emptied partition: ${e.getMessage}")

    // benign marker (crash before any delete landed): refresh proceeds
    // and clears it
    val p2 = tmpDir("benign")
    Incremental.refresh(spark, events.filter(tsUs <= events
      .select(tsUs.as("us")).stat.approxQuantile("us", Array(0.5), 0.0)
      .head.toLong), p2)
    val d2 = new java.io.File(p2).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).head
    BatchedState.writePointer(spark, new Path(p2, "_pending_commit"),
      d2)
    val r2 = Incremental.refresh(spark, events, p2)
    assert(r2.touched > 0)
    assert(!new java.io.File(s"$p2/_pending_commit").exists,
      "completed refresh must clear the pending-commit marker")
  }

  test("a verified stale marker is cleared even by no-op and pure-replay refreshes") {
    // r15 ADVICE: the early-out and pure-replay returns skipped marker
    // cleanup, so a stale marker was re-verified forever — and turned
    // into a spurious torn-commit refusal if a listed partition was
    // later legitimately removed (e.g. by a reconcile's doomed delete)
    val p = tmpDir("stale-marker")
    Incremental.refresh(spark, events, p)
    val day = new java.io.File(p).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).head
    // stale but verifiable marker (partition still holds data)
    BatchedState.writePointer(spark, new Path(p, "_pending_commit"), day)
    val noop = Incremental.refresh(spark, events, p) // early-out: no new data
    assert(noop.touched === 0)
    assert(!new java.io.File(s"$p/_pending_commit").exists,
      "no-op refresh stranded the stale pending-commit marker")

    // pure-replay branch: snapshot committed, watermark rewound, every
    // past-mark row sheds — the marker must still be cleaned
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    val p2 = tmpDir("stale-marker-replay")
    Incremental.refresh(spark, events.filter(tsUs <= bound), p2)
    val wmEarly = Incremental.watermark(spark, p2)
    Incremental.refresh(spark, events, p2)
    Incremental.writeWatermark(spark, p2, wmEarly) // crash window
    val d2 = new java.io.File(p2).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).head
    BatchedState.writePointer(spark, new Path(p2, "_pending_commit"), d2)
    val retry = Incremental.refresh(spark, events, p2)
    assert(retry.touched === 0 && retry.replayShedRows > 0)
    assert(!new java.io.File(s"$p2/_pending_commit").exists,
      "pure-replay retry stranded the stale pending-commit marker")
  }

  test("interrupted reconcile retries through its own torn overwrite") {
    // r15 ADVICE: reconcile holds the FULL log, so a pending-listed
    // partition emptied by the delete-then-rename tear is re-derived as
    // drifted — where refresh (delta-fed) must refuse, reconcile repairs
    val p = tmpDir("reconcile-torn")
    Incremental.refresh(spark, events, p)
    val days = new java.io.File(p).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).sorted
    BatchedState.writePointer(spark, new Path(p, "_pending_commit"),
      days.head)
    val victim = new java.io.File(s"$p/day=${days.head}")
    victim.listFiles.foreach(_.delete()) // the tear: delete landed,
    // rename lost — dir exists but is empty (worse for schema
    // inference than a missing dir; reconcile must survive both)
    intercept[IllegalStateException] {
      Incremental.refresh(spark, events, p) // refresh refuses (correct)
    }
    val repaired = Incremental.reconcile(spark, events, p)
    assert(repaired > 0, "reconcile did not rebuild the emptied partition")
    assert(!new java.io.File(s"$p/_pending_commit").exists)
    val fullP = tmpDir("reconcile-torn-full")
    Incremental.full(spark, events, fullP)
    def partialRows(path: String) = spark.read.parquet(path)
      .select("user_id", "day", "n_events", "value_cents", "n_purchases",
        "max_ts_us")
      .collect().map(_.toSeq).toSet
    assert(partialRows(p) === partialRows(fullP),
      "post-tear reconcile diverged from the full compute")
    val after = Incremental.refresh(spark, events, p)
    assert(after.touched === 0 && after.lateRows === 0L)
  }

  test("mart reconcile pins the bucket layout meta-first; data without meta refuses") {
    // r15 ADVICE (medium): reconcile as FIRST writer must pin
    // _mart_meta.json exactly as refresh does — and on a mart holding
    // data with no meta it must refuse, not fingerprint under a guessed
    // count and doom the real layout's buckets
    val li = Tables.lineitem(spark, sf).limit(2000)
    val mart = tmpDir("mart-bootstrap")
    assert(SupplyMart.reconcile(spark, li, mart, buckets = 8) > 0)
    val meta = new java.io.File(s"$mart/_mart_meta.json")
    assert(meta.exists, "bootstrap reconcile did not pin the layout meta")
    assert(scala.io.Source.fromFile(meta).mkString.contains("\"buckets\":8"))
    // a later refresh asking for a DIFFERENT count must ride the pinned 8
    SupplyMart.refresh(spark, li, mart, buckets = 64): Unit
    val bucketDirs = new java.io.File(mart).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs <= 8, s"layout split across counts: $bucketDirs dirs")

    val orphan = tmpDir("mart-orphan")
    SupplyMart.refresh(spark, li, orphan, buckets = 8): Unit
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$orphan/._mart_meta.json.crc"))
    assert(new java.io.File(s"$orphan/_mart_meta.json").delete())
    val e = intercept[IllegalStateException] {
      SupplyMart.reconcile(spark, li, orphan)
    }
    assert(e.getMessage.contains("_mart_meta.json"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      SupplyMart.refresh(spark, li, orphan)
    }
    assert(e2.getMessage.contains("_mart_meta.json"), e2.getMessage)
  }
}
