package graft.registry

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE high-water merge protocol — one copy of the repo's most
  * crash-sensitive sequence, shared by [[Incremental]] (day-partitioned
  * event partials) and [[graft.operators.SupplyMart]] (bucket-
  * partitioned supply partials). The r14 review found the two
  * hand-maintained copies had already drifted and shared a latent
  * crash seam; this object is the single implementation of both the
  * sequence and the fix.
  *
  * Sequence per refresh: filter raw rows past the watermark → keyed
  * mergeable partials (lineage cut) → read back ONLY the touched
  * snapshot partitions → combine → dynamic-partition-overwrite the
  * touched partitions → advance the watermark atomically.
  *
  * CRASH-RETRY IDEMPOTENCE (the r14 finding): the snapshot commit and
  * the watermark advance are two separate FS operations. A crash
  * between them leaves committed partitions beside a stale global
  * watermark, and a naive retry re-merges the same delta — MIN/MAX
  * partials absorb the replay, but SUM partials double-count, silently
  * and permanently. The guard is a PER-PARTITION effective watermark:
  * each raw row filters against
  * `greatest(global_wm, its target partition's stored max(tsField))`.
  * A partition that already incorporated the delta stores
  * max(tsField) = that delta's partition max, so the replayed rows
  * drop out of the retry; a partition whose commit didn't land
  * re-derives exactly. In the no-crash steady state the global
  * watermark ≥ every partition max, so the filter reduces to the plain
  * `ts > wm` and results are unchanged (spec-pinned in both callers).
  * Cost: one narrow (partCol, tsField) aggregation over the snapshot
  * per refresh — partition-grain state, never fact-scale.
  *
  * THE LATE-ARRIVAL AUDIT (r15): the high-water ingestion-order caveat
  * is unchanged — a row arriving with a timestamp at or below the
  * committed mark is skipped by design; use a streaming watermarked
  * path for non-ingestion-ordered logs — but the skip is no longer
  * silent. The watermark file carries a running tally of INCORPORATED
  * rows (same file, so mark and tally advance in one atomic swap), and
  * each refresh counts the log: `lateRows = rows at/below the mark −
  * tally` is the EXACT number of rows that appeared below the
  * watermark after it advanced, i.e. the rows this design sheds.
  * Surfaced on [[RefreshResult]] every refresh; callers alert on it or
  * route the log to the streaming path. Replays absorbed by the
  * per-partition guard are credited to the tally when first counted
  * past the mark, so crash retries do not read as loss. Cost: one
  * footer-metadata count of the log (empty ReadSchema, no data pages)
  * plus one past-mark count riding the same pushed filter as the
  * delta scan (partition pruning on a date-partitioned log) — never a
  * column scan of the below-mark history (pass `audit = false` to
  * skip even that on hot paths — doing so drops the stored tally, and
  * the next audited refresh re-baselines, honestly: arrivals during
  * the unaudited window are not attributed). A legacy
  * bare-long watermark (pre-tally) baselines on first audited read:
  * rows already below the mark at upgrade are presumed incorporated
  * (the baselining refresh must see the full log, like any exact
  * reading — a chunk-fed baseline would over-report late rows once a
  * full log is passed).
  *
  * One post-crash wrinkle, stated: a retry whose delta is FULLY shed
  * by the per-partition guard returns 0 touched partitions without
  * advancing the global watermark (there is no delta to derive a safe
  * value from), so the stale global mark persists until genuinely new
  * data lands. That costs re-filtering work on subsequent refreshes,
  * never correctness (the audited form still credits the replays to
  * the tally, so they never read as late loss).
  *
  * What the guard assumes, and what the commit protocol now DETECTS:
  * the guard distinguishes committed partitions from uncommitted ones
  * by their stored max(ts), so it needs each partition's commit to be
  * all-or-nothing. Both callers write ONE file per partition
  * (repartition-by-partition before partitionBy), which closes the
  * multi-file tear (a max-ts-bearing file landing while a sibling is
  * lost). It does NOT close the window inside Spark's dynamic
  * partition overwrite itself: the committer replaces each partition
  * as delete(final) THEN rename(staging), and a crash between the two
  * leaves a previously-committed partition EMPTY — its pmax reads as
  * null and a naive retry would silently re-derive only past-watermark
  * rows, losing the partition's pre-watermark history. That tear is
  * now detected, not assumed away: before overwriting, the refresh
  * records the touched partitions that already hold data in a
  * checksummed `_pending_commit` marker; every refresh first verifies
  * that each recorded partition still holds files and REFUSES loudly
  * when one was emptied (recovery: rebuild from the full log or
  * restore the partition — the lost rows are below the watermark and
  * cannot be re-derived from a delta). On object stores, where rename
  * is copy+delete, even these file moves can tear mid-file; there,
  * snapshot state belongs in a transactional table format (the
  * ValueStoreFormat seam's standing adjudication).
  */
object IncrementalProtocol {

  /** What a refresh did and what it shed.
    *
    *  - `touched`: snapshot partitions rewritten (0 = no new data);
    *  - `replayShedRows`: input rows past the global watermark but
    *    at/below their target partition's committed max — the
    *    per-partition guard's shed set. Zero in the no-crash steady
    *    state; equals the replay size on a crash retry;
    *  - `lateRows`: cumulative count of log rows at/below the
    *    watermark that were never incorporated — the high-water
    *    design's silent-loss boundary, measured. EXACT when `raw` is
    *    the full log (the callers' documented contract); a chunk-fed
    *    refresh under-reports (clamped at 0) and the next full-log
    *    refresh reads exactly again. −1 when `audit = false`. */
  final case class RefreshResult(touched: Int, replayShedRows: Long,
      lateRows: Long)

  /** Fold `raw` rows past the (per-partition effective) watermark into
    * the snapshot at `snapshotPath`. Returns touched partitions
    * (0 = no new data).
    *
    *  - `partExpr`: the target partition of a RAW row (must agree with
    *    the partition value `partials` assigns to that row's key);
    *  - `tsExpr`: the watermark column of a raw row, epoch micros;
    *  - `partials`: filtered raw rows → keyed mergeable partials
    *    CARRYING `partCol` and `tsField` (= max ts per key);
    *  - `combine`: (existing partials, delta partials) → merged
    *    partials, same shape — must be associative+commutative per key;
    *  - `write`: layout-owning writer (repartition/sort discipline is
    *    the caller's); invoked under dynamic partition-overwrite so
    *    only the partitions present in the frame are replaced. */
  /** The replay-shed input frame — package-private so the spec can pin
    * its PLAN: the global-watermark conjunct must arrive here already
    * applied to `pastWm` (a standalone filter on the raw frame —
    * `ts > greatest(wm, pmax)` ⟺ `ts > wm ∧ ts > pmax`, and only the
    * standalone form sinks below the pmax join into the raw scan; on a
    * date-partitioned 100 TB log that is partition pruning). Folding
    * it into greatest() behind the join re-scanned the whole fact
    * table every refresh — a regression that happened once (r14
    * protocol refactor) and is now plan-spec-pinned, not just
    * commented. */
  /** ONE spelling of the partition-grain max(tsField) frame — shared
    * by the fresh and shed sides so the guard and its complement can
    * never key on different state. */
  private def pmaxFrame(spark: SparkSession, snapshotPath: String,
      partCol: String, tsField: String): DataFrame =
    spark.read.parquet(snapshotPath)
      .groupBy(col(partCol).as("_ip_part"))
      .agg(max(col(tsField)).as("_ip_pmax"))

  private def pmaxJoin(pastWm: DataFrame, pmax: DataFrame,
      partExpr: Column): DataFrame =
    pastWm.withColumn("_ip_part", partExpr)
      .join(broadcast(pmax), Seq("_ip_part"), "left")

  private[registry] def freshFrame(spark: SparkSession, pastWm: DataFrame,
      snapshotPath: String, partCol: String, partExpr: Column,
      tsExpr: Column, tsField: String, snapExists: Boolean): DataFrame =
    if (!snapExists) pastWm
    else
      // per-partition effective watermark (see class doc): broadcast
      // the partition-grain max(tsField) frame onto the fresh rows
      pmaxJoin(pastWm, pmaxFrame(spark, snapshotPath, partCol, tsField),
        partExpr)
        .filter(tsExpr > coalesce(col("_ip_pmax"), lit(Long.MinValue)))
        .drop("_ip_part", "_ip_pmax")

  /** The per-partition-guard shed set — the complement of
    * [[freshFrame]] over the same pmax join: input rows past the
    * global mark whose target partition already incorporated them
    * (replays). Delta-sized (its input is already wm-filtered). */
  private def shedFrame(spark: SparkSession, pastWm: DataFrame,
      snapshotPath: String, partCol: String, partExpr: Column,
      tsExpr: Column, tsField: String): DataFrame =
    pmaxJoin(pastWm, pmaxFrame(spark, snapshotPath, partCol, tsField),
      partExpr)
      .filter(tsExpr <= coalesce(col("_ip_pmax"), lit(Long.MinValue)))
      .drop("_ip_part", "_ip_pmax")

  private def pendingPath(snapshotPath: String) =
    new Path(snapshotPath, "_pending_commit")

  /** Refuse loudly when a partition recorded as data-bearing by an
    * interrupted overwrite is now empty — the delete-then-rename tear
    * inside Spark's dynamic partition overwrite (see class doc). The
    * recorded values are path-literal (day strings, bucket longs — the
    * contract both callers meet), so the directory name is the value. */
  private def verifyPendingCommit(spark: SparkSession, hfs: FileSystem,
      snapshotPath: String, partCol: String): Unit =
    graft.operators.BatchedState
      .readPointer(spark, pendingPath(snapshotPath))
      .foreach { payload =>
        payload.split("\n").filter(_.nonEmpty).foreach { v =>
          val dir = new Path(snapshotPath, s"$partCol=$v")
          val gone = !hfs.exists(dir) || hfs.listStatus(dir).isEmpty
          if (gone) throw new IllegalStateException(
            s"torn dynamic-overwrite commit at $snapshotPath: partition " +
              s"$partCol=$v held data when the interrupted refresh began " +
              "and is now empty (the committer's delete landed, its " +
              "rename did not). Its pre-watermark history cannot be " +
              "re-derived from a delta — rebuild the snapshot from the " +
              "full log (delete the snapshot dir and refresh) or restore " +
              s"the partition, then remove ${pendingPath(snapshotPath)}")
        }
      }

  /** The REPAIR verb for the audited loss — `refresh` measures the
    * rows the high-water design sheds (`lateRows`); `reconcile` folds
    * them in. It recomputes the partials from the FULL log and
    * overwrites exactly the partitions whose stored content differs
    * (order-independent per-partition fingerprint: COUNT + SUM of
    * xxhash64 over the full row struct — commutative, so layout and
    * shuffle order cannot fake a diff), at full-compute cost but
    * touching only the drifted partitions on disk — serving stays
    * continuous on the untouched ones, and a snapshot with no late
    * data rewrites NOTHING (spec-pinned). Stored partitions absent
    * from the log's derivation (a shrunk log) are deleted. Afterwards
    * the mark sits at the log's max and the tally equals the log's
    * row count, so the next audited refresh reads `lateRows = 0`.
    * Crash-safe via the same `_pending_commit` + atomic watermark
    * protocol as refresh, and — unlike refresh — RETRYABLE through the
    * delete-then-rename tear itself: a partition the interrupted
    * overwrite emptied reads as absent from the stored side, so the
    * fingerprint diff re-derives it from the full log as drifted
    * (refresh must REFUSE there, because a delta cannot re-derive
    * pre-watermark history; reconcile holds the full log and can).
    * Empty partition directories (the tear's artifact) and any stale
    * `_pending_commit` from an interrupted writer are cleared up
    * front — everything they protect is about to be re-derived.
    * Returns partitions rewritten or deleted. */
  def reconcile(spark: SparkSession, raw: DataFrame, snapshotPath: String,
      partCol: String, partials: DataFrame => DataFrame,
      tsField: String,
      write: (DataFrame, String) => Unit): Int = {
    val hfs = new Path(snapshotPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // same early commit-mode probe as refresh (the full-compute below
    // is the heaviest work in the tier)
    graft.operators.BatchedState.assertPointerWritable(spark,
      new Path(snapshotPath, "_watermark"))
    // tear recovery, not tear refusal (the r15 ADVICE finding): a
    // partition an interrupted overwrite emptied is rebuilt from the
    // full log below — drop the empty dir (it would break parquet
    // schema inference and carries no data) and the stale marker (its
    // every listed partition is re-derived this call). Refresh cannot
    // do this: its delta lacks the emptied partition's pre-watermark
    // history, so there the same state refuses loudly instead.
    Option(hfs.globStatus(new Path(s"$snapshotPath/$partCol=*")))
      .getOrElse(Array.empty).foreach { st =>
        if (st.isDirectory && hfs.listStatus(st.getPath).isEmpty)
          hfs.delete(st.getPath, true): Unit
      }
    hfs.delete(pendingPath(snapshotPath), true): Unit
    val full = partials(raw).localCheckpoint(true)
    val cols = full.columns.sorted.toSeq
    def fingerprint(df: DataFrame): DataFrame =
      df.groupBy(col(partCol).cast("string").as("_rc_part"))
        // decimal(38,0) sum: order-independent AND overflow-proof
        // (ANSI mode turns a long-sum wraparound into a hard error)
        .agg(count(lit(1)).as("_rc_n"),
          sum(xxhash64(struct(cols.map(col): _*)).cast("decimal(38,0)"))
            .as("_rc_h"))
    val snapExists = hfs.globStatus(new Path(s"$snapshotPath/$partCol=*")) match {
      case null => false
      case gs   => gs.nonEmpty
    }
    val (touched, doomed) =
      if (!snapExists) (full.select(col(partCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq, Seq.empty[String])
      else {
        // normalize to the computed side's schema: Spark TYPE-INFERS
        // partition columns from directory names (day=2024-01-05 reads
        // back as DATE, bucket=5 as INT) and a hash over a differently
        // typed struct would mark every partition drifted
        val stored0 = spark.read.parquet(snapshotPath)
        val stored = stored0.select(full.schema.fields.map(f =>
          stored0.col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
        val diff = fingerprint(full).as("f")
          .join(fingerprint(stored).as("s"), Seq("_rc_part"), "full")
          .filter(not(col("f._rc_n") <=> col("s._rc_n")) ||
            not(col("f._rc_h") <=> col("s._rc_h")))
          .select(col("_rc_part"),
            col("f._rc_n").isNotNull.as("_rc_in_log"))
          .collect() // bounded: partitions, not rows
        (diff.filter(_.getBoolean(1)).map(_.getString(0)).toSeq,
          diff.filterNot(_.getBoolean(1)).map(_.getString(0)).toSeq)
      }
    if (touched.isEmpty && doomed.isEmpty) return 0
    val preExisting = touched.filter { v =>
      val dir = new Path(snapshotPath, s"$partCol=$v")
      hfs.exists(dir) && hfs.listStatus(dir).nonEmpty
    }
    if (preExisting.nonEmpty)
      graft.operators.BatchedState.writePointer(spark,
        pendingPath(snapshotPath), preExisting.mkString("\n"))
    if (touched.nonEmpty) {
      val rows = full.filter(col(partCol).cast("string").isin(touched: _*))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try write(rows, snapshotPath)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    doomed.foreach(v =>
      hfs.delete(new Path(snapshotPath, s"$partCol=$v"), true): Unit)
    val stats = raw.count() // footer-metadata (see the audit note)
    val wmRow = full.agg(max(col(tsField))).head()
    val newWm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
    Incremental.writeWatermark(spark, snapshotPath,
      newWm, Some(stats))
    hfs.delete(pendingPath(snapshotPath), true): Unit
    touched.length + doomed.length
  }

  def refresh(spark: SparkSession, raw: DataFrame, snapshotPath: String,
      partCol: String, partExpr: Column, tsExpr: Column,
      partials: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame,
      tsField: String,
      write: (DataFrame, String) => Unit,
      audit: Boolean = true,
      shedSink: Option[DataFrame => Unit] = None): RefreshResult = {
    val (wm, incStored) = Incremental.watermarkState(spark, snapshotPath)
    val hfs = new Path(snapshotPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // commit-mode probe BEFORE any heavy work (review wave 2, r16):
    // the watermark write happens LAST, after the partition overwrite
    // — a session-knob mismatch must refuse here, not after the
    // overwrite already ran (retryable, but every retry re-paid it)
    graft.operators.BatchedState.assertPointerWritable(spark,
      new Path(snapshotPath, "_watermark"))
    val snapExists = hfs.globStatus(new Path(s"$snapshotPath/$partCol=*")) match {
      case null => false
      case gs   => gs.nonEmpty
    }
    // unconditional: a tear that emptied the snapshot's ONLY partition
    // makes the dir look never-written (snapExists false) while the
    // stale watermark would silently drop all pre-mark history
    verifyPendingCommit(spark, hfs, snapshotPath, partCol)
    // a marker that VERIFIED is stale by definition (every listed
    // partition still holds data, so the interrupted overwrite either
    // completed or destroyed nothing) — drop it here, ONCE, so the
    // early-out and pure-replay returns below cannot strand it (the
    // r15 ADVICE finding: a stranded marker was re-verified forever,
    // and turned spurious if a listed partition was later legitimately
    // removed). The full-write path re-creates its own marker before
    // its overwrite.
    hfs.delete(pendingPath(snapshotPath), true): Unit
    // ---- late-arrival audit (see class doc): split the log's row
    // count at the mark. Deliberately TWO jobs, not one conditional
    // agg: a bare count() over a parquet scan reads footers/row-group
    // counts only (empty ReadSchema — the publishOnlineView precedent),
    // and the past-mark count rides the SAME pushed `ts > wm` filter
    // the delta scan uses — on a date-partitioned log that is
    // partition pruning, so the audit never column-scans the
    // below-mark history. A conditional-count agg would force a full
    // ts scan by construction. Measured (50× Stress audit_cost, warm):
    // ~1.5-2 s extra on a 30M-row UNPARTITIONED local log — the
    // worst case, where the past-count cannot prune. Contract: tsExpr
    // is non-null (both callers derive it from required columns); a
    // null ts would count as below-mark here while the wm filter
    // drops it.
    val (belowCount, pastCount) =
      if (!audit) (-1L, -1L)
      else {
        val total = raw.count()
        val past = raw.filter(tsExpr > wm).count()
        (total - past, past)
      }
    val inc0 = if (!audit) -1L else incStored.getOrElse(belowCount)
    // exact when `raw` is the full log (both callers' documented
    // contract); a caller feeding pre-chunked deltas under-reports
    // (later chunks hold none of the already-incorporated rows), so
    // clamp at 0 — the tally still counts every incorporated row, and
    // the very next full-log refresh reads exactly again
    val late = if (audit) math.max(0L, belowCount - inc0) else -1L
    val pastWm = raw.filter(tsExpr > wm)
    val noFresh = if (audit) pastCount == 0L else snapExists && pastWm.isEmpty
    if (snapExists && noFresh) {
      // no-op refresh early-out: nothing survives the global mark, so
      // nothing can survive the per-partition one — skip the snapshot
      // pmax scan entirely. Cost without audit: one take(1) probe of
      // the wm-filtered raw frame — near-free on the date-partitioned
      // logs this protocol targets (the probe prunes like the delta
      // scan); on an UNPARTITIONED late-ordered log it can approach a
      // raw scan, bounded by the scan the delta pays anyway. With
      // audit the counting pass already answered it.
      if (audit && incStored.isEmpty)
        // pin the upgrade baseline so later audits attribute arrivals
        Incremental.writeWatermark(spark, snapshotPath, wm, Some(inc0))
      return RefreshResult(0, 0L, late)
    }
    val fresh = freshFrame(spark, pastWm, snapshotPath, partCol, partExpr,
      tsExpr, tsField, snapExists)
    // replay-shed accounting + optional quarantine (Expectations-style
    // sink): the pmax guard's complement, delta-sized — computed in
    // ANY mode once the snapshot exists (it is delta-scale, unlike the
    // audit's log-counting pass). The shed max timestamp matters to
    // the mark: shed rows were COMMITTED by the interrupted attempt,
    // so the mark may advance over them — exactly the value that
    // attempt would have written — keeping the audited tally invariant
    // (incorporated rows all sit at/below the mark) and closing the
    // stale-mark wrinkle in the unaudited mode too.
    val (shed, shedMaxTs) =
      if (!snapExists) (0L, Long.MinValue)
      else {
        val sf = shedFrame(spark, pastWm, snapshotPath, partCol, partExpr,
          tsExpr, tsField)
        shedSink.foreach(_(sf))
        val r = sf.agg(count(lit(1)).as("n"), max(tsExpr).as("m")).head()
        (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1))
      }
    // sever lineage: the merge below must not rescan the raw log
    val delta = partials(fresh).localCheckpoint(true)
    if (delta.isEmpty) {
      // pure-replay retry: every past-mark row was already absorbed by
      // a landed commit. Advance the mark over them — the same value
      // the crashed attempt was about to write — and (audited) credit
      // the replays to the tally NOW, or they would read as late loss
      // on every subsequent audit.
      if (shedMaxTs > wm || audit)
        Incremental.writeWatermark(spark, snapshotPath,
          math.max(wm, shedMaxTs),
          if (audit) Some(inc0 + pastCount) else None)
      return RefreshResult(0, shed, late)
    }
    val touched = delta.select(partCol).distinct()
      .collect().map(_.get(0)).toSeq // bounded: partitions, not rows
    val merged =
      if (!snapExists) delta
      else {
        // partition pruning on the snapshot layout: only touched
        // partitions are read back and rewritten
        val existing = spark.read.parquet(snapshotPath)
          .filter(col(partCol).isin(touched: _*))
          .select(delta.columns.map(col).toSeq: _*)
        // eager: the overwrite below targets the very path this plan
        // reads, which Spark (rightly) refuses on a live plan
        combine(existing, delta).localCheckpoint(true)
      }
    // record the touched partitions that ALREADY hold data before the
    // overwrite replaces them — the tear-detection contract the next
    // refresh verifies (see class doc; checksummed pointer format)
    val preExisting = touched.map(_.toString).filter { v =>
      val dir = new Path(snapshotPath, s"$partCol=$v")
      hfs.exists(dir) && hfs.listStatus(dir).nonEmpty
    }
    if (preExisting.nonEmpty)
      graft.operators.BatchedState.writePointer(spark,
        pendingPath(snapshotPath), preExisting.mkString("\n"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try write(merged, snapshotPath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val newWm = delta.agg(max(col(tsField))).head().getLong(0)
    Incremental.writeWatermark(spark, snapshotPath,
      math.max(math.max(wm, newWm), shedMaxTs),
      if (audit) Some(inc0 + pastCount) else None)
    hfs.delete(pendingPath(snapshotPath), true): Unit
    RefreshResult(touched.length, shed, late)
  }
}
