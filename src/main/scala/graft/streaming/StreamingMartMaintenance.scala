package graft.streaming

import graft.operators.SupplyMart
import graft.registry.IncrementalProtocol.RefreshResult
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the supply mart — closes the
  * IncrementalProtocol × Streaming loop the way
  * [[StreamingOnlineRefresh]] closed G33×G40 (reference main.py:141's
  * recompute-per-request is the anti-pattern both paths replace), and
  * it closes the high-water tier's ingestion-order caveat for real
  * rather than documenting it:
  *
  *  1. the stream pre-aggregates fact rows into DAY-WINDOW partials
  *     under an event-time watermark (`withWatermark` + tumbling
  *     `window`, append mode). Out-of-order rows WITHIN the lateness
  *     bound land in their correct day's state; a window emits exactly
  *     once, only after the watermark passes its end — so finalized
  *     partials reach the sink in window-end order no matter how
  *     disordered the input was;
  *  2. a foreachBatch sink folds each batch of finalized partials into
  *     the mart via [[SupplyMart.refreshFromPartials]] — the SAME
  *     layout, lock, meta pinning, and crash guards as the batch
  *     refresh, so batch- and stream-fed marts are interchangeable and
  *     the mart-fed q2/q9/q11/q16 variants read either.
  *
  * Exactly-once, stated not hidden (the repo's foreachBatch candor):
  * foreachBatch retries are at-least-once, but a replayed batch
  * re-emits the SAME finalized windows, whose max ship timestamps sit
  * at/below their bucket's committed max — the per-partition watermark
  * guard sheds them exactly (and surfaces the count as
  * `replayShedRows`). A crash between the mart commit and the
  * watermark swap retries through the same guard; the pure-replay path
  * re-advances the mark. Both are the guarantees already spec-pinned
  * on the batch path, inherited by construction.
  *
  * The residual boundary, measured not silent: a row arriving LATER
  * than the lateness bound is dropped by the STREAM's watermark before
  * it reaches the sink — Spark reports it per batch as
  * `numRowsDroppedByWatermark` in the stateful-operator progress, the
  * streaming twin of the batch path's `lateRows` audit. Size the bound
  * to the log's real disorder; the trade is state size vs. loss.
  * Unlike the batch path, the dropped ROWS themselves vanish inside
  * Spark's state operator (no shedSink hook exists there) — the
  * [[quarantineWriter]] tee closes that asymmetry for the
  * unreachable-by-commit class: raw rows whose event time falls in a
  * day the mart has already committed route to a quarantine sink
  * row-for-row (see [[quarantineBatch]] for why the DAY, not the bare
  * watermark, is the right boundary), where the batch repair verb
  * ([[foldBack]] — reconcile over log ∪ (quarantine − log), bag
  * semantics) folds them in. The tee's classification is deliberately
  * allowed to OVER-approximate: a tee lagging its fold (no production
  * ordering exists between the two queries) quarantines rows the
  * aggregation absorbed into since-committed days, and foldBack
  * subtracts exactly those before reconciling — capture errs toward
  * too much, the repair stays exact (ADVICE r16; spec-pinned with a
  * deliberately lagging tee). The sliver the tee cannot classify — a
  * beyond-bound row of a day whose window has NOT yet folded — stays
  * measurement-only (`numRowsDroppedByWatermark`): at arrival time
  * the tee cannot know the aggregation will drop it.
  *
  * Scale notes: state is keyed by (day, part, supplier) and bounded by
  * the watermark horizon (closed windows are evicted); the sink's
  * refresh reads back only the buckets the batch touches. The
  * finalized-partials stream is ~|active keys| per closed day, not
  * fact-sized.
  */
object StreamingMartMaintenance {

  /** Finalized day-grain partials for a lineitem-shaped stream —
    * append-mode watermarked aggregation; the measures are the ONE
    * shared spelling ([[SupplyMart.measureExprs]]). */
  def windowPartials(stream: DataFrame, lateness: String): DataFrame =
    stream
      .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
      .withWatermark("_ship_ts", lateness)
      .groupBy(window(col("_ship_ts"), "1 day"),
        col("l_partkey"), col("l_suppkey"))
      .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
      .drop("window", "_ship_ts")

  /** The per-batch body — public so batch code and tests share the
    * exact definition the stream runs (the G21/G33 convention). An
    * empty batch is a FULL no-op (no lock churn, no meta write). */
  def applyBatch(spark: SparkSession, batch: DataFrame, martPath: String,
      buckets: Int = 32): RefreshResult =
    if (batch.isEmpty) RefreshResult(0, 0L, 0L)
    else SupplyMart.refreshFromPartials(spark, batch, martPath, buckets)

  /** Wire a lineitem-shaped stream to the mart. Caller starts the
    * query and owns trigger/checkpoint like any writer; `lateness` is
    * the event-time disorder bound (e.g. "2 days"). */
  def writer(stream: DataFrame, martPath: String, checkpoint: String,
      buckets: Int = 32, lateness: String = "1 day"): DataStreamWriter[Row] =
    windowPartials(stream, lateness).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch.sparkSession, batch.toDF(), martPath,
          buckets): Unit
      }

  /** The per-batch quarantine body (public, the [[applyBatch]]
    * convention): raw rows of an ALREADY-COMMITTED mart day land in
    * `quarantinePath/batch=<id>`; returns how many. The boundary is
    * the committed watermark's DAY, not the bare mark: day windows
    * are indivisible (a window emits once, and a partial-fed refresh
    * refuses straddles), so once the mart holds a day, NO further row
    * of that day — even one timestamped past the stored max — can
    * ever be admitted by the stream path; rows of later days are
    * still pending and must not be quarantined. This is exactly the
    * class the audited batch `lateRows` counts and
    * [[SupplyMart.reconcile]] repairs — quarantined rows are raw
    * lineitem rows, so `reconcile(log ∪ quarantine)` folds them in.
    * Idempotent under foreachBatch's at-least-once retries: the
    * output is batch-id-keyed and overwritten whole, never appended. */
  def quarantineBatch(spark: SparkSession, batch: DataFrame,
      martPath: String, quarantinePath: String, batchId: Long): Long = {
    val wm = graft.registry.Incremental.watermark(spark, martPath)
    if (wm == Long.MinValue) return 0L // nothing committed yet
    val doomed = batch.filter(
      SupplyMart.dayFloorUs(SupplyMart.shipUs) <=
        lit(SupplyMart.dayFloorUs(wm)))
    val n = doomed.count()
    if (n > 0)
      doomed.write.mode("overwrite")
        .parquet(s"$quarantinePath/batch=$batchId")
    n
  }

  /** The quarantine TEE — a second query on the SAME source as
    * [[writer]] (one sink per streaming query, so the tee cannot live
    * inside the aggregation query). Start both against one log and the
    * G45 loop is closed on the row axis too: admitted rows fold into
    * the mart, unreachable rows land in quarantine, and only the
    * cannot-classify sliver (see the class doc) remains
    * measurement-only. Reads the committed watermark per batch — a row
    * racing its own day's fold lands in neither place this batch and
    * is classified on a later delivery or by the batch audit.
    *
    * The OTHER race direction (ADVICE r16): nothing in production
    * enforces tee-before-fold ordering, and a tee that LAGS the fold
    * classifies rows against a mart watermark that has already
    * advanced — a row the aggregation ABSORBED into a since-committed
    * day gets quarantined too (over-capture). Over-capture is safe for
    * the mart (the tee only observes) but poisons a BLIND
    * `reconcile(log ∪ quarantine)` with double-counted SUM partials —
    * which is why the fold-back verb is [[foldBack]]: it drops each
    * quarantined row the absorbed log already carries before unioning,
    * so capture may over-approximate and the repair stays exact. */
  def quarantineWriter(stream: DataFrame, martPath: String,
      quarantinePath: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        quarantineBatch(batch.sparkSession, batch.toDF(), martPath,
          quarantinePath, id): Unit
      }

  /** Quarantined raw rows across all batches — lineitem-shaped, ready
    * for [[foldBack]]. Empty frame when nothing was ever quarantined. */
  def quarantined(spark: SparkSession, quarantinePath: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(quarantinePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) graft.operators.BatchedState.emptyDf(spark, schema)
    else spark.read.parquet(quarantinePath)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** THE fold-back verb — repair the mart from the absorbed log plus
    * the quarantine, safe against over-capture (ADVICE r16). A tee
    * that lagged its fold can quarantine rows the aggregation actually
    * absorbed (they are in `log` AND in quarantine), and a blind
    * `reconcile(log ∪ quarantine)` double-counts their SUM partials
    * silently. This verb subtracts the log from the quarantine with
    * BAG semantics first (`exceptAll` — one quarantined copy removed
    * per log copy, so legitimate duplicate rows survive in their true
    * multiplicity), then reconciles: absorbed-and-over-quarantined
    * rows count once, genuinely dropped rows count once.
    *
    * Residual of the BAG form, stated: two BYTE-IDENTICAL rows of
    * which one was absorbed and one dropped are indistinguishable to
    * bag subtraction — the dropped copy is removed with the absorbed
    * one and the repair under-counts it. Real fact logs carry a
    * unique row key (lineitem's (l_orderkey, l_linenumber)), and
    * passing it as `keyCols` switches the subtraction to KEY
    * identity (r18 directive 3), which closes the residual: a
    * quarantined row is dropped exactly when its key is absent from
    * the same-day log, so identical measure payloads under distinct
    * keys can never shadow each other. The keyed form is also
    * defensive about its own contract — it refuses loudly when the
    * "unique" key repeats within the quarantine or the same-day log
    * (a duplicate key would silently duplicate or mis-drop rows
    * through the join), when any key column is NULL on either side
    * (an equi-join never matches null keys — a null-keyed absorbed
    * row would silently survive the subtraction and double-count),
    * and when a shared key carries DIFFERENT
    * non-key bytes on the two sides (the key does not determine the
    * row — upstream corruption a silent anti-join would absorb).
    * Keep the bag form for genuinely keyless inputs, with its
    * residual as documented.
    *
    * Cost shape: the subtraction's log side is PRE-RESTRICTED to the
    * quarantined DAYS (an over-captured copy is byte-identical to its
    * log twin, so it shares the twin's day by construction — rows of
    * other days cannot match and need not ride the wide exceptAll
    * shuffle). The distinct quarantined-day frame is tiny and
    * broadcast, so the exceptAll shuffles O(late-day volume), not
    * O(log): at 50× the unrestricted form cost 37.6 s against 25M log
    * rows where the restricted one pays only the ~5M same-day rows.
    *
    * Returns the reconcile's rewritten-bucket count. `log` must be
    * the absorbed raw rows in the quarantine's column shape. */
  def foldBack(spark: SparkSession, log: DataFrame, quarantinePath: String,
      martPath: String, buckets: Int = 32,
      keyCols: Seq[String] = Nil): Int = {
    // quarantined() projects the quarantine to log's columns in log's
    // order, so the bag subtraction lines up positionally
    val q = quarantined(spark, quarantinePath, log.schema)
    val dayFloor = SupplyMart.dayFloorUs(SupplyMart.shipUs)
    val qDays = q.select(dayFloor.as("_qday")).distinct()
    val logSameDays = log.join(
      org.apache.spark.sql.functions.broadcast(qDays),
      dayFloor === col("_qday"), "left_semi")
    // persist the subtraction (late-volume-sized): reconcile scans its
    // input several times (partials, fingerprint diff, rewrites) and
    // would re-execute the exceptAll subtree per scan. persist, NOT
    // localCheckpoint (review wave 3): truncated lineage cannot
    // recompute a lost executor's blocks, and a library verb must stay
    // recoverable; unpersisted after the repair so repeated repair
    // cycles don't pin storage
    // exactly ONE late-volume frame — the survivors — stays pinned
    // through reconcile (review waves 2+3, r18): bag form persists
    // the exceptAll result; keyed form materializes its probes off a
    // transiently-cached join, pins only the extracted extra frame,
    // and has released everything else before reconcile starts
    val (extra, cached) =
      if (keyCols.isEmpty) {
        val e = q.exceptAll(logSameDays)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (e, e)
      } else keyedSubtract(q, logSameDays, log.columns.toSeq, keyCols)
    try SupplyMart.reconcile(spark, log.unionByName(extra), martPath, buckets)
    finally cached.unpersist(): Unit
  }

  /** The KEY-exact subtraction behind `foldBack(keyCols = …)`: a
    * quarantined row survives iff its key is absent from the same-day
    * log. Every check and the subtraction itself ride frames already
    * restricted to the quarantined DAYS, so the whole verb stays
    * O(late-day volume) like the bag form — the probes below are
    * full passes over those restricted frames (not limit-1 bailouts:
    * the healthy path must prove the ABSENCE of a violation), which
    * is the stated price of the refuse-loudly contract. The join
    * itself executes once (cached transiently; only the PERSISTED
    * survivor frame — returned as both elements of the pair, the
    * second being the caller's unpersist handle — outlives this
    * call). Refusals: a
    * key column the frames lack; a NULL key on either side (an
    * equi-join never matches null keys, so a null-keyed absorbed row
    * would silently survive the subtraction and double-count —
    * review wave r18); a repeated key on either side (the join's
    * semantics need uniqueness — a duplicated "unique" key would
    * silently duplicate or mis-drop rows); a key present on both
    * sides with different non-key bytes (the key does not determine
    * the row: the feed is corrupt, and absorbing the quarantined
    * copy silently would bury it). */
  private def keyedSubtract(q: DataFrame, logSameDays: DataFrame,
      columns: Seq[String], keyCols: Seq[String])
      : (DataFrame, DataFrame) = {
    val missing = keyCols.filterNot(columns.contains)
    require(missing.isEmpty,
      s"foldBack keyCols ${missing.mkString(", ")} not in the log/quarantine " +
        s"columns (${columns.mkString(", ")})")
    val nonKey = columns.filterNot(keyCols.contains)
    require(nonKey.nonEmpty, "foldBack keyCols must not cover every column " +
      "— an all-column key is the bag form; omit keyCols instead")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the two day-restricted inputs each feed a probe AND the join —
    // persist for the probe window so the quarantine scan and the
    // log semi-join execute once, not three times (review wave 2,
    // r18); released below once the join itself is fully cached
    val qP = q.persist(lvl)
    val lP = logSameDays.persist(lvl)
    var joinedOpt: Option[DataFrame] = None
    var extraOpt: Option[DataFrame] = None
    try {
      // ONE aggregation per side carries BOTH key-contract probes:
      // null keys group together (the grouped row's key IS NULL) and
      // repeated keys surface as count > 1
      val anyNullKey = keyCols.map(col(_).isNull).reduce(_ || _)
      def refuseBadKeys(df: DataFrame, what: String): Unit =
        df.groupBy(keyCols.map(col): _*).count()
          .filter(col("count") > 1L || anyNullKey).limit(1).collect()
          .headOption.foreach { r =>
            if (keyCols.indices.exists(r.isNullAt))
              throw new IllegalStateException(
                s"foldBack keyCols (${keyCols.mkString(", ")}) contain " +
                  s"NULLs in the $what — an equi-join never matches null " +
                  "keys, so a null-keyed absorbed row would silently " +
                  "survive the subtraction and double-count; repair the " +
                  "feed or fall back to the bag form (omit keyCols)")
            else throw new IllegalStateException(
              s"foldBack keyCols (${keyCols.mkString(", ")}) repeat " +
                s"within the $what — the key is not unique there, and a " +
                "keyed subtraction over a repeated key silently corrupts " +
                "the repair; fix the feed or fall back to the bag form " +
                "(omit keyCols) with its documented duplicate residual")
          }
      refuseBadKeys(qP, "quarantine")
      refuseBadKeys(lP, "same-day log")
      val qk = qP.select(keyCols.map(col) ++
        nonKey.map(c => col(c).as(s"_q_$c")): _*)
      val lk = lP.select(keyCols.map(col) ++
        nonKey.map(c => col(c).as(s"_l_$c")) :+ lit(true).as("_l_present"): _*)
      val joined = lk.join(qk, keyCols.toSeq, "right").persist(lvl)
      joinedOpt = Some(joined)
      val payloadDiffers = nonKey
        .map(c => !(col(s"_q_$c") <=> col(s"_l_$c")))
        .reduce(_ || _)
      // count(), not a limit-1 probe, ON PURPOSE: the healthy path must
      // scan everything to prove no mismatch anyway, and a full count
      // materializes the ENTIRE join into the cache — so the parent
      // frames can be released here and the extra projection below
      // materializes from the cache, never re-executing the
      // scan+join lineage
      val mismatches = joined
        .filter(col("_l_present") && payloadDiffers).count()
      if (mismatches > 0)
        throw new IllegalStateException(
          s"foldBack keyCols (${keyCols.mkString(", ")}) matched " +
            s"$mismatches log row(s) whose non-key columns DIFFER from " +
            "the quarantined copy — the key does not determine the row, " +
            "so the subtraction cannot decide which bytes are " +
            "authoritative; repair the feed first")
      // pin only the SURVIVORS through reconcile (review wave 3, r18:
      // the full join — matched majority included, double-width —
      // stayed cached through the heaviest phase, and every reconcile
      // scan re-filtered it). One cheap pass over the cached join
      // materializes the small extra frame, then the join releases.
      val extra = joined.filter(col("_l_present").isNull)
        .select(keyCols.map(col) ++
          nonKey.map(c => col(s"_q_$c").as(c)): _*)
        .select(columns.map(col): _*)
        .persist(lvl)
      extraOpt = Some(extra)
      extra.count(): Unit // materialize BEFORE the join's cache drops
      joined.unpersist(): Unit
      (extra, extra)
    } catch {
      // any failure — the deliberate refusals or a transient job error
      // — must not leak a cache entry into a long-lived driver
      // (review wave 2, r18)
      case t: Throwable =>
        joinedOpt.foreach(_.unpersist(): Unit)
        extraOpt.foreach(_.unpersist(): Unit)
        throw t
    } finally {
      qP.unpersist(): Unit
      lP.unpersist(): Unit
    }
  }
}
