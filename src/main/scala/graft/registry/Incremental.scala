package graft.registry

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** G14: high-water-mark incremental materialization.
  *
  * The reference recomputes a feature version by re-reading the whole raw
  * table on every POST /features/{name}/compute (reference main.py:195 ->
  * compute.py:24). At 100 TB a full-history rescan per refresh is the
  * single biggest cost in the store, and the fix is the standard
  * warehouse pattern this object implements:
  *
  *   - the snapshot holds MERGEABLE per-(entity, day) partials (counts
  *     and integer-cent sums — never averages), parquet-partitioned by
  *     day;
  *   - a refresh scans only events with `ts` past the stored watermark
  *     (at scale: partition pruning on a date-partitioned log makes this
  *     a metadata operation, not a filter over 100 TB);
  *   - the delta is combined with the snapshot FOR THE TOUCHED DAYS ONLY
  *     and written back via dynamic partition overwrite — untouched day
  *     partitions are neither read nor rewritten;
  *   - the watermark advances via the same atomic temp+rename protocol
  *     as the FeatureStore `_versions` manifest.
  *
  * Finalization (rates, averages) happens at read time from the partials,
  * so refreshes stay associative: N incremental refreshes over any split
  * of the log produce byte-identical snapshots to one full compute
  * (IncrementalSpec proves this on a 3-way split).
  *
  * Caveat (inherent to high-water-mark designs): an event arriving LATER
  * than a higher-ts event that already advanced the watermark is skipped.
  * Use the event-time-watermarked streaming path (StreamingMaterializer)
  * when the log is not ingestion-ordered.
  */
object Incremental {
  import graft.functions.Exact

  /** ONE day-routing expression (the SupplyMart bucketExpr discipline):
    * the protocol's contract requires the per-row partition (partExpr)
    * and the partition `partials` assigns to agree EXACTLY — two
    * spellings would let a future edit desynchronize them and key the
    * pmax shed on the wrong partition. */
  private def dayExpr: org.apache.spark.sql.Column =
    date_format(col("ts"), "yyyy-MM-dd")

  /** Day-grain mergeable partials for an events chunk. */
  private def partials(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        dayExpr.as("day"),
        col("ts"), col("value"), col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Exact.cents(col("value"))).as("value_cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        max(unix_micros(col("ts"))).as("max_ts_us"))

  private def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("user_id"), col("day"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("value_cents")).as("value_cents"),
        sum(col("n_purchases")).as("n_purchases"),
        max(col("max_ts_us")).as("max_ts_us"))

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def watermarkPath(snapshotPath: String) =
    new Path(s"$snapshotPath/_watermark")

  /** Stored high-water mark (epoch micros); Long.MinValue when absent. */
  def watermark(spark: SparkSession, snapshotPath: String): Long =
    watermarkState(spark, snapshotPath)._1

  /** Watermark plus the incorporated-row tally the late-arrival audit
    * keeps beside it (ONE file, so the pair advances atomically — two
    * files would reopen the crash seam between snapshot commit and
    * tally credit). Payload: `<wm>` (legacy, tally unknown) or
    * `<wm> <incorporated>`. Rides the checksummed pointer format
    * ([[graft.operators.BatchedState.readPointer]]), so a torn
    * watermark refuses loudly instead of silently rewinding the mark;
    * a legacy bare-long file still parses. */
  def watermarkState(spark: SparkSession,
      snapshotPath: String): (Long, Option[Long]) =
    graft.operators.BatchedState
      .readPointer(spark, watermarkPath(snapshotPath)) match {
      case None => (Long.MinValue, None)
      case Some(payload) =>
        val parts = payload.trim.split("\\s+")
        (parts(0).toLong,
          if (parts.length > 1) Some(parts(1).toLong) else None)
    }

  /** Advance the stored high-water mark (atomic temp+rename; shared by
    * the dedup incremental path, which watermarks on doc id).
    *
    * The swap is a single atomic replace (BatchedState.atomicReplace): the old
    * delete-then-rename left a window where a crash erased the watermark
    * entirely — every committed batch then read as uncommitted, a retry
    * reprocessed the whole corpus into `batch=init`, and readers saw
    * duplicate state. With OVERWRITE semantics the file atomically holds
    * either the old or the new value, never neither. The 3-arg form
    * drops any stored tally (callers outside the audited protocol —
    * the dedup paths — watermark on ids, where the tally has no
    * meaning); pass `incorporated` to keep the late-arrival audit
    * baseline. */
  def writeWatermark(spark: SparkSession, snapshotPath: String,
                     wm: Long, incorporated: Option[Long] = None): Unit =
    graft.operators.BatchedState.writePointer(spark,
      watermarkPath(snapshotPath),
      incorporated.fold(wm.toString)(inc => s"$wm $inc"))

  /** Incorporate all events newer than the watermark into the snapshot.
    * Returns [[IncrementalProtocol.RefreshResult]]: day partitions
    * touched, replay-shed rows, and the late-arrival audit (the exact
    * count of log rows the high-water design has shed — see the
    * protocol doc; pass `audit = false` to skip the counting pass,
    * `shedSink` to quarantine the replay-shed rows Expectations-style).
    * The merge sequence and its crash-retry idempotence guard (the
    * per-partition effective watermark) live in ONE place —
    * [[IncrementalProtocol.refresh]], shared with the supply mart. */
  def refresh(spark: SparkSession, events: DataFrame,
              snapshotPath: String, audit: Boolean = true,
              shedSink: Option[DataFrame => Unit] = None)
      : IncrementalProtocol.RefreshResult =
    IncrementalProtocol.refresh(spark, events, snapshotPath,
      partCol = "day",
      partExpr = dayExpr,
      tsExpr = unix_micros(col("ts")),
      partials = partials,
      combine = combine,
      tsField = "max_ts_us",
      // ONE file per day partition (the SupplyMart/publishOnlineView
      // discipline) — not only small-file hygiene: it makes each
      // partition's dynamic-overwrite commit a single file move, so a
      // crash cannot land a day's max-ts-bearing file while losing a
      // sibling (a tear the per-partition watermark guard would then
      // misread as "fully committed" and shed the lost rows for; see
      // the IncrementalProtocol atomicity note)
      write = (merged, path) => merged
        .repartition(col("day"))
        .sortWithinPartitions(col("day"), col("user_id"))
        .write.mode("overwrite").partitionBy("day").parquet(path),
      audit = audit,
      shedSink = shedSink)

  /** Repair the audited loss: fold BELOW-mark arrivals (the rows
    * `refresh` sheds and `lateRows` counts) into the snapshot by
    * full-compute reconciliation — only drifted day partitions are
    * rewritten ([[IncrementalProtocol.reconcile]]). Run it when the
    * audit alerts; afterwards the next refresh reads `lateRows = 0`. */
  def reconcile(spark: SparkSession, events: DataFrame,
      snapshotPath: String): Int =
    IncrementalProtocol.reconcile(spark, events, snapshotPath,
      partCol = "day",
      partials = partials,
      tsField = "max_ts_us",
      write = (merged, path) => merged
        .repartition(col("day"))
        .sortWithinPartitions(col("day"), col("user_id"))
        .write.mode("overwrite").partitionBy("day").parquet(path))

  /** ONE finalization projection — shared by the serving read and the
    * oracle gate, so the gate certifies exactly what readers execute
    * (two spellings would let them drift while the gate stays green). */
  private def finalize(partialsDf: DataFrame): DataFrame =
    partialsDf
      .select(col("user_id"), col("day"), col("n_events"),
        (col("value_cents").cast("double") / 100.0).as("value_sum"),
        col("n_purchases"),
        (col("n_purchases").cast("double") / col("n_events"))
          .as("purchase_rate"))

  /** Current snapshot, finalized: exact-cents sums surfaced as dollars,
    * purchase rate derived from the partials. */
  def read(spark: SparkSession, snapshotPath: String): DataFrame =
    finalize(spark.read.parquet(snapshotPath))

  /** One-shot full compute of the same result, for parity testing. */
  def full(spark: SparkSession, events: DataFrame,
           snapshotPath: String): Unit = {
    val f = fs(spark, snapshotPath)
    f.delete(new Path(snapshotPath), true)
    refresh(spark, events, snapshotPath): Unit
  }

  /** G14's defining computation as an oracle-gated query (the
    * SupplyMart `supply_mart` convention): the day-grain partials +
    * the read-time finalization, cross-engine exact — COUNT/integer-
    * cent SUM partials, one IEEE division each for the dollar sum and
    * the purchase rate. The parquet round trip, split-associativity
    * and crash-retry idempotence are spec-pinned in IncrementalSpec;
    * this gate certifies the CONTENT. */
  def snapshotGate(spark: SparkSession, d: String): DataFrame =
    finalize(partials(graft.Tables.events(spark, d)))
      .orderBy("user_id", "day")

  val snapshotGateSql: String =
    """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
      |  COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS DOUBLE) / 100.0 AS value_sum,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases,
      |  CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS DOUBLE) / COUNT(*) AS purchase_rate
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incr_snapshot" -> snapshotGate _)

  val oracles: Map[String, String] = Map(
    "incr_snapshot" -> snapshotGateSql)
}
