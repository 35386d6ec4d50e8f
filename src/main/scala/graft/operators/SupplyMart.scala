package graft.operators

import graft.Tables
import graft.functions.Exact._
import graft.registry.{Incremental, IncrementalProtocol}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized derived-supply relation — the `ps` mart.
  *
  * The TPC-H tail (q2/q9/q11/q16, ShapeQueries4) derives its supply
  * relation from the fact table inline: a lineitem-sized scan + one
  * map-side-combinable shuffle PER QUERY. Correct, but at 100 TB that
  * rollup is the dominant cost of the tier and it is paid once per
  * query per sweep. This mart materializes it ONCE with the
  * high-water-mark refresh discipline of [[graft.registry.Incremental]]
  * (reference main.py:195/compute.py:24 recompute the whole raw table
  * per request — the anti-pattern both paths exist to avoid):
  *
  *  - per-(l_partkey, l_suppkey) MERGEABLE partials: `cost_c` (MIN
  *    observed unit price in integer cents), `value_c` (SUM of
  *    extendedprice cents), `max_ship_us` (per-key freshness). MIN,
  *    SUM and MAX are associative+commutative, so N incremental
  *    refreshes over any split of the log are byte-identical to one
  *    full compute (SupplyMartSpec proves the 3-way split);
  *  - the snapshot is hash-bucketed on `l_partkey`
  *    (`bucket=pmod(xxhash64(l_partkey), B)`) so a refresh reads back
  *    ONLY the bucket partitions the delta touches (dynamic partition
  *    overwrite; untouched buckets are neither read nor rewritten);
  *  - a refresh scans only fact rows with `l_shipdate` past the stored
  *    watermark — on a date-partitioned 100 TB log that filter is
  *    partition pruning, i.e. a metadata operation;
  *  - the watermark advances via the shared atomic-replace protocol
  *    ([[graft.registry.IncrementalProtocol]]); refreshes serialize on
  *    the repo's create-new writer lock. Same high-water caveat as
  *    every watermarked path: rows arriving later than a
  *    higher-shipdate row that already advanced the mark are skipped —
  *    use a streaming watermarked path for non-ingestion-ordered logs.
  *
  * Readers get the (part, supplier) grain back at snapshot size
  * (pairs, not fact rows): q2/q16 never touch lineitem at all, q9
  * joins the fact ONCE against the mart instead of re-aggregating it,
  * q11 re-aggregates pair partials (exact integer sums, so
  * bit-identical to the inline form — gate-certified via
  * [[ShapeQueries4]]'s `*From` variants in SupplyMartSpec).
  */
object SupplyMart {

  /** Watermark column as epoch micros: l_shipdate is TIMESTAMP_NTZ in
    * the corpus and `unix_micros` takes TIMESTAMP only — the cast is a
    * stable bijection under the engine's pinned UTC session timezone. */
  private[graft] def shipUs: org.apache.spark.sql.Column =
    unix_micros(col("l_shipdate").cast("timestamp"))

  /** One day in epoch micros — the unit of the mart's admission
    * boundary (windows are day-grain and indivisible). */
  private[graft] val DayUs = 86400000000L

  /** Integer day floor of an epoch-micros value — ONE spelling for the
    * quarantine tee's admission predicate, the fold-back subtraction's
    * day restriction, and the partial-fed straddle check (review wave
    * 3, r17: three hand-spelled copies would drift silently if the
    * boundary granularity ever changed). Column and driver-side forms
    * agree: pmod and floorMod are the same non-negative remainder. */
  private[graft] def dayFloorUs(us: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    us - pmod(us, lit(DayUs))
  private[graft] def dayFloorUs(us: Long): Long =
    us - java.lang.Math.floorMod(us, DayUs)

  /** ONE spelling of the mergeable measures — shared by the batch
    * partials below and the streaming window pre-aggregation
    * ([[graft.streaming.StreamingMartMaintenance]]); two spellings
    * would let stream-fed and batch-fed marts drift while both paths'
    * specs stayed green. */
  private[graft] def measureExprs: Seq[org.apache.spark.sql.Column] = Seq(
    min(cents(col("l_extendedprice") / col("l_quantity"))).as("cost_c"),
    sum(cents(col("l_extendedprice"))).as("value_c"),
    max(shipUs).as("max_ship_us"))

  /** Mergeable per-(part, supplier) partials for a fact chunk. */
  private[operators] def partials(li: DataFrame): DataFrame =
    li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(measureExprs.head, measureExprs.tail: _*)

  private def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("cost_c")).as("cost_c"),
        sum(col("value_c")).as("value_c"),
        max(col("max_ship_us")).as("max_ship_us"))

  private def hfs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bucket count is part of the LAYOUT: a refresh at a different
    * count would route the same part key to two partitions and the
    * touched-bucket merge would silently split-brain. The FIRST
    * refresh records it (meta-first, before any data — even an
    * empty-delta refresh pins the layout, spec'd); every later refresh
    * uses the recorded value. */
  private def recordedBuckets(spark: SparkSession, martPath: String): Option[Int] = {
    val p = new Path(martPath, "_mart_meta.json")
    // the checksummed-pointer read (review wave 2, r16 — this swap
    // site now rides writePointer, so the commit-mode knob governs
    // it): G2 content validates through the checksum, a LEGACY bare
    // file passes through, and under the knob the meta is a manifest
    // directory readers auto-detect
    BatchedState.readPointer(spark, p).map { txt =>
      // demand the COMPLETE single-object document, not just a digit
      // run: a torn legacy write of {"buckets":64} can truncate to
      // {"buckets":6 — which a bare digit regex would happily accept
      // and silently split the layout across two bucket counts.
      // Refuse loudly instead: the recovery (re-copy/rewrite the meta
      // file) is cheap and obvious; a split-brain mart is neither.
      val full = """\A\s*\{\s*"buckets"\s*:\s*(\d+)\s*\}\s*\z""".r
      full.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(
        throw new IllegalStateException(
          s"torn or foreign _mart_meta.json at $p: '$txt' — restore the " +
            "file to {\"buckets\":<n>} with the layout's original count " +
            "before refreshing"))
    }
  }

  /** Record the bucket count as the mart's pinned layout — meta-first,
    * BEFORE any data write, via [[BatchedState.writePointer]] (the
    * repo's pointer write: atomic swap or manifest commit per the
    * session's mode) rather than create(overwrite=true) in place:
    * meta-first ordering already guarantees no data exists yet, but an
    * in-place write can tear, and recordedBuckets' full-parse guard
    * would then refuse every later refresh until an operator
    * intervenes — the pointer protocol removes the torn state instead
    * of detecting it. REFUSES when bucket data already exists without a
    * meta file (the r15 ADVICE finding): such data was laid out at an
    * unknown count, and pinning a guessed one would route the same
    * part key into two layouts — and a reconcile would fingerprint
    * with the wrong routing and delete the other layout's buckets as
    * doomed. The meta file is partition-count metadata beside the
    * data; losing one without the other takes operator action, which
    * is what the refusal demands. */
  private def pinBuckets(spark: SparkSession, martPath: String,
      buckets: Int): Int = {
    val dataDirs = hfs(spark, martPath)
      .globStatus(new Path(s"$martPath/bucket=*"))
    if (dataDirs != null && dataDirs.nonEmpty) throw new IllegalStateException(
      s"mart at $martPath holds bucket data but no _mart_meta.json — its " +
        "layout count is unknown, and writing under a guessed one would " +
        "split part keys across two bucket layouts. Restore the meta " +
        "file to {\"buckets\":<n>} with the layout's original count " +
        "(or delete the mart and rebuild) before refreshing")
    // THE pointer write (review wave 2: this was a hand-rolled
    // temp+atomicReplace — rename-committed even under the manifest
    // knob; writePointer gives it the checksum format AND the
    // session's commit mode)
    BatchedState.writePointer(spark,
      new Path(martPath, "_mart_meta.json"), s"""{"buckets":$buckets}""")
    buckets
  }

  /** Fold all fact rows with `l_shipdate` past the watermark into the
    * mart. Returns [[graft.registry.IncrementalProtocol.RefreshResult]]
    * — bucket partitions touched (0 = no new data) plus the
    * replay-shed and late-arrival audits (see the protocol doc).
    * Single-writer: concurrent refreshes fail loudly on
    * `_lock_refresh` before writing anything. The merge sequence and
    * its crash-retry idempotence guard live in ONE place —
    * [[IncrementalProtocol.refresh]], shared with the day-partitioned
    * event snapshot. */
  def refresh(spark: SparkSession, lineitem: DataFrame, martPath: String,
      buckets: Int = 32, audit: Boolean = true,
      shedSink: Option[DataFrame => Unit] = None)
      : IncrementalProtocol.RefreshResult =
    refreshLocked(spark, lineitem, martPath, buckets, audit, shedSink,
      tsOfRaw = shipUs, partialsOfRaw = partials)

  /** Fold PRE-AGGREGATED key-grain partials — rows already shaped
    * (l_partkey, l_suppkey, cost_c, value_c, max_ship_us) — into the
    * same mart layout. The streaming maintenance entry point
    * ([[graft.streaming.StreamingMartMaintenance]]): finalized
    * event-time windows arrive as partials, and MIN/SUM/MAX partials
    * merge associatively with whatever batch refreshes already wrote.
    * Watermark/guard timestamps ride `max_ship_us` itself — finalized
    * day windows emit in end order, so per-bucket max ship is monotone
    * across micro-batches and a replayed batch is shed exactly.
    *
    * TWO contracts the review wave made explicit and enforced:
    *
    *  - **day-aligned handoff**: a window partial is indivisible — if
    *    its DAY contains the stored watermark strictly inside it (a
    *    batch refresh was seeded mid-day, then the stream finalizes
    *    that whole day), admitting the window would re-add the
    *    morning's rows and shedding it would lose the evening's. The
    *    fold REFUSES such a batch loudly (inside the lock, before any
    *    write): hand off batch→stream on a day boundary, or re-seed
    *    from the log. Pure-stream feeds can never trigger it (all of a
    *    day's windows finalize in one batch, so the mark always rests
    *    at a day's max).
    *  - **no late-audit tally**: the G44 tally counts RAW rows; a
    *    partial-fed refresh would credit it in window-row units and
    *    every later audited raw refresh would misread the difference
    *    as late loss. Partial-fed refreshes therefore run unaudited —
    *    `lateRows` is always −1 here; the streaming loss signal is the
    *    stream's own `numRowsDroppedByWatermark` — while
    *    `replayShedRows` stays exact (counted in partial rows). */
  def refreshFromPartials(spark: SparkSession, partialRows: DataFrame,
      martPath: String, buckets: Int = 32,
      shedSink: Option[DataFrame => Unit] = None)
      : IncrementalProtocol.RefreshResult = {
    refreshLocked(spark, partialRows, martPath, buckets, audit = false,
      shedSink,
      tsOfRaw = col("max_ship_us"),
      // idempotent re-aggregation: combining partials with themselves
      // is the same min/sum/max fold, so one batch carrying several
      // finalized windows of one key collapses correctly
      partialsOfRaw = rows => combine(rows, rows.limit(0)),
      preCheck = (wm, rows) => if (wm != Long.MinValue) {
        // integer day floors on both sides (Spark's `/` on longs is
        // DOUBLE division — a fractional quotient never equals a day)
        val wmDayFloor = dayFloorUs(wm)
        val straddle = rows.filter(col("max_ship_us") > wm &&
          dayFloorUs(col("max_ship_us")) === wmDayFloor).count()
        if (straddle > 0) throw new IllegalStateException(
          s"day-straddling handoff at $martPath: $straddle window " +
            s"partial(s) fall in the watermark's own day (wm=$wm) with " +
            "later timestamps — the stored mark sits mid-day, so the " +
            "indivisible day window can be neither admitted (re-adds " +
            "the pre-mark rows) nor shed (loses the post-mark rows). " +
            "Seed batch→stream handoffs on a day boundary, or rebuild " +
            "the mart from the log")
      })
  }

  private def refreshLocked(spark: SparkSession, raw: DataFrame,
      martPath: String, buckets: Int, audit: Boolean,
      shedSink: Option[DataFrame => Unit],
      tsOfRaw: org.apache.spark.sql.Column,
      partialsOfRaw: DataFrame => DataFrame,
      preCheck: (Long, DataFrame) => Unit = (_, _) => ())
      : IncrementalProtocol.RefreshResult = {
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets=$buckets")
    BatchedState.acquireLock(spark, new Path(s"$martPath/_lock_refresh"),
      "supply-mart refresh")
    try {
      // caller-specific admission check, INSIDE the lock (reading the
      // watermark outside it would race a concurrent refresh) and
      // before any write
      preCheck(Incremental.watermark(spark, martPath), raw)
      // layout pinning, INSIDE the lock and BEFORE any data write (r14
      // review): reading the recorded count outside the lock raced a
      // concurrent first publish, and recording it only after the
      // snapshot write let a crash strand an 8-bucket layout that a
      // retry requesting 64 would then split keys across. Meta-first
      // means every subsequent writer — including a crash retry —
      // provably routes with the same bucket count the layout uses.
      val b = recordedBuckets(spark, martPath)
        .getOrElse(pinBuckets(spark, martPath, buckets))
      // ONE routing expression: the protocol's contract requires the
      // per-row partition (partExpr) and the per-key partition
      // (withBucket) to agree EXACTLY — two spellings would let a
      // future edit desynchronize them and silently re-admit replays
      val bucketExpr = pmod(xxhash64(col("l_partkey")), lit(b.toLong))
      val withBucket = (df: DataFrame) => df.withColumn("bucket", bucketExpr)
      IncrementalProtocol.refresh(spark, raw, martPath,
        partCol = "bucket",
        partExpr = bucketExpr,
        tsExpr = tsOfRaw,
        partials = rows => withBucket(partialsOfRaw(rows)),
        combine = (existing, delta) =>
          withBucket(combine(existing.drop("bucket"), delta.drop("bucket"))),
        tsField = "max_ship_us",
        // ONE sorted file per bucket (the publishOnlineView
        // discipline): without the repartition every shuffle task
        // writes a sliver into every bucket (64 tasks × 64 buckets =
        // 1024 small files at 50×, pure per-file open overhead on
        // every mart read). Sorting by part key gives row-group
        // min/max pruning on part-keyed probes for free.
        write = (merged, path) => merged
          .repartition(b, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("l_partkey"), col("l_suppkey"))
          .write.mode("overwrite").partitionBy("bucket").parquet(path),
        audit = audit,
        shedSink = shedSink)
    } finally BatchedState.releaseLock(spark,
      new Path(s"$martPath/_lock_refresh"))
  }

  /** Repair the audited loss for the mart: fold below-mark shipdates
    * (the rows `refresh` sheds and `lateRows` counts) in by
    * full-compute reconciliation — only drifted bucket partitions are
    * rewritten ([[IncrementalProtocol.reconcile]]); same lock and
    * pinned bucket layout as refresh. Also the recovery verb after a
    * refused day-straddling stream handoff, and retryable through an
    * interrupted overwrite of its own (the protocol rebuilds an
    * emptied partition from the full log). On a mart with no recorded
    * layout, `buckets` pins one meta-first exactly as refresh does —
    * and data-without-meta refuses loudly ([[pinBuckets]]): routing a
    * fingerprint diff with a guessed count would mark every partition
    * of the real layout doomed. */
  def reconcile(spark: SparkSession, lineitem: DataFrame,
      martPath: String, buckets: Int = 32): Int = {
    BatchedState.acquireLock(spark, new Path(s"$martPath/_lock_refresh"),
      "supply-mart refresh")
    try {
      val b = recordedBuckets(spark, martPath)
        .getOrElse(pinBuckets(spark, martPath, buckets))
      val bucketExpr = pmod(xxhash64(col("l_partkey")), lit(b.toLong))
      IncrementalProtocol.reconcile(spark, lineitem, martPath,
        partCol = "bucket",
        partials = raw => partials(raw).withColumn("bucket", bucketExpr),
        tsField = "max_ship_us",
        write = (merged, path) => merged
          .repartition(b, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("l_partkey"), col("l_suppkey"))
          .write.mode("overwrite").partitionBy("bucket").parquet(path))
    } finally BatchedState.releaseLock(spark,
      new Path(s"$martPath/_lock_refresh"))
  }

  /** Current mart at (part, supplier) grain — what the `*From` query
    * variants in [[ShapeQueries4]] consume in place of the inline
    * rollup. */
  def read(spark: SparkSession, martPath: String): DataFrame =
    spark.read.parquet(martPath)
      .select(col("l_partkey"), col("l_suppkey"),
        col("cost_c"), col("value_c"))

  /** The mart's defining computation as an oracle-gated query: the
    * full-compute rollup, cross-engine exact (MIN/SUM of integer
    * cents). The parquet round trip + incremental-split identity are
    * spec-pinned in SupplyMartSpec; this gate certifies the CONTENT. */
  def supplyMartGate(spark: SparkSession, d: String): DataFrame =
    partials(Tables.lineitem(spark, d))
      .select(col("l_partkey"), col("l_suppkey"), col("cost_c"), col("value_c"))
      .orderBy(col("l_partkey"), col("l_suppkey"))

  val supplyMartSql: String =
    """SELECT l_partkey, l_suppkey,
      |  MIN(CAST(floor((l_extendedprice / l_quantity) * 100 + 0.5)
      |    AS BIGINT)) AS cost_c,
      |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS value_c
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** The mart-FED q9 plan as its own oracle gate: build a FRESH mart
    * for `d` in a scratch dir, then run the exact q9ProfitFrom plan
    * the `*From` variants serve, certified against the SAME DuckDB SQL
    * as the inline q9_profit. SupplyMartSpec pins mart-fed ≡ inline
    * row identity within Spark; this gate pins the materialized path
    * cross-engine, end-to-end through the parquet layout. */
  def q9FromMartGate(spark: SparkSession, d: String): DataFrame = {
    // rebuild from scratch EVERY call (review wave): a persistent
    // scratch mart wedged the gate forever on a stale `_lock_refresh`
    // from a killed run, and served stale content if the corpus at `d`
    // was ever regenerated — a correctness GATE buys determinism with
    // the ~1.5 s rebuild, it never trades it for a warm cache
    q9ScratchBuild(spark, d)
    ShapeQueries4.q9ProfitFrom(spark, d,
      read(spark, s"${q9ScratchRoot(d)}/mart"))
  }

  private def q9ScratchRoot(d: String): String = {
    val safe = d.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_q9_mart_$safe"
  }

  /** Build the q9 scratch mart for corpus `d`, fresh (delete + full
    * refresh). The BENCH runs this as untimed setup (r15 directive 3:
    * the recorded `supply_mart_q9` seconds measured ~3-4 s of
    * scratch-mart build I/O on top of the ~1 s mart-fed plan the gate
    * actually certifies — the production path amortizes the build
    * across refreshes, so billing it to the query key misstated the
    * plan); the CORRECTNESS gate calls it inline every time, keeping
    * its determinism. */
  def q9ScratchBuild(spark: SparkSession, d: String): Unit = {
    val rp = new Path(q9ScratchRoot(d))
    rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(rp, true): Unit
    refresh(spark, Tables.lineitem(spark, d),
      s"${q9ScratchRoot(d)}/mart"): Unit
  }

  /** The mart-fed q9 plan over an ALREADY-BUILT scratch mart — the
    * bench-timed body, byte-identical in plan to what
    * [[q9FromMartGate]] runs after its build. Builds on demand when
    * the scratch mart is absent, so a standalone call still works. */
  def q9FromPrebuilt(spark: SparkSession, d: String): DataFrame = {
    val mart = s"${q9ScratchRoot(d)}/mart"
    val mp = new Path(mart)
    if (!mp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(mp))
      q9ScratchBuild(spark, d)
    ShapeQueries4.q9ProfitFrom(spark, d, read(spark, mart))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "supply_mart" -> supplyMartGate _,
    "supply_mart_q9" -> q9FromMartGate _)

  val oracles: Map[String, String] = Map(
    "supply_mart" -> supplyMartSql,
    "supply_mart_q9" -> ShapeQueries4.q9ProfitSql)
}
