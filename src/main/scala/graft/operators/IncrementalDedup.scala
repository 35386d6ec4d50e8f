package graft.operators

import graft.registry.Incremental
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental corpus deduplication — [[DedupPipeline]] extended with the
  * high-water-mark pattern of [[graft.registry.Incremental]] (G14), so a
  * daily crawl drop dedups against the EXISTING cluster state instead of
  * recomputing the corpus. Refresh cost tracks the DELTA, not the corpus:
  *
  *   - per-shingle document frequency is maintained ADDITIVELY — each
  *     batch appends its own (shingle, cnt) partials to
  *     `dfcounts/batch=*`, and a refresh aggregates committed counts for
  *     the batch's shingles only (a semi-join-restricted sum), never
  *     re-aggregating the full (doc, shingle) index;
  *   - cluster labels are written as per-batch DELTAS (new docs + docs
  *     whose label changed), compacted into a full snapshot every
  *     `compactEvery` refreshes — the corpus-wide label table is
  *     rewritten once per compaction cycle, not once per batch.
  *
  * What still scans (read-only, never shuffled whole): the stored
  * shingle index — old docs sharing a rare shingle with the batch can
  * only be found by joining against it — and the label state (latest
  * snapshot + deltas since). Both are pruned scans feeding keyed joins
  * whose shuffled side is batch-sized.
  *
  * Durable state under `statePath` (all parquet + the atomic `_watermark`
  * protocol shared with Incremental):
  *
  *   - `hashes/batch=*`  (_h, rep): exact-text-hash → representative id.
  *     New batches land in their own `batch=` directory keyed by the
  *     watermark they extend. A batch directory is COMMITTED only once
  *     the watermark has advanced past its tag; readers filter to
  *     committed batches, so a refresh that crashed after writing its
  *     directory but before advancing the watermark leaves state the
  *     retry cannot see — the retry re-derives the batch from scratch
  *     and overwrites the orphan directory. Idempotent without an ACID
  *     table format (Delta/Iceberg are environment-blocked; this is the
  *     same adjudicated substitute as the FeatureStore manifest).
  *   - `shingles/batch=*` (doc_id, shingle): the near-dup blocking index
  *     of prior REPRESENTATIVES only (exact-dup members never shingle).
  *   - `dfcounts/batch=*` (shingle, cnt): per-batch shingle document
  *     frequencies — the additive state that replaces re-counting the
  *     shingle index each refresh. Compacted on the same cadence as the
  *     labels: `dfcountsnap/batch=*` holds the summed totals, so the
  *     every-refresh df resolution reads one snapshot + at most
  *     `compactEvery` delta dirs, not every batch ever written.
  *   - `assign/batch=*` (doc_id, cluster_id): per-batch label DELTAS.
  *   - `assignsnap/batch=*` (doc_id, cluster_id): full label snapshots —
  *     written by the first refresh and then whenever `compactEvery`
  *     deltas have accumulated since the last snapshot. Readers take the
  *     latest committed snapshot plus the committed deltas past it,
  *     latest tag per doc winning. A new doc can BRIDGE two existing
  *     clusters and relabel all their members — that relabel rides the
  *     delta as changed-doc rows, propagated by a keyed join on
  *     `cluster_id`, not by walking the old graph.
  *
  * Pruning keeps the LATEST TWO snapshot generations (the current one
  * and its predecessor with the deltas between them); a DataFrame
  * returned by [[assignments]] stays readable across one subsequent
  * compaction, but materialize it if it must outlive more refreshes
  * than that.
  *
  * A refresh processes docs with id > watermark (the G14 caveat applies:
  * ids must be ingestion-monotonic — a late row under an already-passed
  * watermark is skipped):
  *
  *   1. exact dedup of the batch against `hashes` (old hash → inherit the
  *      old representative) and within the batch (min id per new hash);
  *   2. shingle NEW representatives only; candidate pairs = df-capped
  *      shingle blocking of new-rep shingles against the UNION index, so
  *      every candidate touches ≥ 1 new doc — old-old pairs were found by
  *      earlier refreshes and never re-verify. The df cap uses the
  *      committed additive counts + this batch's own;
  *   3. exact Jaccard verification ([[MinHashLsh.verifiedPairs]]) over
  *      the union index, candidates only;
  *   4. connected components over the DELTA graph: the new pairs plus one
  *      (rep → its current cluster label) edge per involved old rep.
  *      Labels are cluster-minimum ids and new ids exceed all old ids, so
  *      the delta CC's min label equals the full recompute's.
  *
  * IncrementalDedupSpec proves refresh-by-parts ≡ [[DedupPipeline.dedup]]
  * over the whole corpus on the real documents table. Parity is exact
  * while the `maxDf` cap never binds; a binding cap can only make the
  * incremental path find MORE true pairs than the one-shot (df grows with
  * the corpus, and verification is exact either way), never admit a false
  * one. Run with the same (threshold, maxDf) every refresh.
  */
object IncrementalDedup {

  private val hashesSchema = StructType(Seq(
    StructField("_h", StringType), StructField("rep", LongType)))
  private val shinglesSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("shingle", StringType)))
  private val dfcountsSchema = StructType(Seq(
    StructField("shingle", StringType), StructField("cnt", LongType)))
  private val assignSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType)))

  private def fs(spark: SparkSession, p: String) = BatchedState.fs(spark, p)
  private def tagOf(wm: Long): String = BatchedState.tagOf(wm)
  private def committedBatches(spark: SparkSession, dir: String,
      wm: Long): Seq[(Long, String)] =
    BatchedState.committedBatches(spark, dir, wm)
  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    BatchedState.emptyDf(spark, schema)
  private def readCommitted(spark: SparkSession, dir: String,
      schema: StructType, wm: Long): DataFrame =
    BatchedState.readCommitted(spark, dir, schema, wm)

  /** (doc_id, cluster_id, _tag) union of the latest committed snapshot
    * and the committed deltas past it — the raw label history a
    * latest-wins reduction turns into current labels. None when no
    * label state exists yet. */
  private def assignParts(spark: SparkSession, statePath: String,
      wm: Long): Option[DataFrame] = {
    val snaps = committedBatches(spark, s"$statePath/assignsnap", wm).sortBy(_._1)
    val deltas = committedBatches(spark, s"$statePath/assign", wm)
      .filter(d => snaps.lastOption.forall(s => d._1 > s._1))
    val parts = (snaps.lastOption.toSeq ++ deltas).map { case (t, dir) =>
      spark.read.parquet(dir)
        .select(col("doc_id"), col("cluster_id"), lit(t).as("_tag")) }
    parts.reduceOption(_ unionByName _)
  }

  /** Latest tag per doc wins. Restrict `parts` BEFORE calling where a
    * bounded key set is known — by doc_id always safely; by cluster_id
    * safely for CURRENT labels only (clusters never split and labels
    * only decrease, so a doc's non-latest rows carry defunct labels
    * that can never equal a current one — filtering by current labels
    * keeps exactly latest rows). */
  private def latestWins(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("doc_id"))
      .agg(max(struct(col("_tag"), col("cluster_id"))).as("_s"))
      .select(col("doc_id"), col("_s.cluster_id").as("cluster_id"))

  /** Current full labels: latest committed snapshot + committed deltas
    * past it, latest tag per doc winning. */
  private def readAssign(spark: SparkSession, statePath: String,
      wm: Long): DataFrame =
    assignParts(spark, statePath, wm)
      .map(latestWins)
      .getOrElse(emptyDf(spark, assignSchema))

  /** Committed per-shingle df partials: the latest committed count
    * snapshot + the delta batches past it (rows still need summing per
    * shingle — they are partials either way). */
  private def readDfCounts(spark: SparkSession, statePath: String,
      wm: Long): DataFrame =
    BatchedState.readSnapshotted(spark, s"$statePath/dfcountsnap",
      s"$statePath/dfcounts", dfcountsSchema, wm)

  private def shingle(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id).as("doc_id"), split(col(text), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))

  /** Current labels: (doc_id, cluster_id, keep) for every doc ever
    * refreshed — the same contract as [[DedupPipeline.dedup]]. */
  def assignments(spark: SparkSession, statePath: String): DataFrame =
    readAssign(spark, statePath, Incremental.watermark(spark, statePath))
      .withColumn("keep", col("doc_id") === col("cluster_id"))

  /** Incorporate all docs with id above the watermark. Returns
    * [[DedupRefreshResult]]: new documents processed (`fresh`, 0 =
    * nothing new) plus the late-arrival audit (`lateRows` — the G44
    * treatment on the id axis: a doc arriving with an id at/below the
    * committed mark is skipped BY DESIGN, but no longer silently; the
    * watermark file carries the incorporated-doc tally, same atomic
    * swap, and each audited refresh counts the input against it —
    * exact when `docs` is the full corpus, clamped under-report on a
    * delta feed, −1 with `audit = false`). One feed-shape contract
    * (the protocol's chunk-fed caveat, id axis): the BASELINING
    * refresh — first audited read of a legacy or post-unaudited state
    * — must see the full corpus; a delta-fed baseline pins too low and
    * the next full feed over-reports the difference as late loss
    * (spec-pinned as documented behavior, BatchedState.idAxisAudit).
    * Alert on lateRows or repair with [[reconcile]].
    *
    * `lateSink` (r17) CAPTURES what the count measures: below-mark
    * rows the label state has never incorporated tee into
    * `lateSink/late-<n>` as evidence, so an operator inspects WHAT
    * arrived late ([[lateArrivals]]) before paying the rebuild, and
    * `reconcile(previous-feed ∪ lateArrivals)` is the fold-back
    * (spec-pinned ≡ one-shot). Membership-based, so it is row-exact
    * under ANY feed shape — the tally's full-corpus baseline caveat
    * does not apply to the captured rows.
    *
    * Writers SERIALIZE on the shared atomic create-new lock
    * ([[BatchedState.acquireLock]], `_lock_refresh`): the batch tag is
    * derived from the watermark, so two concurrent refreshes of one
    * state dir would read the same watermark, write the SAME `batch=`
    * dirs with overwrite, and the second would silently replace the
    * first's delta before the watermark commit — the loser now fails
    * loudly having written nothing instead. The watermark is read AFTER
    * acquiring the lock, so a retry behind a winner sees the advanced
    * mark and processes only what remains. Crash-RETRY idempotence is
    * separate (and kept): a crashed holder leaves a stale lock an
    * operator removes, then the retry overwrites the orphan batch. */
  def refresh(spark: SparkSession, docs: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxDf: Int = 1000,
      compactEvery: Int = 8, anchor: Anchor = Anchor.Local,
      audit: Boolean = true,
      lateSink: Option[String] = None): DedupRefreshResult = {
    BatchedState.acquireLock(spark, new Path(s"$statePath/_lock_refresh"),
      "IncrementalDedup refresh")
    try {
      // an interrupted reconcile wipe must not be refreshed over: the
      // rebuild lands at batch=init (tag MinValue) and any SURVIVING
      // pre-wipe snapshot dir would outrank it once the mark advances
      // — stale labels under a fresh mark (review wave r16)
      BatchedState.refuseIfRebuildPending(spark, statePath, "IncrementalDedup")
      // commit-mode probe before the dedup work: the watermark write
      // happens last (review wave 2 — same shape as the protocol)
      BatchedState.assertPointerWritable(spark,
        new Path(s"$statePath/_watermark"))
      refreshLocked(spark, docs, statePath, idCol, textCol, threshold,
        maxDf, compactEvery, anchor, audit, lateSink)
    } finally BatchedState.releaseLock(spark, new Path(s"$statePath/_lock_refresh"))
  }

  /** Captured late documents across all deliveries into `lateSink` —
    * (doc_id, text), one row per id (crash-retry duplicate captures
    * collapse). The evidence frame an operator inspects before
    * deciding rebuild-vs-ignore, and the quarantine side of the
    * fold-back identity `reconcile(log ∪ lateArrivals) ≡ one-shot`
    * (spec-pinned). Empty frame when nothing was ever captured. */
  def lateArrivals(spark: SparkSession, lateSink: String): DataFrame =
    BatchedState.readCapturedLate(spark, lateSink, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))),
      "doc_id")

  /** The REPAIR verb for the audited loss (the G44 `reconcile` on the
    * id axis): a documented full REBUILD — wipe the state under the
    * lock and re-dedup `docs` (the FULL corpus) from scratch. Not
    * partition-grain like the protocol's reconcile, for a structural
    * reason worth stating: cluster labels are corpus-global MINIMUM
    * ids, so one late low-id doc can become the representative of an
    * existing cluster and relabel every member transitively — there is
    * no partition grain on which "only the drifted part" is definable,
    * and a correct repair costs a full re-dedup regardless of how the
    * state is stored. Stop-the-world: a concurrent [[assignments]]
    * read between the wipe and the rebuilt watermark sees EMPTY state
    * — for continuous serving, rebuild into a fresh statePath and
    * repoint readers (the generation-publish discipline). Afterwards
    * the watermark sits at the corpus max id, the tally equals the
    * corpus size, and the next audited refresh reads `lateRows = 0`.
    * Crash-safe via a `_rebuild_pending` marker around the wipe
    * (review wave r16): an interrupted wipe could leave old-tag
    * snapshot dirs that would OUTRANK a fresh rebuild's `batch=init`
    * once the mark re-advances — so a plain refresh REFUSES loudly
    * while the marker stands, and the recovery is to re-run reconcile
    * (it re-wipes idempotently and holds the full corpus — no false
    * loss, spec-pinned). Mis-fed repairs REFUSE before the wipe
    * (ADVICE r16 — the wipe used to run before looking at the input,
    * so an empty or accidentally delta-fed frame destroyed all
    * committed state and returned DedupRefreshResult(0, 0) silently):
    * an empty `docs` frame, or one whose max id sits BELOW the stored
    * watermark (clear evidence the feed is not the full corpus — the
    * committed state has seen higher ids), fails loudly with the
    * state untouched. A deliberate corpus shrink is the one case the
    * guard blocks; there, delete the state directory and refresh from
    * scratch — that intent should cost an explicit destructive step. */
  def reconcile(spark: SparkSession, docs: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxDf: Int = 1000,
      compactEvery: Int = 8, anchor: Anchor = Anchor.Local)
      : DedupRefreshResult = {
    BatchedState.acquireLock(spark, new Path(s"$statePath/_lock_refresh"),
      "IncrementalDedup refresh")
    try {
      val f = fs(spark, statePath)
      BatchedState.assertFullCorpusFeed(spark, docs, idCol, statePath,
        "IncrementalDedup")
      // marker BEFORE the first delete, removed only after the rebuild
      // commits — the wipe is observable at every crash point
      BatchedState.beginRebuild(spark, statePath)
      // deletePointer, not a bare delete: a crashed watermark-pointer
      // migration's stage must not resurrect the wiped mark
      BatchedState.deletePointer(spark, new Path(s"$statePath/_watermark"))
      Seq("hashes", "shingles", "dfcounts", "dfcountsnap",
        "assign", "assignsnap").foreach(d =>
        f.delete(new Path(s"$statePath/$d"), true): Unit)
      val r = refreshLocked(spark, docs, statePath, idCol, textCol,
        threshold, maxDf, compactEvery, anchor, audit = true)
      BatchedState.finishRebuild(spark, statePath)
      r
    } finally BatchedState.releaseLock(spark,
      new Path(s"$statePath/_lock_refresh"))
  }

  private def refreshLocked(spark: SparkSession, docs: DataFrame,
      statePath: String, idCol: String, textCol: String, threshold: Double,
      maxDf: Int, compactEvery: Int, anchor: Anchor,
      audit: Boolean, lateSink: Option[String] = None): DedupRefreshResult = {
    import Anchor.AnchorOps
    val (wm, incStored) = Incremental.watermarkState(spark, statePath)
    val fresh = docs.filter(col(idCol) > wm)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val hashedNew = fresh.withColumn("_h", md5(col("text"))).anchored(anchor)
    val nFresh = hashedNew.count()
    // late-arrival audit — ONE spelling shared with the embed operator
    // (BatchedState.idAxisAudit): belowCount is a footer-metadata count
    // minus the already-computed fresh count. Baseline caveat stated
    // there: the BASELINING refresh (no stored tally) must see the
    // full corpus, like the protocol's chunk-fed caveat
    val (inc0, late) =
      BatchedState.idAxisAudit(audit, docs.count(), nFresh, incStored)
    // row-level capture (r17, the G45 convention on the id axis):
    // below-mark input rows whose id the LABEL STATE has never seen
    // tee into the sink as evidence. MEMBERSHIP-exact under any feed
    // shape — the label state holds every incorporated doc_id, so
    // unlike the tally arithmetic this needs no full-corpus baseline
    // caveat: a late-only delta delivery captures exactly itself.
    // Opt-in because it costs one below-mark ⋈ label-state anti-join
    // per refresh (keyed shuffle, input-bounded).
    lateSink.foreach { sink =>
      if (wm != Long.MinValue) {
        val below = docs.filter(col(idCol) <= wm)
          .select(col(idCol).as("doc_id"), col(textCol).as("text"))
        val seen = assignParts(spark, statePath, wm)
          .map(_.select(col("doc_id")))
          .getOrElse(emptyDf(spark, assignSchema).select("doc_id"))
        BatchedState.captureLate(spark, sink,
          below.join(seen, Seq("doc_id"), "left_anti")): Unit
      }
    }
    if (nFresh == 0) {
      if (audit && incStored.isEmpty && wm != Long.MinValue)
        // pin the upgrade baseline so later audits attribute arrivals
        Incremental.writeWatermark(spark, statePath, wm, Some(inc0))
      return DedupRefreshResult(0L, late)
    }

    val oldHashes = readCommitted(spark, s"$statePath/hashes", hashesSchema, wm)
    val oldShingles = readCommitted(spark, s"$statePath/shingles", shinglesSchema, wm)
    // the label HISTORY stays lazy — every per-refresh consumer below
    // key-restricts it before the latest-wins reduction, so the full
    // state is never shuffled except at compaction
    val labelParts = assignParts(spark, statePath, wm)
    def labelsFor(keys: DataFrame, keyCol: String): DataFrame =
      labelParts match {
        case None => emptyDf(spark, assignSchema)
        case Some(p) =>
          latestWins(p.join(keys.select(col(keyCol)), Seq(keyCol), "left_semi"))
      }

    // 1. exact dedup: against prior corpus, then within the batch
    val knownRep = hashedNew.join(oldHashes, Seq("_h"))
      .select(col("doc_id"), col("rep"))
    val unknown = hashedNew.join(oldHashes, Seq("_h"), "left_anti")
    val newHashRep = unknown.groupBy(col("_h")).agg(min(col("doc_id")).as("rep"))
      .anchored(anchor)
    val mappedNew = unknown.join(newHashRep, Seq("_h"))
      .select(col("doc_id"), col("text"), col("rep"))

    // 2. candidate pairs touching >= 1 new representative. Only shingles
    // PRESENT IN THIS BATCH can block such a pair, so df is resolved for
    // exactly those: committed additive counts (semi-join-restricted to
    // the batch's shingles) plus the batch's own counts — never a
    // re-aggregation of the full (doc, shingle) index.
    val newShingled = shingle(
      mappedNew.filter(col("doc_id") === col("rep")), "doc_id", "text")
      .anchored(anchor)
    val newCounts = newShingled.groupBy(col("shingle"))
      .agg(count(lit(1)).as("cnt")).anchored(anchor)
    val oldCounts = readDfCounts(spark, statePath, wm)
    val rare = oldCounts
      .join(newCounts.select("shingle"), Seq("shingle"), "left_semi")
      .unionByName(newCounts)
      .groupBy(col("shingle")).agg(sum(col("cnt")).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select("shingle")
    val unionShingled = oldShingles.unionByName(newShingled)
    val blockedNew = newShingled.join(rare, Seq("shingle"), "left_semi")
    val blockedAll = unionShingled.join(rare, Seq("shingle"), "left_semi")
    val candidates = blockedNew.select(col("doc_id").as("id_x"), col("shingle"))
      .join(blockedAll.select(col("doc_id").as("id_y"), col("shingle")), Seq("shingle"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()

    // 3. exact verification over the union index, candidates only
    val pairs = MinHashLsh.verifiedPairs(unionShingled, "doc_id", candidates, threshold)
      .select("id_a", "id_b").anchored(anchor)

    // 4. delta-graph components: new pairs + (old rep -> current label)
    val involved = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val oldRepEdges = labelsFor(involved, "doc_id")
      .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
    val comps = DedupClusters.connectedComponents(
      pairs.unionByName(oldRepEdges), "id_a", "id_b", anchor = anchor)
      .anchored(anchor)
    val compOf = comps.select(col("id").as("cluster_id"), col("comp"))

    // old docs whose label actually changed (bridging merges) — the
    // delta rows that propagate a merge to all prior members. The
    // cluster_id restriction is against CURRENT labels (compOf keys),
    // which latestWins' invariant makes exact; only members of merged
    // clusters are ever shuffled, not the corpus
    val assignChanged = labelsFor(compOf, "cluster_id")
      .join(compOf, Seq("cluster_id"))
      .filter(col("comp") =!= col("cluster_id"))
      .select(col("doc_id"), col("comp").as("cluster_id"))
    // new representatives: component label, or themselves if unpaired
    val assignNewReps = mappedNew.filter(col("doc_id") === col("rep"))
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .anchored(anchor)
    // batch exact-dup members inherit their new representative's label
    val assignNewDups = mappedNew.filter(col("doc_id") =!= col("rep"))
      .join(assignNewReps.select(col("doc_id").as("rep"), col("cluster_id")), Seq("rep"))
      .select(col("doc_id"), col("cluster_id"))
    // exact dups of PRIOR docs inherit the (possibly relabeled) old rep
    val assignKnown = knownRep
      .join(labelsFor(knownRep.select(col("rep").as("doc_id")), "doc_id")
          .join(compOf, Seq("cluster_id"), "left")
          .select(col("doc_id").as("rep"),
            coalesce(col("comp"), col("cluster_id")).as("cluster_id")),
        Seq("rep"))
      .select(col("doc_id"), col("cluster_id"))
    val assignNew = assignNewReps.unionByName(assignNewDups).unionByName(assignKnown)

    // compaction cadence: first refresh snapshots (it IS the full state);
    // after that, snapshot once compactEvery deltas have accumulated
    val snapsBefore = committedBatches(spark, s"$statePath/assignsnap", wm).sortBy(_._1)
    val deltasSinceSnap = committedBatches(spark, s"$statePath/assign", wm)
      .count(d => snapsBefore.lastOption.forall(d._1 > _._1))
    val doSnapshot = snapsBefore.isEmpty || deltasSinceSnap + 1 >= compactEvery

    // writes: all outputs are keyed by the watermark they extend, so a
    // retry of a failed refresh overwrites its own output and readers
    // (filtered to committed tags) never see a torn batch; the watermark
    // advances LAST, committing everything at once
    val tag = tagOf(wm)
    newHashRep.select("_h", "rep").write.mode("overwrite")
      .parquet(s"$statePath/hashes/batch=$tag")
    newShingled.write.mode("overwrite")
      .parquet(s"$statePath/shingles/batch=$tag")
    if (doSnapshot)
      // fold every committed partial + this batch into one summed
      // snapshot — the df resolution's read fan-in stays bounded
      oldCounts.unionByName(newCounts)
        .groupBy(col("shingle")).agg(sum(col("cnt")).as("cnt"))
        .write.mode("overwrite").parquet(s"$statePath/dfcountsnap/batch=$tag")
    else
      newCounts.select("shingle", "cnt").write.mode("overwrite")
        .parquet(s"$statePath/dfcounts/batch=$tag")
    if (doSnapshot) {
      // the one corpus-sized label pass, amortized over compactEvery
      // refreshes: full latest-wins + this batch's merges and additions
      val oldCurFull = labelParts.map(p => latestWins(p)
          .join(compOf, Seq("cluster_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("cluster_id")).as("cluster_id")))
        .getOrElse(emptyDf(spark, assignSchema))
      oldCurFull.unionByName(assignNew).write.mode("overwrite")
        .parquet(s"$statePath/assignsnap/batch=$tag")
    } else
      assignChanged.unionByName(assignNew).write.mode("overwrite")
        .parquet(s"$statePath/assign/batch=$tag")
    val newWm = hashedNew.agg(max(col("doc_id"))).head().getLong(0)
    // tally and mark advance in ONE swap (the G44 invariant); an
    // unaudited refresh drops the tally and the next audited one
    // re-baselines, honestly — arrivals during the unaudited window
    // are not attributed
    Incremental.writeWatermark(spark, statePath, math.max(wm, newWm),
      if (audit) Some(inc0 + nFresh) else None)

    // prune superseded label + count state (best-effort; keeps the
    // latest TWO snapshot generations, so a lazy assignments() frame
    // from the previous generation stays readable across one compaction)
    val wmNow = math.max(wm, newWm)
    BatchedState.pruneSnapshotted(spark, s"$statePath/assignsnap",
      s"$statePath/assign", wmNow)
    BatchedState.pruneSnapshotted(spark, s"$statePath/dfcountsnap",
      s"$statePath/dfcounts", wmNow)
    DedupRefreshResult(nFresh, late)
  }
}
