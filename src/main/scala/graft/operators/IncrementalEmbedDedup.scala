package graft.operators

import graft.registry.Incremental
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental embedding near-dup — the G17 high-water-mark treatment
  * for [[Similarity.lshNearDupPairs]] (C5's scale path), so a daily
  * embedding drop sketches ONLY its new vectors against the stored
  * sketch cells of prior ones. Text docs got this in [[IncrementalDedup]];
  * a crawl pipeline ingests both modalities together, and without this
  * the embedding side re-sketches and re-pairs the whole corpus per drop.
  *
  * Durable state under `statePath` ([[BatchedState]] committed-batch
  * protocol + the shared atomic `_watermark`):
  *
  *   - `cells/batch=*` (vec_id, table_idx, bucket): the multi-table
  *     hyperplane-LSH cells of every vector ever refreshed — ids and
  *     bucket keys only, a few bytes per cell; embeddings are NEVER
  *     stored here and never ride the candidate shuffle. The cell index
  *     is joined EVERY refresh, so it compacts every `compactEvery`
  *     refreshes into `cellsnap/batch=*` (a plain union — cell rows are
  *     immutable), bounding read fan-in to one snapshot + at most
  *     compactEvery delta dirs.
  *   - `pairs/batch=*` (id_a, id_b, cos): the verified near-dup pairs
  *     each refresh discovered. Append-only; [[pairs]] unions the
  *     committed batches.
  *   - `vectors/batch=*` + `vecsnap/batch=*` (vec_id, embedding,
  *     partitioned by `id_bucket` = vec_id div bucketWidth): the raw
  *     embeddings of every vector ever refreshed, written delta-sized
  *     per refresh and folded on the same snapshot cadence as the
  *     cells. This is what makes the state SELF-CONTAINED (r8): the
  *     exact-cosine verify re-attaches OLD embeddings from here, so a
  *     refresh needs only the DELTA frame — the caller no longer
  *     re-scans the full corpus per refresh to hand the operator
  *     embeddings it already stored. The attach read prunes to the
  *     id_buckets the candidate set actually touches (delta-driven
  *     partition pruning — candidates all touch ≥ 1 new vector, so the
  *     touched-bucket list is candidate-bounded driver metadata, capped
  *     by maxAttachBuckets with a read-everything fallback).
  *
  * A refresh processes vectors with id > watermark (ingestion-monotonic
  * ids, the G14 caveat): new cells equi-join against committed ∪ new
  * cells, so every candidate pair touches ≥ 1 new vector — old-old
  * pairs were found by earlier refreshes and never re-verify. Exact
  * cosine verification (new-side embeddings from the delta in hand,
  * old-side from the pruned vector store, both keyed shortlist joins)
  * keeps false positives impossible, exactly as in the one-shot
  * operator; the sketch controls recall alone, and the hyperplanes are
  * seeded constants, so split refreshes see the SAME buckets the
  * one-shot sees. IncrementalEmbedDedupSpec proves the union of
  * split-refresh pairs ≡ one-shot [[Similarity.lshNearDupPairs]] on the
  * real embeddings — including refreshes fed ONLY their delta.
  *
  * Run it over exact-dedup representatives (the [[DedupPipeline]]
  * convention) with the same (dims, threshold, tables, planesPerTable,
  * bucketWidth) every refresh.
  */
object IncrementalEmbedDedup {

  private val cellsSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("table_idx", IntegerType),
    StructField("bucket", LongType)))
  private val pairsSchema = StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("cos", DoubleType)))

  /** Committed raw-vector store: latest snapshot + deltas past it, each
    * batch dir read from its own root so the `id_bucket` partition
    * column resolves per directory. Returns (vec_id, embedding,
    * id_bucket) — filter on id_bucket BEFORE using it and the parquet
    * scans prune to the touched partitions (spec-audited). */
  private[operators] def storedVectors(spark: SparkSession,
      statePath: String): DataFrame = {
    val wm = Incremental.watermark(spark, statePath)
    val snaps = BatchedState.committedBatches(
      spark, s"$statePath/vecsnap", wm).sortBy(_._1)
    val deltas = BatchedState.committedBatches(
        spark, s"$statePath/vectors", wm)
      .filter(d => snaps.lastOption.forall(s => d._1 > s._1))
    val dirs = snaps.lastOption.toSeq.map(_._2) ++ deltas.map(_._2)
    // pre-r8 state stored no vectors: the old-side attach would come up
    // empty and silently drop every new-old pair — fail with the reason
    require(dirs.nonEmpty || wm == Long.MinValue,
      s"state at $statePath predates the self-contained vector store " +
        "(committed watermark but no vectors/ batches) — rebuild the state")
    val frames = dirs.map(d => spark.read.parquet(d)
      .select(col("vec_id"), col("embedding"),
        col("id_bucket").cast("long").as("id_bucket")))
    frames.reduceOption(_.unionByName(_))
      .getOrElse(BatchedState.emptyDf(spark, vecSchema))
  }

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("id_bucket", LongType)))

  /** All near-dup pairs found so far (union of committed refreshes). */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    BatchedState.readCommitted(spark, s"$statePath/pairs", pairsSchema,
      Incremental.watermark(spark, statePath))

  /** Incorporate all vectors with id above the watermark. `vecs` may be
    * the full corpus frame OR just the delta — rows at or below the
    * watermark are ignored either way, and OLD embeddings come from the
    * state's own vector store, never from `vecs` (r8: the caller no
    * longer re-scans its corpus per refresh). Returns
    * [[DedupRefreshResult]]: new vectors processed (`fresh`, 0 =
    * nothing new) plus the late-arrival audit (`lateRows`, the G44
    * treatment on the id axis — EXACT only when `vecs` is the full
    * corpus; the delta feed this operator explicitly supports
    * under-reports, clamped at 0, and the next full-corpus refresh
    * reads exactly again ONCE a full-fed baseline exists: the
    * BASELINING refresh (no stored tally) must see the full corpus or
    * the next full feed over-reports (BatchedState.idAxisAudit's
    * caveat); −1 with `audit = false`). Alert on it or repair with
    * [[reconcile]]. `lateSink` (r17) CAPTURES what the count measures:
    * below-mark vectors the state's own vector store has never
    * incorporated tee into `lateSink/late-<n>` ([[lateArrivals]]), so
    * the operator sees WHAT arrived before paying the rebuild and
    * `reconcile(previous-feed ∪ lateArrivals)` is the fold-back
    * (spec-pinned ≡ one-shot). Membership-based — row-exact under any
    * feed shape, no full-corpus baseline caveat.
    *
    * Writers SERIALIZE on the shared atomic create-new lock
    * ([[BatchedState.acquireLock]], `_lock_refresh`), exactly like
    * [[IncrementalDedup.refresh]]: the batch tag is watermark-derived,
    * so unserialized concurrent refreshes would overwrite one another's
    * `batch=` dirs and silently drop a delta — the loser now fails
    * loudly having written nothing, and the watermark is read under the
    * lock so a retry behind a winner processes only what remains. */
  def refresh(spark: SparkSession, vecs: DataFrame, statePath: String,
      idCol: String = "vec_id", dims: Int = 64, threshold: Double = 0.45,
      tables: Int = 24, planesPerTable: Int = 4,
      compactEvery: Int = 8, bucketWidth: Long = 1L << 20,
      maxAttachBuckets: Int = 65536, anchor: Anchor = Anchor.Local,
      audit: Boolean = true,
      lateSink: Option[String] = None): DedupRefreshResult = {
    val lock = new org.apache.hadoop.fs.Path(s"$statePath/_lock_refresh")
    BatchedState.acquireLock(spark, lock, "IncrementalEmbedDedup refresh")
    try {
      // see IncrementalDedup.refresh: a refresh over an interrupted
      // reconcile wipe would be outranked by surviving old-tag
      // snapshot dirs once the mark re-advances
      BatchedState.refuseIfRebuildPending(spark, statePath,
        "IncrementalEmbedDedup")
      BatchedState.assertPointerWritable(spark,
        new org.apache.hadoop.fs.Path(s"$statePath/_watermark"))
      refreshLocked(spark, vecs, statePath, idCol, dims, threshold,
        tables, planesPerTable, compactEvery, bucketWidth, maxAttachBuckets,
        anchor, audit, lateSink)
    } finally BatchedState.releaseLock(spark, lock)
  }

  /** Captured late vectors across all deliveries into `lateSink` —
    * (vec_id, embedding), one row per id. The evidence frame and the
    * quarantine side of `reconcile(log ∪ lateArrivals) ≡ one-shot`. */
  def lateArrivals(spark: SparkSession, lateSink: String): DataFrame =
    BatchedState.readCapturedLate(spark, lateSink, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))), "vec_id")

  /** The REPAIR verb for the audited loss (the G44 `reconcile` on the
    * id axis): a documented full REBUILD — wipe the state under the
    * lock and re-sketch `vecs` (the FULL corpus) from scratch. Not
    * partition-grain, for a protocol reason worth stating: state
    * batches are keyed by the watermark value they EXTEND and commit
    * only once the mark passes their tag — a below-mark repair batch
    * has no tag slot that commits without moving the mark over ids
    * that do not exist yet. The hyperplanes are seeded constants, so
    * the rebuild finds every pair the one-shot finds, including the
    * late vectors' (spec-pinned). Stop-the-world: a concurrent
    * [[pairs]] read between the wipe and the rebuilt watermark sees
    * EMPTY state — for continuous serving, rebuild into a fresh
    * statePath and repoint (the generation-publish discipline).
    * Afterwards the next audited full-corpus refresh reads
    * `lateRows = 0`. Crash-safe via the `_rebuild_pending` marker
    * around the wipe (review wave r16 — see
    * [[IncrementalDedup.reconcile]] for the resurrection hazard it
    * closes): a plain refresh refuses loudly while the marker stands;
    * re-run reconcile (idempotent re-wipe, full corpus in hand).
    * Mis-fed repairs REFUSE before the wipe (ADVICE r16, the
    * [[IncrementalDedup.reconcile]] guard): an empty `vecs` frame, or
    * one whose max id sits below the stored watermark (the feed is
    * provably not the full corpus), fails loudly with the state
    * untouched instead of erasing it; a deliberate corpus shrink
    * deletes the state directory explicitly. */
  def reconcile(spark: SparkSession, vecs: DataFrame, statePath: String,
      idCol: String = "vec_id", dims: Int = 64, threshold: Double = 0.45,
      tables: Int = 24, planesPerTable: Int = 4,
      compactEvery: Int = 8, bucketWidth: Long = 1L << 20,
      maxAttachBuckets: Int = 65536, anchor: Anchor = Anchor.Local)
      : DedupRefreshResult = {
    val lock = new org.apache.hadoop.fs.Path(s"$statePath/_lock_refresh")
    BatchedState.acquireLock(spark, lock, "IncrementalEmbedDedup refresh")
    try {
      val f = BatchedState.fs(spark, statePath)
      BatchedState.assertFullCorpusFeed(spark, vecs, idCol, statePath,
        "IncrementalEmbedDedup")
      BatchedState.beginRebuild(spark, statePath)
      // deletePointer: see IncrementalDedup.reconcile
      BatchedState.deletePointer(spark,
        new org.apache.hadoop.fs.Path(s"$statePath/_watermark"))
      Seq("cells", "cellsnap", "pairs", "vectors", "vecsnap").foreach(d =>
        f.delete(new org.apache.hadoop.fs.Path(s"$statePath/$d"), true): Unit)
      val r = refreshLocked(spark, vecs, statePath, idCol, dims, threshold,
        tables, planesPerTable, compactEvery, bucketWidth, maxAttachBuckets,
        anchor, audit = true)
      BatchedState.finishRebuild(spark, statePath)
      r
    } finally BatchedState.releaseLock(spark, lock)
  }

  private def refreshLocked(spark: SparkSession, vecs: DataFrame,
      statePath: String, idCol: String, dims: Int, threshold: Double,
      tables: Int, planesPerTable: Int, compactEvery: Int,
      bucketWidth: Long, maxAttachBuckets: Int, anchor: Anchor,
      audit: Boolean, lateSink: Option[String] = None): DedupRefreshResult = {
    import Anchor.AnchorOps
    val (wm, incStored) = Incremental.watermarkState(spark, statePath)
    val fresh = vecs.filter(col(idCol) > wm)
      .select(col(idCol).as("vec_id"), col("embedding"))
    val nFresh = fresh.count()
    // the id-axis late audit, ONE spelling (BatchedState.idAxisAudit):
    // exact on a full-corpus feed, clamped on the delta feed this
    // operator's contract explicitly allows; the BASELINING refresh
    // must be full-fed (caveat stated at the helper)
    val (inc0, late) =
      BatchedState.idAxisAudit(audit, vecs.count(), nFresh, incStored)
    // row-level capture (r17, the IncrementalDedup convention): the
    // state's own vector store is the incorporated-id truth, so the
    // anti-join is membership-exact under any feed shape. Opt-in —
    // one below-mark ⋈ vector-store anti-join per refresh.
    lateSink.foreach { sink =>
      if (wm != Long.MinValue) {
        val below = vecs.filter(col(idCol) <= wm)
          .select(col(idCol).as("vec_id"), col("embedding"))
        val seen = storedVectors(spark, statePath).select(col("vec_id"))
        BatchedState.captureLate(spark, sink,
          below.join(seen, Seq("vec_id"), "left_anti")): Unit
      }
    }
    if (nFresh == 0) {
      if (audit && incStored.isEmpty && wm != Long.MinValue)
        Incremental.writeWatermark(spark, statePath, wm, Some(inc0))
      return DedupRefreshResult(0L, late)
    }

    val newCells = AnnSearch.sketchCells(fresh, "vec_id", dims, tables, planesPerTable)
      .anchored(anchor)
    val oldCells = BatchedState.readSnapshotted(spark, s"$statePath/cellsnap",
      s"$statePath/cells", cellsSchema, wm)

    // candidates = new cells against the UNION cell index: a plain
    // equi-join on the (table, bucket) cell key, hot cells split under
    // AQE; every pair touches >= 1 new vector by construction.
    // Materialized once: consumed by the touched-bucket collect AND the
    // verify joins below.
    val a = newCells.select(col("vec_id").as("id_x"), col("table_idx"), col("bucket"))
    val b = oldCells.unionByName(newCells)
      .select(col("vec_id").as("id_y"), col("table_idx"), col("bucket"))
    val candidates = a.join(b, Seq("table_idx", "bucket"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
      .anchored(anchor)

    // old-side attach, pruned: the candidate ids are delta-bounded, so
    // the id_buckets they touch are driver metadata (distinct-collected,
    // same class as IvfIndex's probed lists); past maxAttachBuckets fall
    // back to the unpruned store read — a cost fallback, never a
    // correctness one
    val touched = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("vid"))
      .select(expr(s"vid div $bucketWidth").as("b")).distinct()
      .limit(maxAttachBuckets + 1).collect().map(_.getLong(0))
    val stored = storedVectors(spark, statePath)
    val storedPruned =
      if (touched.length > maxAttachBuckets) stored
      else stored.filter(col("id_bucket").isin(touched.toSeq: _*))

    // exact cosine verify, candidates only — identical to the one-shot;
    // new-side embeddings are the delta in hand, old-side the pruned
    // store (every cell-index id is in the store by the write order
    // below, so no candidate can lose its embedding)
    val e = fresh.select(col("vec_id").as("vid"), col("embedding"))
      .unionByName(storedPruned.select(col("vec_id").as("vid"), col("embedding")))
      .withColumn("nrm", VecDot.vecNorm(col("embedding")))
    val verified = candidates
      .join(e.select(col("vid").as("id_a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col("vid").as("id_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", VecDot.cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .anchored(anchor) // materialize before the state writes below

    // batch-keyed writes + watermark-last commit (BatchedState protocol);
    // first refresh snapshots (it IS the full index), then every
    // compactEvery deltas fold into a fresh snapshot. Cells and vectors
    // share one cadence — one state story, not two.
    val snapsBefore = BatchedState.committedBatches(
      spark, s"$statePath/cellsnap", wm)
    val deltasSinceSnap = BatchedState.committedBatches(
        spark, s"$statePath/cells", wm)
      .count(d => snapsBefore.sortBy(_._1).lastOption.forall(s => d._1 > s._1))
    val doSnapshot = snapsBefore.isEmpty || deltasSinceSnap + 1 >= compactEvery
    val tag = BatchedState.tagOf(wm)
    val freshVec = fresh
      .withColumn("id_bucket", expr(s"vec_id div $bucketWidth"))
    if (doSnapshot) {
      oldCells.unionByName(newCells).write.mode("overwrite")
        .parquet(s"$statePath/cellsnap/batch=$tag")
      stored.unionByName(freshVec).write.mode("overwrite")
        .partitionBy("id_bucket").parquet(s"$statePath/vecsnap/batch=$tag")
    } else {
      newCells.write.mode("overwrite").parquet(s"$statePath/cells/batch=$tag")
      freshVec.write.mode("overwrite")
        .partitionBy("id_bucket").parquet(s"$statePath/vectors/batch=$tag")
    }
    verified.write.mode("overwrite").parquet(s"$statePath/pairs/batch=$tag")
    val newWm = fresh.agg(max(col("vec_id"))).head().getLong(0)
    // tally and mark advance in ONE swap (the G44 invariant). NOTE the
    // tally counts vectors incorporated from whatever feed arrived —
    // on a delta feed the early chunks' counts accumulate correctly,
    // so a later full-corpus refresh still reads exact
    Incremental.writeWatermark(spark, statePath, math.max(wm, newWm),
      if (audit) Some(inc0 + nFresh) else None)
    BatchedState.pruneSnapshotted(spark, s"$statePath/cellsnap",
      s"$statePath/cells", math.max(wm, newWm))
    BatchedState.pruneSnapshotted(spark, s"$statePath/vecsnap",
      s"$statePath/vectors", math.max(wm, newWm))
    DedupRefreshResult(nFresh, late)
  }
}
