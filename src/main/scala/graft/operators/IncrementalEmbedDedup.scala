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
  *
  * A refresh processes vectors with id > watermark (ingestion-monotonic
  * ids, the G14 caveat): new cells equi-join against committed ∪ new
  * cells, so every candidate pair touches ≥ 1 new vector — old-old
  * pairs were found by earlier refreshes and never re-verify. Exact
  * cosine verification (embeddings re-attached by keyed joins from the
  * caller's corpus frame, shortlist-sized) keeps false positives
  * impossible, exactly as in the one-shot operator; the sketch controls
  * recall alone, and the hyperplanes are seeded constants, so split
  * refreshes see the SAME buckets the one-shot sees.
  * IncrementalEmbedDedupSpec proves the union of split-refresh pairs ≡
  * one-shot [[Similarity.lshNearDupPairs]] on the real embeddings.
  *
  * Run it over exact-dedup representatives (the [[DedupPipeline]]
  * convention) with the same (dims, threshold, tables, planesPerTable)
  * every refresh.
  */
object IncrementalEmbedDedup {

  private val cellsSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("table_idx", IntegerType),
    StructField("bucket", LongType)))
  private val pairsSchema = StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("cos", DoubleType)))

  /** All near-dup pairs found so far (union of committed refreshes). */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    BatchedState.readCommitted(spark, s"$statePath/pairs", pairsSchema,
      Incremental.watermark(spark, statePath))

  /** Incorporate all vectors with id above the watermark. `vecs` is the
    * full corpus frame (old + new) — old rows are touched only through
    * keyed joins on candidate ids, never re-sketched. Returns the number
    * of new vectors processed (0 = nothing new). */
  def refresh(spark: SparkSession, vecs: DataFrame, statePath: String,
      idCol: String = "vec_id", dims: Int = 64, threshold: Double = 0.45,
      tables: Int = 24, planesPerTable: Int = 4,
      compactEvery: Int = 8): Long = {
    val wm = Incremental.watermark(spark, statePath)
    val fresh = vecs.filter(col(idCol) > wm)
      .select(col(idCol).as("vec_id"), col("embedding"))
    val nFresh = fresh.count()
    if (nFresh == 0) return 0L

    val newCells = AnnSearch.sketchCells(fresh, "vec_id", dims, tables, planesPerTable)
      .localCheckpoint(true)
    val oldCells = BatchedState.readSnapshotted(spark, s"$statePath/cellsnap",
      s"$statePath/cells", cellsSchema, wm)

    // candidates = new cells against the UNION cell index: a plain
    // equi-join on the (table, bucket) cell key, hot cells split under
    // AQE; every pair touches >= 1 new vector by construction
    val a = newCells.select(col("vec_id").as("id_x"), col("table_idx"), col("bucket"))
    val b = oldCells.unionByName(newCells)
      .select(col("vec_id").as("id_y"), col("table_idx"), col("bucket"))
    val candidates = a.join(b, Seq("table_idx", "bucket"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()

    // exact cosine verify, candidates only — identical to the one-shot
    val e = vecs.select(col(idCol).as("vid"), col("embedding"),
      VecDot.vecNorm(col("embedding")).as("nrm"))
    val verified = candidates
      .join(e.select(col("vid").as("id_a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col("vid").as("id_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", VecDot.cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .localCheckpoint(true) // materialize before the state writes below

    // batch-keyed writes + watermark-last commit (BatchedState protocol);
    // first refresh snapshots (it IS the full index), then every
    // compactEvery deltas fold into a fresh snapshot
    val snapsBefore = BatchedState.committedBatches(
      spark, s"$statePath/cellsnap", wm)
    val deltasSinceSnap = BatchedState.committedBatches(
        spark, s"$statePath/cells", wm)
      .count(d => snapsBefore.sortBy(_._1).lastOption.forall(s => d._1 > s._1))
    val doSnapshot = snapsBefore.isEmpty || deltasSinceSnap + 1 >= compactEvery
    val tag = BatchedState.tagOf(wm)
    if (doSnapshot)
      oldCells.unionByName(newCells).write.mode("overwrite")
        .parquet(s"$statePath/cellsnap/batch=$tag")
    else
      newCells.write.mode("overwrite").parquet(s"$statePath/cells/batch=$tag")
    verified.write.mode("overwrite").parquet(s"$statePath/pairs/batch=$tag")
    val newWm = fresh.agg(max(col("vec_id"))).head().getLong(0)
    Incremental.writeWatermark(spark, statePath, math.max(wm, newWm))
    BatchedState.pruneSnapshotted(spark, s"$statePath/cellsnap",
      s"$statePath/cells", math.max(wm, newWm))
    nFresh
  }
}
