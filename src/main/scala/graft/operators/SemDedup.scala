package graft.operators

import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEMANTIC deduplication — near-duplicate removal in embedding space
  * at corpus scale (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication"; the recipe
  * the DataComp/LAION curation stacks apply to image-text corpora).
  * Doc-level C5 finds embedding near-dups by LSH over ALL pairs above
  * a cosine threshold; SemDeDup's insight is that k-means clustering
  * bounds the pair search — duplicates land in the same cluster, so
  * only within-cluster pairs are examined — and that among a duplicate
  * group the example FARTHEST from the cluster centroid (lowest
  * centroid cosine) is the one to keep: pruning toward outliers
  * preserves diversity where keep-first would preserve redundancy.
  *
  * Rule (the paper's upper-triangular formulation): within each
  * cluster, order items by (centroid cosine asc, id); an item is a
  * DUPLICATE iff its cosine to some EARLIER item reaches `threshold`.
  * The kept member of every duplicate group is therefore its
  * lowest-centroid-cosine example, deterministically.
  *
  * Scale shape: assignment is a ROW-LOCAL argmax fold over the
  * centroid array embedded as a literal (no join, no shuffle, no per-id
  * window — a corpus×nlist exchange would dwarf the operator; the
  * literal is nlist×dim floats, guarded ≤ 8192 lists — past that,
  * assign with the broadcast k-means model and use
  * [[semDedupAssigned]]); ranking is a window partitioned BY CLUSTER
  * (never global); the pair search is one self-join keyed on cluster
  * id — O(c²) per cluster, the paper's own cost model, which `nlist`
  * (≈√n default) keeps bounded. A cluster past `maxClusterSize` fails
  * LOUDLY with the paper's own remedy (raise nlist) rather than
  * pinning one task with a quadratic straggler; the probe is one
  * nlist-row driver aggregate.
  *
  * [[semDedup]] trains k-means (the IvfSearch sampler) and delegates to
  * [[semDedupWithCentroids]], whose expression-level assignment
  * (argmax 2e·c − |c|², first max wins — so ties break to the lower
  * list_id — deterministic, layout-free, spec-matchable) keeps
  * KMeansModel.transform out of the semantics: given centroids the
  * output is a pure function of the input set.
  */
object SemDedup {

  private def cosCol(a: Column, b: Column): Column =
    VecDot.vecDot(a, b) / (VecDot.vecNorm(a) * VecDot.vecNorm(b))

  /** Train centroids (k-means over a bounded sample — the IvfSearch
    * trainer) and run [[semDedupWithCentroids]]. `nlist` 0 → ≈√n. */
  def semDedup(vecs: DataFrame, threshold: Double = 0.95,
      nlist: Int = 0, id: String = "id", embCol: String = "embedding",
      seed: Long = 42L, maxTrainRows: Long = 50000L,
      maxClusterSize: Long = 10000L): DataFrame = {
    val n = vecs.count()
    val nl = if (nlist > 0) nlist else IvfSearch.defaultNlist(n)
    val spark = vecs.sparkSession
    import spark.implicits._
    val centroids = IvfSearch
      .trainModel(vecs.withColumnRenamed(embCol, "embedding"), n, nl, seed,
        maxTrainRows)
      .clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("list_id", "centroid")
    semDedupWithCentroids(vecs, centroids, threshold, id, embCol,
      maxClusterSize)
  }

  /** Assign every vector to its nearest centroid (euclidean, expanded
    * 2e·c − |c|²; ties to the lower list_id) with a row-local fold over
    * the literal centroid array, then apply [[semDedupAssigned]].
    * `centroids` must be (list_id, centroid) with distinct list ids,
    * at most 8192 of them (the literal-plan regime; past that, assign
    * via the broadcast k-means model and call semDedupAssigned). */
  def semDedupWithCentroids(vecs: DataFrame, centroids: DataFrame,
      threshold: Double = 0.95, id: String = "id",
      embCol: String = "embedding",
      maxClusterSize: Long = 10000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold out of (0, 1]")
    // assignment lives in ClusterOps.assignCentroids (one definition
    // shared with the D12 selection operators — r11 s6 refactor; the
    // guards, the limit-bounded driver fetch, and the first-max tie
    // rule moved verbatim)
    semDedupAssigned(
      ClusterOps.assignCentroids(vecs, centroids, id, embCol),
      threshold, id, embCol, maxClusterSize)
  }

  /** The rule core over a PRE-ASSIGNED frame — (id, embCol,
    * cluster_id, centroid_sim) — for callers whose assignment came
    * from elsewhere (a persisted IVF index's lists, a huge-nlist
    * broadcast k-means projection): rank within cluster by
    * (centroid_sim asc, id), flag items whose cosine to an earlier
    * cluster-mate reaches `threshold`. Output: one row per input —
    * (id, cluster_id, centroid_sim, keep, dup_of) with `dup_of` the
    * earliest similar cluster-mate (null for kept rows).
    *
    * Execution contract (NOT a lazy frame-returning operator): calling
    * this runs Spark jobs immediately — the ranked frame is eagerly
    * `localCheckpoint`ed (it feeds three consumers) and the
    * straggler probe fires a small aggregate before the quadratic join
    * is allowed to exist. The returned DataFrame reads the checkpoint's
    * EXECUTOR-LOCAL blocks: they are not replicated, so losing an
    * executor after return FAILS downstream actions rather than
    * recomputing, and the blocks hold memory/disk until the session (or
    * a checkpoint GC) releases them. Fine for the intended
    * pipeline-step usage (consume the result promptly, same session);
    * for long-lived results across a flaky cluster, persist the OUTPUT
    * to storage and read that back instead of holding this frame. */
  def semDedupAssigned(assigned: DataFrame, threshold: Double = 0.95,
      id: String = "id", embCol: String = "embedding",
      maxClusterSize: Long = 10000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold out of (0, 1]")
    require(maxClusterSize >= 2, s"maxClusterSize $maxClusterSize must be >= 2")
    val base = assigned.select(col(id), col(embCol).as("_e"),
      col("cluster_id"), col("centroid_sim"))
    val wr = Window.partitionBy(col("cluster_id"))
      .orderBy(col("centroid_sim").asc, col(id))
    // materialize ONCE: ranked feeds both pair-join sides, the probe
    // and the final relabel — without the checkpoint the upstream
    // assignment fold + cluster window recompute 3-4× (measured 4× the
    // operator cost at 50×; the DedupClusters lineage convention)
    val ranked = base.withColumn("_rnk", row_number().over(wr))
      .localCheckpoint()
    // quadratic-straggler probe: one nlist-row driver aggregate,
    // fired BEFORE the quadratic join can execute
    val big = ranked.groupBy(col("cluster_id")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > maxClusterSize).limit(3).collect()
    require(big.isEmpty,
      s"cluster(s) ${big.map(r => s"${r.get(0)} (${r.get(1)} rows)").mkString(", ")} " +
        s"exceed maxClusterSize=$maxClusterSize — the within-cluster pair " +
        "search is quadratic per cluster; raise nlist (the paper's remedy) " +
        "or raise the cap if the task-level cost is truly acceptable")
    // upper-triangular pair search, keyed on the cluster
    val a = ranked.select(col(id).as("_aid"), col("_e").as("_ae"),
      col("cluster_id"), col("_rnk").as("_ar"))
    val b = ranked.select(col(id).as("_bid"), col("_e").as("_be"),
      col("cluster_id"), col("_rnk").as("_br"))
    val dupOf = a.join(b, Seq("cluster_id"))
      .filter(col("_br") < col("_ar") &&
        cosCol(col("_ae"), col("_be")) >= threshold)
      .groupBy(col("_aid"))
      .agg(min(struct(col("_br"), col("_bid"))).getField("_bid").as("dup_of"))
    ranked.join(dupOf, ranked(id) === dupOf("_aid"), "left")
      .select(ranked(id), col("cluster_id"), col("centroid_sim"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
  }
}
