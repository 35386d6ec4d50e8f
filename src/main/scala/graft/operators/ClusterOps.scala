package graft.operators

import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D12: cluster-level corpus shaping — the selection tier that runs ON
  * TOP of a clustering, completing the D4 recipe (Tirumala et al. 2023,
  * "D4: Improving LLM Pretraining via Document De-Duplication and
  * Diversification": SemDeDup inside clusters, then prune the most
  * PROTOTYPICAL examples — the ones nearest their centroid — because
  * after near-dups are gone, redundancy lives in the dense cluster
  * core, and dropping it buys diversity at equal token budget).
  *
  * Three operators over one shared frame shape — (id, cluster_id,
  * centroid_sim), the [[SemDedup.semDedupAssigned]] contract:
  *
  *   - [[assignCentroids]]: nearest-centroid assignment as a ROW-LOCAL
  *     argmax fold over the literal centroid array (factored OUT of
  *     SemDedup so assignment exists exactly once — one definition for
  *     dedup, pruning, and sampling; ≤ 8192 centroids, the
  *     literal-plan regime, loud guard past it).
  *   - [[prototypePrune]]: the D4 pruning rule — per cluster of size n,
  *     drop the floor(dropFrac·n) rows with the HIGHEST centroid
  *     cosine (ties to the lower id dropped first, pinned); every row
  *     comes back labeled (`keep`), survivors are never rewritten.
  *   - [[balancedSample]]: cluster-balanced selection (per-cluster
  *     quota) by the repo's md5 sampling convention — the key is
  *     md5(id:seed), engine-independent and growth-stable (a doc's
  *     draw never depends on corpus size — the Splits argument), so
  *     DuckDB can re-derive the exact selection (gated below).
  *
  * Scale shape: assignment is row-local (zero exchange); the two rules
  * are ONE window each, partitioned BY CLUSTER (never global; rank and
  * count share the partition, so one shuffle serves both). Cluster
  * sizes are k-means-bounded ≈ n/nlist; pathological skew is the
  * upstream clustering's problem and fails loudly THERE
  * (SemDedup.maxClusterSize) — these operators inherit bounded
  * partitions by contract, documented rather than re-probed.
  *
  * [[d4Select]] is the paper's composition: semantic dedup first
  * (within-cluster near-dups carry no diversity), prototype pruning
  * over the SURVIVORS only (pruning before dedup would let a
  * duplicate pair shield each other from the drop quota).
  */
object ClusterOps {

  private def cosCol(a: Column, b: Column): Column =
    VecDot.vecDot(a, b) / (VecDot.vecNorm(a) * VecDot.vecNorm(b))

  /** Assign every vector to its euclidean-nearest centroid (expanded
    * argmax 2e·c − |c|²; first max wins, so ties break to the lower
    * list_id — deterministic, layout-free) with a row-local fold over
    * the literal centroid array. `centroids` must be (list_id,
    * centroid) with distinct ids, at most 8192 rows (the literal-plan
    * regime; past that, assign via the broadcast k-means model —
    * the IvfSearch corpus side). Output: (id, embCol, cluster_id,
    * centroid_sim). The driver fetch is limit-bounded so a
    * mistakenly corpus-sized frame fails the guard, not the heap. */
  def assignCentroids(vecs: DataFrame, centroids: DataFrame,
      id: String = "id", embCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col("list_id").cast("int"), col("centroid"))
      .limit(8193).collect()
      .map { r =>
        val ce = r.getSeq[Float](1)
        var n2 = 0.0
        ce.foreach(x => n2 += x.toDouble * x.toDouble)
        (r.getInt(0), ce, n2)
      }
      .sortBy(_._1).toSeq
    require(cents.nonEmpty, "centroids frame is empty")
    require(cents.size <= 8192,
      "more than 8192 centroids exceed the literal-assignment regime " +
        "— assign clusters with the broadcast k-means model " +
        "(KMeansModel.transform, the IvfSearch corpus side)")
    require(cents.map(_._1).distinct.size == cents.size,
      "duplicate list_id in centroids frame")
    val centArr = typedLit(cents)
    val scores = transform(centArr, c =>
      lit(2.0) * VecDot.vecDot(col("_e"), c.getField("_2")) -
        c.getField("_3"))
    val chosen = element_at(centArr,
      array_position(scores, array_max(scores)).cast("int"))
    vecs.select(col(id), col(embCol).as("_e"))
      .withColumn("_ch", chosen)
      .select(col(id), col("_e").as(embCol),
        col("_ch").getField("_1").as("cluster_id"),
        cosCol(col("_e"), col("_ch").getField("_2")).as("centroid_sim"))
  }

  /** D4 prototype pruning over a pre-assigned frame — (id, cluster_id,
    * centroid_sim) at minimum; extra columns ride through. Per cluster
    * of size n, the floor(dropFrac·n) rows with the highest
    * centroid_sim are dropped (rank by centroid_sim DESC, ties to the
    * lower id dropped first — pinned); every input row returns with
    * `keep`. dropFrac 0 keeps everything; a NULL centroid_sim row
    * FAILS CLOSED (keep = false — an unscorable row never survives a
    * diversity filter by accident, the E30 null convention). */
  def prototypePrune(assigned: DataFrame, dropFrac: Double,
      id: String = "id", clusterCol: String = "cluster_id",
      simCol: String = "centroid_sim"): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac $dropFrac out of [0, 1)")
    // NULLS FIRST under desc ordering would rank unscorable rows as
    // most prototypical and silently eat the drop quota; route them
    // out of the ranking instead and fail them closed at the end
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(simCol).desc_nulls_last, col(id))
    val wc = Window.partitionBy(col(clusterCol))
    assigned
      .withColumn("_rnk", row_number().over(w))
      .withColumn("_n", count(when(col(simCol).isNotNull, 1)).over(wc))
      .withColumn("keep",
        col(simCol).isNotNull &&
          col("_rnk") > floor(lit(dropFrac) * col("_n")))
      .drop("_rnk", "_n")
  }

  /** Cluster-balanced sample: up to `perCluster` rows from every
    * cluster, drawn by the md5 sampling key (rank by md5(id:seed),
    * ties impossible for distinct ids; a cluster smaller than the
    * quota keeps all members). Deterministic, engine-independent,
    * growth-stable: a row's key never changes as the corpus grows, so
    * re-running on an extended corpus only ever SWAPS quota slots,
    * never reshuffles the draw order. Output: every row + `keep`. */
  def balancedSample(assigned: DataFrame, perCluster: Int,
      id: String = "id", clusterCol: String = "cluster_id",
      seed: Long = 42L): DataFrame = {
    require(perCluster > 0, s"perCluster $perCluster must be positive")
    val key = md5(concat(col(id).cast("string"), lit(":" + seed)))
    val w = Window.partitionBy(col(clusterCol)).orderBy(key, col(id))
    assigned
      .withColumn("_rnk", row_number().over(w))
      .withColumn("keep", col("_rnk") <= perCluster)
      .drop("_rnk")
  }

  /** The D4 composition: [[SemDedup.semDedupAssigned]] inside clusters,
    * then [[prototypePrune]] over the dedup SURVIVORS (a pruned-then-
    * deduped order would let duplicate pairs shield each other from
    * the drop quota). Output: one row per input — (id, cluster_id,
    * centroid_sim, keep_dedup, keep_proto, keep) with keep the
    * conjunction; dropped-at-dedup rows carry keep_proto = false (they
    * never reached the pruning round — fail closed, not null). */
  def d4Select(assigned: DataFrame, threshold: Double = 0.95,
      dropFrac: Double = 0.2, id: String = "id",
      embCol: String = "embedding",
      maxClusterSize: Long = 10000L): DataFrame = {
    val deduped = SemDedup.semDedupAssigned(
        assigned, threshold, id, embCol, maxClusterSize)
      .withColumnRenamed("keep", "keep_dedup")
    val survivors = deduped.filter(col("keep_dedup"))
      .select(col(id), col("cluster_id"), col("centroid_sim"))
    val pruned = prototypePrune(survivors, dropFrac, id)
      .select(col(id), col("keep").as("keep_proto"))
    deduped.join(pruned, Seq(id), "left")
      .withColumn("keep_proto", coalesce(col("keep_proto"), lit(false)))
      .withColumn("keep", col("keep_dedup") && col("keep_proto"))
      .select(col(id), col("cluster_id"), col("centroid_sim"),
        col("keep_dedup"), col("keep_proto"), col("keep"))
  }

  // ---- gated harness entries ----------------------------------------------

  /** Gated entry (`cluster_sample`): the balanced-sampling rule against
    * ground truth. Real k-means clusters are float-born and not
    * cross-engine reproducible, so the gate derives an integer
    * clustering (doc_id mod 37 — the perp_buckets precedent: derive
    * the GROUPING, gate the RULE) and draws 5 per cluster; DuckDB
    * re-derives the same md5 keys and quota with its own row_number,
    * confirming key construction, rank order, and the
    * smaller-than-quota cluster case independently. Kept rows only —
    * the selection IS the output under test. */
  def clusterSample(spark: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), (col("doc_id") % 37).as("cluster_id"))
    balancedSample(docs, perCluster = 5, id = "doc_id", seed = 42L)
      .filter(col("keep"))
      .select(col("doc_id"), col("cluster_id"))
  }

  val clusterSampleSql: String =
    """SELECT doc_id, cluster_id FROM (
      |  SELECT doc_id, doc_id % 37 AS cluster_id,
      |    row_number() OVER (PARTITION BY doc_id % 37
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) AS rnk
      |  FROM documents)
      |WHERE rnk <= 5""".stripMargin

  /** Gated entry (`proto_prune`): the D4 pruning arithmetic against
    * ground truth — derived integer clustering (doc_id mod 37) and a
    * derived integer prototypicality score ((doc_id · 2654435761) mod
    * 97: multiplicative-hash spread, mod 97 forces in-cluster TIES so
    * the lower-id-drops-first rule is exercised, not just stated), drop
    * fraction 0.25 — an exact binary double, so floor(dropFrac·n) is
    * exact integer arithmetic in both engines (the perp_buckets
    * binary-fraction convention; 0.3·n would ride on both engines
    * sharing IEEE rounding, true but weaker). DuckDB re-derives rank,
    * per-cluster count and the floor cut independently. */
  def protoPrune(spark: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), (col("doc_id") % 37).as("cluster_id"),
        ((col("doc_id") * 2654435761L) % 97).cast("double")
          .as("centroid_sim"))
    prototypePrune(docs, dropFrac = 0.25, id = "doc_id")
      .select(col("doc_id"), col("cluster_id"),
        col("centroid_sim").cast("long").as("sim"), col("keep"))
  }

  val protoPruneSql: String =
    """SELECT doc_id, cluster_id, sim,
      |  rnk > floor(0.25 * n) AS keep
      |FROM (
      |  SELECT doc_id, doc_id % 37 AS cluster_id,
      |    (doc_id * 2654435761) % 97 AS sim,
      |    row_number() OVER (PARTITION BY doc_id % 37
      |      ORDER BY (doc_id * 2654435761) % 97 DESC, doc_id) AS rnk,
      |    count(*) OVER (PARTITION BY doc_id % 37) AS n
      |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_sample" -> clusterSample _,
    "proto_prune" -> protoPrune _)

  val oracles: Map[String, String] = Map(
    "cluster_sample" -> clusterSampleSql,
    "proto_prune" -> protoPruneSql)
}
