package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E39: similarity-ordered packing — In-Context Pretraining (Shi et
  * al. 2023, "In-Context Pretraining: Language Modeling Beyond
  * Document Boundaries"). Standard packing (E17/E22/E25) concatenates
  * RANDOM documents into a context window, so most of the window is
  * irrelevant to any given token; ICLM orders the corpus so ADJACENT
  * documents are semantically related (the paper's greedy
  * nearest-neighbor path over a retrieval graph), which measurably
  * improves long-context use. This operator produces that ordering as
  * a sortable key; the existing pack/export tiers consume it by
  * sorting (ctx_order is dense and monotone, so
  * `orderBy("ctx_order")` → [[PackWhole.packSequencesWhole]] /
  * [[TrainingExport]] is the whole composition).
  *
  * Scale shape — the SemDedup decomposition, not the paper's global
  * graph: a corpus-wide nearest-neighbor path needs a global kNN
  * graph (the paper runs dedicated retrieval infrastructure); HERE the
  * corpus is k-means-clustered (D4/D9's bounded-centroid machinery,
  * one definition: [[ClusterOps.assignCentroids]]) and the greedy
  * path runs row-locally WITHIN each cluster — clusters are the
  * coarse neighborhoods, the in-cluster path is the fine ordering.
  * Cross-cluster adjacency (one boundary pair per cluster) is
  * second-order; the cluster sequence itself is still
  * similarity-chained: a driver-side greedy path over the ≤ 8192
  * centroids orders the clusters, so consecutive clusters are near
  * too.
  *
  * The in-cluster path is a deliberate row-local loop (one
  * `collect_list` per cluster, one UDF computing the O(k²) greedy
  * chain, k ≤ maxClusterSize): a sequential argmax chain is
  * inherently iterative — no join/window composition expresses "next
  * = nearest UNVISITED" — and cluster-bounding makes the quadratic a
  * constant-sized task, the same economics as semDedupAssigned's
  * bounded pair join. An oversized cluster FAILS LOUDLY with the
  * remedy (raise nlist), never silently truncates.
  *
  * Determinism (layout-free, spec-matchable): the chain starts at the
  * highest centroid_sim (tie → lower id) and every step takes the
  * max-cosine unvisited doc (tie → lower id); the cluster chain
  * starts at list_id 0. Output: one row per input doc — (id,
  * cluster_rank, ctx_pos, ctx_order) with ctx_order globally
  * monotone in (cluster_rank, ctx_pos).
  */
object ContextOrder {

  /** Train centroids (the D9 trainer — bounded sample k-means) and
    * order with them. `nlist` 0 → ≈√n. */
  def order(vecs: DataFrame, nlist: Int = 0, id: String = "id",
      embCol: String = "embedding", seed: Long = 42L,
      maxTrainRows: Long = 50000L,
      maxClusterSize: Int = 4096): DataFrame = {
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
    orderWithCentroids(vecs, centroids, id, embCol, maxClusterSize)
  }

  /** The rule core given centroids — (list_id, centroid), ≤ 8192,
    * distinct (the assignCentroids contract). */
  def orderWithCentroids(vecs: DataFrame, centroids: DataFrame,
      id: String = "id", embCol: String = "embedding",
      maxClusterSize: Int = 4096): DataFrame = {
    require(maxClusterSize > 0, "maxClusterSize must be positive")
    val spark = vecs.sparkSession

    // cluster sequence: greedy cosine chain over the centroids,
    // driver-side (bounded by the 8192-centroid regime)
    val cents = centroids.select(col("list_id").cast("int"), col("centroid"))
      .limit(8193).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    require(cents.length <= 8192, "more than 8192 centroids — the " +
      "bounded-centroid regime (ClusterOps.assignCentroids contract)")
    val rankOf = chainRanks(cents.sortBy(_._1))
    val rankDf = spark.createDataFrame(rankOf.toSeq)
      .toDF("cluster_id", "cluster_rank")

    // a null embedding assigns to a null cluster (the argmax fold
    // propagates null) and would NPE inside the path UDF with an
    // opaque message — fail loudly at the seam instead, on the column
    // the path consumes
    val assigned = ClusterOps.assignCentroids(vecs, centroids, id, embCol)
      .withColumn("cluster_id",
        when(col("cluster_id").isNull, raise_error(concat(
          lit("ContextOrder: null embedding for "), lit(id), lit("="),
          col(id).cast("string"),
          lit(" — an unordered doc cannot ride a similarity chain; " +
            "filter or impute upstream"))))
          .otherwise(col("cluster_id")))

    // loud cluster-size guard ON the grouped flow (the G27 lesson: a
    // side-column guard can be pruned; this one gates the same
    // aggregate the path consumes)
    val grouped = assigned
      .groupBy("cluster_id")
      .agg(collect_list(struct(col(id).as("_id"), col(embCol).as("_e"),
        col("centroid_sim").as("_cs"))).as("docs"))
      .withColumn("docs", when(size(col("docs")) > maxClusterSize,
        raise_error(concat(lit("ContextOrder: cluster "), col("cluster_id"),
          lit(s" exceeds maxClusterSize=$maxClusterSize (size="),
          size(col("docs")),
          lit(") — raise nlist so clusters shrink, or raise the cap if " +
            "the quadratic task is really affordable"))))
        .otherwise(col("docs")))

    val pathUdf = udf { docs: Seq[org.apache.spark.sql.Row] =>
      greedyPath(docs.map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getDouble(2))))
    }

    grouped
      .join(broadcast(rankDf), Seq("cluster_id"))
      .select(col("cluster_id"), col("cluster_rank"),
        posexplode(pathUdf(col("docs"))).as(Seq("ctx_pos", id)))
      .withColumn("ctx_order",
        col("cluster_rank").cast("long") * (maxClusterSize + 1L) +
          col("ctx_pos"))
      .select(col(id), col("cluster_rank"), col("ctx_pos"), col("ctx_order"))
  }

  /** Greedy nearest-unvisited chain over one cluster's docs. Start:
    * max centroid_sim, tie → lower id; step: max cosine to the
    * current doc, tie → lower id. Returns ids in visit order. */
  private def greedyPath(docs: Seq[(Long, Array[Float], Double)]): Seq[Long] = {
    val k = docs.size
    if (k == 0) return Seq.empty
    val arr = docs.toArray
    val norms = arr.map { case (_, e, _) =>
      var s = 0.0; var i = 0
      while (i < e.length) { s += e(i).toDouble * e(i); i += 1 }
      math.sqrt(s)
    }
    def cos(a: Int, b: Int): Double = {
      val ea = arr(a)._2; val eb = arr(b)._2
      var s = 0.0; var i = 0
      while (i < ea.length) { s += ea(i).toDouble * eb(i); i += 1 }
      val d = norms(a) * norms(b)
      if (d == 0.0) 0.0 else s / d
    }
    val visited = new Array[Boolean](k)
    val out = new Array[Long](k)
    var cur = 0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < k) { // start: max centroid_sim, tie -> lower id
      val c = arr(i)._3
      if (c > best || (c == best && arr(i)._1 < arr(cur)._1)) {
        best = c; cur = i }
      i += 1
    }
    var step = 0
    while (step < k) {
      visited(cur) = true
      out(step) = arr(cur)._1
      step += 1
      if (step < k) {
        var nxt = -1
        var bs = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          if (!visited(j)) {
            val c = cos(cur, j)
            if (c > bs || (c == bs && (nxt < 0 || arr(j)._1 < arr(nxt)._1))) {
              bs = c; nxt = j }
          }
          j += 1
        }
        cur = nxt
      }
    }
    out.toSeq
  }

  /** Driver-side greedy chain over centroids → cluster_id →
    * cluster_rank. Start at list_id 0 (centroid ids are already an
    * arbitrary k-means enumeration; any fixed start is equally
    * arbitrary and this one is deterministic). */
  private def chainRanks(cents: Array[(Int, Array[Float])]): Map[Int, Int] = {
    val k = cents.length
    val norms = cents.map { case (_, e) =>
      var s = 0.0; var i = 0
      while (i < e.length) { s += e(i).toDouble * e(i); i += 1 }
      math.sqrt(s)
    }
    def cos(a: Int, b: Int): Double = {
      val ea = cents(a)._2; val eb = cents(b)._2
      var s = 0.0; var i = 0
      while (i < ea.length) { s += ea(i).toDouble * eb(i); i += 1 }
      val d = norms(a) * norms(b)
      if (d == 0.0) 0.0 else s / d
    }
    val visited = new Array[Boolean](k)
    val out = scala.collection.mutable.Map[Int, Int]()
    var cur = 0
    var step = 0
    while (step < k) {
      visited(cur) = true
      out(cents(cur)._1) = step
      step += 1
      if (step < k) {
        var nxt = -1
        var bs = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          if (!visited(j)) {
            val c = cos(cur, j)
            if (c > bs || (c == bs &&
              (nxt < 0 || cents(j)._1 < cents(nxt)._1))) {
              bs = c; nxt = j }
          }
          j += 1
        }
        cur = nxt
      }
    }
    out.toMap
  }
}
