package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * learned-partition alternative to hyperplane LSH (SURVEY §2 D4).
  *
  * Train: k-means over a bounded SAMPLE of the corpus (centroid quality
  * converges long before 100 TB of training rows; a capped sample keeps
  * training O(maxTrainRows·nlist) regardless of corpus size) with
  * `random` init — kmeans|| initialization costs more than the fit at
  * k ≈ √n and buys nothing for IVF partitioning. Index: corpus vectors
  * are assigned to their euclidean-nearest centroid via
  * KMeansModel.transform — a broadcast-model projection (BLAS in the
  * executor, no shuffle, corpus never replicated nlist×). Probe: each
  * query ranks centroids by the same euclidean metric (expanded as
  * |c|² − 2q·c, |q|² constant per query) and scores only vectors in its
  * `nprobe` nearest lists; final candidate ranking is exact cosine.
  * The probe equi-join keys on (list_id, salt): the salt splits hot
  * inverted lists across `saltFactor` buckets, so reduce parallelism is
  * nlist·saltFactor and a skewed list cannot pin one task. nlist
  * defaults to ≈√n (clamped [16, 4096]) so probe selectivity scales
  * with the corpus.
  */
object IvfSearch {
  /** nlist ≈ √n — the standard IVF sizing rule. */
  def defaultNlist(n: Long): Int =
    math.max(16, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  private[operators] def trainModel(vecs: DataFrame, n: Long, nlist: Int, seed: Long,
      maxTrainRows: Long): KMeansModel = {
    val sample = if (n > maxTrainRows)
      vecs.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
    else vecs
    new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setInitMode("random").setFeaturesCol("features")
      .fit(sample.select(array_to_vector(col("embedding")).as("features")))
  }

  /** centroids as (list_id, centroid array<float>), k-means fit on a
    * sample of at most `maxTrainRows` vectors. */
  def train(vecs: DataFrame, nlist: Int, seed: Long = 42L,
      maxTrainRows: Long = 50000L): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    trainModel(vecs, vecs.count(), nlist, seed, maxTrainRows)
      .clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("list_id", "centroid")
  }

  /** Approximate top-k neighbors via nprobe inverted lists.
    * nlist = 0 → auto (≈√corpus). */
  def ivfTopK(vecs: DataFrame, queries: DataFrame, id: String, k: Int,
      nlist: Int = 0, nprobe: Int = 4, seed: Long = 42L,
      maxTrainRows: Long = 50000L, saltFactor: Int = 4): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val n = vecs.count()
    val nl = if (nlist > 0) nlist else defaultNlist(n)
    val model = trainModel(vecs, n, nl, seed, maxTrainRows)
    // (list_id, centroid, |centroid|²) for probe-side ranking
    val centroidsDf = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) =>
        (i, c.toArray.map(_.toFloat), c.toArray.map(x => x * x).sum) }
      .toDF("list_id", "centroid", "cnorm2")
    // corpus side: broadcast-model projection, zero shuffle
    val corpus = model.transform(
        vecs.withColumn("features", array_to_vector(col("embedding"))))
      .select(col(id).as("neighbor_id"), col("embedding").as("ec"),
        col("prediction").as("list_id"),
        pmod(xxhash64(col(id)), lit(saltFactor)).cast("int").as("_salt"))
    // probe side: top-nprobe lists by the assignment metric (euclidean):
    // argmin |q−c|² = argmax 2q·c − |c|²
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("list_id"))
    val probes = queries
      .select(col(id).as("query_id"), col("embedding").as("eq"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("cscore",
        lit(2.0) * VecDot.vecDot(col("eq"), col("centroid")) - col("cnorm2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= nprobe)
      .select(col("query_id"), col("eq"), col("list_id"),
        explode(sequence(lit(0), lit(saltFactor - 1))).as("_salt"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(corpus, Seq("list_id", "_salt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VecDot.vecDot(col("eq"), col("ec")) /
        (VecDot.vecNorm(col("eq")) * VecDot.vecNorm(col("ec"))))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
