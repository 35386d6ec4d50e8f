package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * learned-partition alternative to hyperplane LSH (SURVEY §2 D4).
  *
  * Train: k-means over (a sample of) the corpus → `nlist` centroids
  * (seeded, deterministic). Index: each vector assigned to its nearest
  * centroid — an equi-partitioned inverted list. Probe: each query
  * scores only vectors in its `nprobe` nearest lists. The probe join is
  * a plain equi-join on the list id, so the corpus side streams and the
  * (tiny) query→list relation broadcasts; per-query work drops from
  * O(n) to O(n·nprobe/nlist) with recall controlled by nprobe.
  */
object IvfSearch {
  /** centroids as (list_id, centroid array<float>) */
  def train(vecs: DataFrame, nlist: Int, seed: Long = 42L): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features")
    val model = km.fit(vecs.select(array_to_vector(col("embedding")).as("features")))
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("list_id", "centroid")
  }

  private def nearestLists(vecs: DataFrame, centroids: DataFrame, id: String,
      nprobe: Int): DataFrame = {
    // cosine against every centroid (nlist is small → broadcast), keep top nprobe
    val w = Window.partitionBy(col(id)).orderBy(col("cdist").desc, col("list_id"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("cdist", VecDot.vecDot(col("embedding"), col("centroid")) /
        (VecDot.vecNorm(col("embedding")) * VecDot.vecNorm(col("centroid"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= nprobe)
      .select(col(id), col("list_id"))
  }

  /** Approximate top-k neighbors via nprobe inverted lists. */
  def ivfTopK(vecs: DataFrame, queries: DataFrame, id: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val centroids = train(vecs, nlist, seed).cache()
    val corpus = nearestLists(vecs, centroids, id, 1)
      .join(vecs, Seq(id))
      .select(col(id).as("neighbor_id"), col("embedding").as("ec"), col("list_id"))
    val probes = nearestLists(queries, centroids, id, nprobe)
      .join(queries, Seq(id))
      .select(col(id).as("query_id"), col("embedding").as("eq"), col("list_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(corpus, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VecDot.vecDot(col("eq"), col("ec")) /
        (VecDot.vecNorm(col("eq")) * VecDot.vecNorm(col("ec"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
