package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.streaming.DataStreamWriter

/** Embedding-distribution drift monitoring — G22's scalar/categorical
  * family composed with the D-family clustering (r11 directive 5):
  * the LLM pipeline's most drift-prone asset is the embedding column
  * (an encoder refresh, a new document source, a language mix shift),
  * and D7's `rebuild` only notices it indirectly through IVF list
  * occupancy. This makes it a first-class, threshold-able signal.
  *
  * Method — the published "cluster-then-compare" recipe (the same
  * discretize-and-PSI move G22 makes on scalars, with a FROZEN
  * clustering as the discretizer):
  *
  *   1. Freeze a reference clustering: k-means centroids over the
  *      reference corpus (reuse [[IvfSearch.train]] — the SAME
  *      clustering an IVF index serves with, so the monitor watches
  *      exactly the structure the index relies on).
  *   2. [[profile]] both populations under those frozen centroids:
  *      per-list mass `n` and per-list MEAN VECTOR (one row-local
  *      assignment pass + one map-side-combinable groupBy; the
  *      profile is nlist-sized, never corpus-sized).
  *   3. [[drift]] aligns the two profiles full-outer (the
  *      categoricalDrift convention: an emptied or newly-hot list is
  *      mass evidence, never dropped) and adds `centroid_shift` =
  *      cosine distance between the two sides' per-list means —
  *      WITHIN-list movement that mass alone cannot see (a list whose
  *      members migrated to one edge keeps its count).
  *   4. [[driftScores]] folds to ONE row: the G22 mass scores
  *      (psi/kl/tvd/chi2 via [[DriftMonitor.driftSummary]] — shared
  *      definition, shared smoothing) plus `max_shift` and the
  *      mass-weighted `wmean_shift`. Conventional reading: mass PSI
  *      thresholds as in G22 (0.1 / 0.25); shifts are cosine
  *      distances in [0, 2].
  *
  * The reference profile is the FROZEN artifact (ModelStore `_meta`
  * convention, centroids + profile tables): re-deriving it per run
  * would erase the baseline the way re-derived histogram edges would
  * (the G22 freeze-the-edges rule). Streaming twin: list assignment
  * is a row-local literal fold (streaming-safe, no shuffle), so the
  * G23 categorical window machinery applies verbatim to `cluster_id`
  * — [[monitorStream]] is that composition, scoring each closed
  * window's list-mass mix against the frozen profile with the exact
  * batch comparator (per-window scores ≡ batch scores on the same
  * rows, the G23 parity contract).
  */
object EmbeddingDrift {

  private def cosDist(a: Column, b: Column): Column =
    lit(1.0) - VecDot.vecDot(a, b) /
      (VecDot.vecNorm(a) * VecDot.vecNorm(b))

  /** Per-list profile of one population under frozen `centroids`
    * ((list_id, centroid) — [[IvfSearch.train]] output): (cluster_id,
    * n, mean_emb). Lists nobody maps to are absent (mass 0 appears at
    * [[drift]] alignment). */
  def profile(vecs: DataFrame, centroids: DataFrame, id: String = "id",
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    ClusterOps.assignCentroids(vecs, centroids, id, embCol)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        Summarizer.mean(array_to_vector(col(embCol))).as("_mv"))
      .select(col("cluster_id"), col("n"),
        vector_to_array(col("_mv"), "float32").as("mean_emb"))
  }

  /** Aligned per-list comparison: (cluster_id, ref_n, cur_n,
    * centroid_shift) — full-outer on cluster_id, masses zero-filled,
    * shift NULL when either side has no members (no mean to compare;
    * the mass columns already carry that evidence). */
  def drift(refProfile: DataFrame, curProfile: DataFrame): DataFrame =
    refProfile.select(col("cluster_id"), col("n").as("ref_n"),
        col("mean_emb").as("_rm"))
      .join(curProfile.select(col("cluster_id"), col("n").as("cur_n"),
        col("mean_emb").as("_cm")), Seq("cluster_id"), "full_outer")
      .select(col("cluster_id"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"),
        when(col("_rm").isNotNull && col("_cm").isNotNull,
          cosDist(col("_rm"), col("_cm"))).as("centroid_shift"))

  /** One summary row over a [[drift]] frame: the G22 mass scores plus
    * max and mass-weighted-mean centroid shift (weights = current
    * mass — drift in a list nobody occupies anymore should not
    * dominate the score; its emptying already moved the mass terms). */
  def driftScores(driftFrame: DataFrame): DataFrame = {
    val mass = DriftMonitor.driftSummary(
      driftFrame.select("cluster_id", "ref_n", "cur_n"))
    val shift = driftFrame.agg(
      max("centroid_shift").as("max_shift"),
      (sum(col("centroid_shift") * col("cur_n")) /
        sum(when(col("centroid_shift").isNotNull, col("cur_n"))))
        .as("wmean_shift"))
    mass.join(broadcast(shift))
  }

  /** End-to-end batch form: freeze nothing, score `cur` against `ref`
    * under `centroids`. For a production baseline, [[saveReference]]
    * the profile once and compare every window against it. */
  def score(ref: DataFrame, cur: DataFrame, centroids: DataFrame,
      id: String = "id", embCol: String = "embedding"): DataFrame =
    driftScores(drift(profile(ref, centroids, id, embCol),
      profile(cur, centroids, id, embCol)))

  // ---- frozen-reference artifact (ModelStore `_meta` convention) -----------

  /** Persist the frozen reference: centroids + profile tables, meta
    * swap LAST (keep-two generations, lock-serialized). */
  def saveReference(spark: SparkSession, path: String,
      centroids: DataFrame, refProfile: DataFrame): Unit =
    ModelStore.withLock(spark, path, "embedding-drift reference") {
      val g = ModelStore.nextGen(spark, path)
      centroids.select(col("list_id").cast("int").as("list_id"),
          col("centroid"))
        .coalesce(1).write.mode("overwrite")
        .parquet(ModelStore.genDir(path, g, "centroids"))
      refProfile.select(col("cluster_id").cast("int").as("cluster_id"),
          col("n").cast("long").as("n"), col("mean_emb"))
        .coalesce(1).write.mode("overwrite")
        .parquet(ModelStore.genDir(path, g, "profile"))
      val nc = spark.read
        .parquet(ModelStore.genDir(path, g, "centroids")).count()
      val np = spark.read
        .parquet(ModelStore.genDir(path, g, "profile")).count()
      require(nc > 0 && np > 0 && np <= nc,
        s"reference must hold centroids >= profile rows > 0 (got $nc, $np)")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "embedding_drift_ref",
        "gen" -> g.toString, "nlist" -> nc.toString))
      ModelStore.pruneGens(spark, path, g)
    }

  /** Reopen the frozen reference: (centroids, profile), lazy over the
    * committed generation. */
  def loadReference(spark: SparkSession,
      path: String): (DataFrame, DataFrame) = {
    val kv = ModelStore.readMeta(spark, path, "embedding-drift reference")
    ModelStore.checkKind(kv, path, "embedding_drift_ref", "1")
    val g = kv("gen").toLong
    (spark.read.parquet(ModelStore.genDir(path, g, "centroids")),
      spark.read.parquet(ModelStore.genDir(path, g, "profile")))
  }

  // ---- streaming twin (the G23 window convention) ---------------------------

  /** Score each closed event-time window's list-mass mix against the
    * frozen reference profile — assignment is row-local, so the G23
    * categorical machinery applies verbatim; per-window rows are
    * (window_start, window_end, n_ref, n_cur, n_bins, psi, kl, tvd,
    * chi2), the shared comparator. Centroid-shift stays a batch-side
    * signal (a per-window mean needs the window's members; run
    * [[score]] over any window that fires the mass alarm). */
  def monitorStream(events: DataFrame, tsCol: String,
      centroids: DataFrame, refProfile: DataFrame,
      embCol: String = "embedding",
      windowDuration: String = "1 hour",
      delayThreshold: String = "10 minutes")(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    val assigned = ClusterOps.assignCentroids(events, centroids,
      id = tsCol, embCol = embCol)
    val refHist = refProfile
      .select(col("cluster_id").cast("string").as("category"), col("n"))
    graft.streaming.StreamingDriftMonitor.monitorCategorical(
      assigned, tsCol, "cluster_id", refHist,
      windowDuration, delayThreshold)(sink)
  }
}
