package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.graft.{PqFunctions, VecDot}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest-neighbor search — the memory-bounded form
  * of [[IvfSearch]] (SURVEY §2 D4 scale path): the inverted lists store
  * an m-byte product-quantization code per vector instead of the
  * 4·dim-byte float array, candidates are scored by table lookups
  * against a per-query ADC table, and only the top k·rerankFactor
  * shortlist touches real embeddings for an exact cosine re-rank.
  *
  * Memory bound per indexed vector: m bytes of code + the id — for
  * dim=64 float embeddings and the default m=16 that is 16 B vs 256 B,
  * a 16× compression of the candidate-scoring working set (the part of
  * the index that must be hot at query time; full vectors are only read
  * for the shortlist, an equi-join on neighbor_id). Defaults (m=16,
  * ksub=64, rerank 8×k) were measured on the synthetic near-uniform
  * embeddings — PQ's worst case, no cluster structure to exploit — and
  * hold recall exactly equal to the uncompressed IVF at the same nprobe
  * (IvfPqSpec); real embedding distributions quantize better.
  *
  * Training is bounded exactly like IVF's coarse quantizer: the m
  * sub-quantizers run Lloyd's iterations on a ≤ maxTrainRows sample
  * COLLECTED to the driver (the sample bound makes this O(maxTrainRows ·
  * ksub · dim) regardless of corpus size — same argument as the coarse
  * k-means sample), and the flat codebook (m·ksub·dsub floats, a few KB)
  * ships to executors as a literal inside the codegen'd
  * encode/tab/score expressions (PqFunctions.scala).
  */
object IvfPq {

  /** Flat PQ codebook laid out [(j·ksub + c)·dsub + t] — driver-side
    * Lloyd's per subspace over the sampled sub-vectors. Subspaces are
    * independent, so they train in parallel across driver cores. */
  private[operators] def trainCodebooks(sample: Array[Array[Float]], m: Int,
      ksub: Int, dsub: Int, seed: Long, iters: Int = 15): Array[Float] = {
    val flat = new Array[Float](m * ksub * dsub)
    java.util.stream.IntStream.range(0, m).parallel().forEach { j =>
      trainSubspace(sample, j, ksub, dsub, seed, iters, flat)
    }
    flat
  }

  // disjoint flat-array ranges per subspace -> safe to fill in parallel
  private def trainSubspace(sample: Array[Array[Float]], j: Int,
      ksub: Int, dsub: Int, seed: Long, iters: Int, flat: Array[Float]): Unit = {
    {
      val rnd = new scala.util.Random(seed + j)
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val centers = Array.tabulate(ksub)(_ =>
        subs(rnd.nextInt(subs.length)).map(_.toDouble))
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val cnts = new Array[Long](ksub)
        subs.foreach { s =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0
            var t = 0
            while (t < dsub) { val df = s(t) - centers(c)(t); d += df * df; t += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          cnts(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += s(t); t += 1 }
        }
        for (c <- 0 until ksub if cnts(c) > 0) {
          var t = 0
          while (t < dsub) { centers(c)(t) = sums(c)(t) / cnts(c); t += 1 }
        }
      }
      for (c <- 0 until ksub; t <- 0 until dsub)
        flat((j * ksub + c) * dsub + t) = centers(c)(t).toFloat
    }
  }

  /** (list_id, centroid float[], cnorm2) probe frame from a fitted
    * coarse quantizer — float centroids for the codegen'd dot, the
    * double-precision |c|² alongside (the two must travel together:
    * recomputing cnorm2 from the floats would shift probe ranking). */
  private[operators] def centroidsFrame(model: org.apache.spark.ml.clustering.KMeansModel,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) =>
        (i, c.toArray.map(_.toFloat), c.toArray.map(x => x * x).sum) }
      .toDF("list_id", "centroid", "cnorm2")
  }

  /** PQ training sample — capped at ~100 points per sub-centroid (the
    * standard PQ training budget): sub-quantizer centroids are dsub-dim,
    * they converge with orders of magnitude fewer samples than the
    * coarse quantizer, and Lloyd's cost is linear in the sample. */
  private[operators] def pqSample(vecs: DataFrame, n: Long, ksub: Int,
      maxTrainRows: Long, seed: Long): Array[Array[Float]] = {
    val pqTrainRows = math.min(maxTrainRows, 100L * ksub)
    (if (n > pqTrainRows)
        vecs.sample(withReplacement = false, pqTrainRows.toDouble / n, seed)
      else vecs)
      .select(col("embedding")).limit(pqTrainRows.toInt)
      .collect().map(_.getSeq[Float](0).toArray)
  }

  /** Coded corpus: coarse assignment (broadcast model, zero shuffle) +
    * m-byte codes — the only per-vector payload the probe join carries. */
  private[operators] def codedCorpus(vecs: DataFrame, id: String,
      model: org.apache.spark.ml.clustering.KMeansModel, cbLit: Column,
      m: Int, ksub: Int, saltFactor: Int): DataFrame =
    model.transform(
        vecs.withColumn("features", array_to_vector(col("embedding"))))
      .select(col(id).as("neighbor_id"),
        col("prediction").as("list_id"),
        PqFunctions.pqEncode(col("embedding"), cbLit, m, ksub).as("codes"),
        pmod(xxhash64(col(id)), lit(saltFactor)).cast("int").as("_salt"))

  /** Probe side: nprobe nearest lists per query + the per-query ADC
    * table. The query embedding is NOT carried — only the table — and
    * the shortlist shuffle carries just (query_id, neighbor_id, approx):
    * the wide payloads (tab ≈ m·ksub floats, eq) must never ride a
    * per-candidate shuffle. */
  private[operators] def probeSide(queries: DataFrame, id: String,
      centroidsDf: DataFrame, cbLit: Column, m: Int, ksub: Int,
      nprobe: Int, saltFactor: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("list_id"))
    queries
      .select(col(id).as("query_id"), col("embedding").as("eq"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("cscore",
        lit(2.0) * VecDot.vecDot(col("eq"), col("centroid")) - col("cnorm2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= nprobe)
      .select(col("query_id"),
        PqFunctions.pqTab(col("eq"), cbLit, m, ksub).as("tab"),
        col("list_id"),
        explode(sequence(lit(0), lit(saltFactor - 1))).as("_salt"))
  }

  /** Two-stage ranking over prepared frames: ADC shortlist of
    * k·rerankFactor, then exact cosine re-rank on the shortlist only —
    * embeddings re-attached by keyed equi-joins (no broadcast hint: the
    * query set grows with the workload, stats/AQE pick the strategy).
    * Shared verbatim by the transient [[ivfPqTopK]] and the persisted
    * [[IvfIndex]], so the two paths cannot diverge. */
  private[operators] def pqRank(probes: DataFrame, corpus: DataFrame,
      emb: DataFrame, qemb: DataFrame, k: Int, rerankFactor: Int): DataFrame = {
    // stage 1: ADC shortlist — m table lookups per candidate; tab is
    // projected away in the same stage, so the window shuffle moves
    // ~24 B/candidate
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val shortlist = probes.join(corpus, Seq("list_id", "_salt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        PqFunctions.pqAdc(col("codes"), col("tab")).as("approx"))
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= k * rerankFactor)
      .select("query_id", "neighbor_id")

    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist.join(emb, Seq("neighbor_id"))
      .join(qemb, Seq("query_id"))
      .withColumn("cos", VecDot.vecDot(col("eq"), col("ec")) /
        (VecDot.vecNorm(col("eq")) * VecDot.vecNorm(col("ec"))))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Approximate top-k neighbors via PQ-coded inverted lists.
    * nlist = 0 → auto (≈√corpus). Same probe structure as
    * [[IvfSearch.ivfTopK]] (salted equi-join, broadcast centroids);
    * the difference is what the lists hold (codes, not vectors) and a
    * two-stage ranking: ADC shortlist of k·rerankFactor, then exact
    * cosine on the shortlist only.
    *
    * This transient form retrains and re-encodes on every call — right
    * for one-shot analytics, wrong for serving. A serving user builds
    * the same artifacts ONCE with [[IvfIndex.build]] and amortizes them
    * across query batches ([[IvfIndex.load]]): IvfIndexSpec proves the
    * two return identical results at equal seed/params. */
  def ivfPqTopK(vecs: DataFrame, queries: DataFrame, id: String, k: Int,
      nlist: Int = 0, nprobe: Int = 4, m: Int = 16, ksub: Int = 64,
      rerankFactor: Int = 8, seed: Long = 42L,
      maxTrainRows: Long = 50000L, saltFactor: Int = 4): DataFrame = {
    val spark = vecs.sparkSession
    val n = vecs.count()
    val nl = if (nlist > 0) nlist else IvfSearch.defaultNlist(n)
    val model = IvfSearch.trainModel(vecs, n, nl, seed, maxTrainRows)
    val centroidsDf = centroidsFrame(model, spark)

    val sample = pqSample(vecs, n, ksub, maxTrainRows, seed)
    val dim = sample.head.length
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val cbLit: Column = lit(trainCodebooks(sample, m, ksub, dim / m, seed))

    val corpus = codedCorpus(vecs, id, model, cbLit, m, ksub, saltFactor)
    val probes = probeSide(queries, id, centroidsDf, cbLit, m, ksub, nprobe, saltFactor)
    val emb = vecs.select(col(id).as("neighbor_id"), col("embedding").as("ec"))
    val qemb = queries.select(col(id).as("query_id"), col("embedding").as("eq"))
    pqRank(probes, corpus, emb, qemb, k, rerankFactor)
  }
}
