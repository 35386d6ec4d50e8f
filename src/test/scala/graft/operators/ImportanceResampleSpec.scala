package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** DSIR importance weights must equal the prior-free smoothed
  * log-likelihood ratio computed independently from the model frame
  * (same hashed features, same fold order), target-like documents must
  * out-weigh raw-like ones, and the Gumbel top-k resample must be the
  * exact deterministic selection a single-node md5+Gumbel reference
  * produces — on any layout, rotating with the seed.
  */
class ImportanceResampleSpec extends SparkSpec {
  import spark.implicits._

  private val S = NgramLm.Sep
  private val Dim = 1 << 14
  private val Order = 2
  private val Alpha = 1.0

  /** Real docs as the target; the same corpus word-mangled (disjoint
    * vocabulary) as the raw side — the QualityClassifierSpec
    * construction, reused because the testdata's columns carry no
    * textual signal of their own. */
  private lazy val target = Tables.documents(spark, sf)
    .filter(col("doc_id") < 150).select("doc_id", "text").cache()
  private lazy val raw = Tables.documents(spark, sf)
    .filter(col("doc_id") >= 150 && col("doc_id") < 300)
    .select(col("doc_id"),
      expr("array_join(transform(filter(split(text, ' '), " +
        "w -> length(w) > 0), w -> concat(w, 'q')), ' ')").as("text"))
    .cache()

  private def refWords(t: String): Vector[String] =
    t.split(" ").filter(_.nonEmpty).toVector

  private def refGrams(w: Vector[String]): Vector[(Long, Int, String)] =
    (for {
      n <- 1 to Order
      p <- (n - 1) until w.length
    } yield (p.toLong * (Order + 1) + n, n,
      w.slice(p - n + 1, p + 1).mkString(S))).toVector

  /** Feature ids through the operator's own hash expression (the
    * QualityClassifierSpec convention: the mapping is shared, the
    * weight arithmetic below is independent). */
  private def featureMap(grams: Seq[(Int, String)]): Map[(Int, String), Long] = {
    if (grams.isEmpty) return Map.empty
    spark.createDataFrame(grams.distinct).toDF("n", "gram")
      .select(col("n"), col("gram"),
        pmod(xxhash64(col("n").cast("int"), col("gram")), lit(Dim.toLong))
          .as("f"))
      .as[(Int, String, Long)].collect()
      .map { case (n, g, f) => (n, g) -> f }.toMap
  }

  test("log_weight equals the prior-free smoothed likelihood ratio, computed independently from the model frame") {
    val model = ImportanceResample.train(target, raw, dim = Dim,
      order = Order).cache()
    val cnt = model.filter(col("feature") >= 0)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val Seq((tp, tn)) = model.filter(col("feature") === -1L)
      .select(col("cnt_pos"), col("cnt_neg")).as[(Long, Long)].collect().toSeq
    val logDenP = math.log(tp.toDouble + Alpha * Dim)
    val logDenN = math.log(tn.toDouble + Alpha * Dim)

    // weigh a mixed evaluation corpus: some target-like, some raw-like
    val eval = target.filter(col("doc_id") < 40).unionByName(
      raw.filter(col("doc_id") < 190)
        .select((col("doc_id") + 1000L).as("doc_id"), col("text"))).cache()
    val texts = eval.as[(Long, String)].collect().toMap
    val fm = featureMap(texts.values.toSeq
      .flatMap(t => refGrams(refWords(t)).map(g => (g._2, g._3))).distinct)
    val expect = texts.flatMap { case (id, t) =>
      val w = refWords(t)
      if (w.isEmpty) None else {
        var sp = 0.0; var sn = 0.0
        val grams = refGrams(w)
        grams.sortBy(_._1).foreach { case (_, n, g) =>
          cnt.get(fm((n, g))).foreach { case (a, b) =>
            sp += math.log(a.toDouble + Alpha)
            sn += math.log(b.toDouble + Alpha)
          }
        }
        Some(id -> ((grams.length.toLong,
          (sp - sn) + grams.length.toDouble * (logDenN - logDenP))))
      }
    }
    val got = ImportanceResample.logWeights(eval, model)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, (ng, lw)) =>
      assert(got(id)._1 === ng, s"n_grams of $id")
      assert(math.abs(got(id)._2 - lw) < 1e-9, s"log_weight of $id")
    }
    // the DSIR direction property on the constructed contrast: every
    // target-like doc out-weighs every raw-like doc
    val (tWs, rWs) = got.partition(_._1 < 1000L)
    assert(tWs.values.map(_._2).min > rWs.values.map(_._2).max,
      "target-like documents must out-weigh raw-like ones")
  }

  test("resample is the exact md5+Gumbel top-k, layout-invariant, seed-rotating; empty docs never weigh") {
    val model = ImportanceResample.train(target, raw, dim = Dim,
      order = Order).cache()
    val eval = target.filter(col("doc_id") < 30).unionByName(
        raw.filter(col("doc_id") < 185)
          .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
      .unionByName(Seq((5000L, ""), (5001L, "   ")).toDF("doc_id", "text"))
      .cache()

    def refKey(id: Long, lw: Double, seed: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$id:$seed".getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      val u = (v.toDouble + 0.5) / 4294967296.0
      lw + (-math.log(-math.log(u)))
    }
    val lws = ImportanceResample.logWeights(eval, model)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!lws.contains(5000L) && !lws.contains(5001L),
      "empty/whitespace docs carry no features and must not weigh")

    val k = 10
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      ImportanceResample.resample(d, model, k, seed = seed)
        .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4)
    val sel0 = run(eval, 0L)
    val expect0 = lws.map { case (id, lw) => id -> refKey(id, lw, 0L) }
      .toSeq.sortBy { case (id, key) => (-key, id) }.take(k)
    assert(sel0.map(_._1).toSeq === expect0.map(_._1),
      "selection must match the single-node Gumbel top-k")
    sel0.zip(expect0).foreach { case ((_, gk), (_, ek)) =>
      assert(math.abs(gk - ek) < 1e-9) }
    assert(run(eval.repartition(7), 0L).toSeq === sel0.toSeq,
      "layout invariance")
    val sel1 = run(eval, 1L)
    assert((sel1.map(_._1).toSet != sel0.map(_._1).toSet) ||
      (sel1.map(_._2).toSeq != sel0.map(_._2).toSeq),
      "a fresh seed must re-draw the noise")
    // k past the population returns every weighable doc
    assert(run(eval, 0L).length === sel0.length)
    val all = ImportanceResample.resample(eval, model, 100000, seed = 0L)
    assert(all.count() === lws.size.toLong)
    intercept[IllegalArgumentException] {
      ImportanceResample.resample(eval, model, 0)
    }
  }

  test("resampleThreshold selects exactly resample's set without a k-row merge") {
    val model = ImportanceResample.train(target, raw, dim = Dim,
      order = Order).cache()
    val eval = target.select("doc_id", "text").unionByName(
        raw.select((col("doc_id") + 1000L).as("doc_id"), col("text")))
      .cache()
    def sel(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Double)].collect()
        .map(r => (r._1, r._4)).sortBy(_._1).toSeq
    // a wide relErr forces a real band (the boundary top-k does work);
    // the selection must still be IDENTICAL to the exact top-k
    for (k <- Seq(5, 60, 250)) {
      val exact = sel(ImportanceResample.resample(eval, model, k))
      val thr = sel(ImportanceResample.resampleThreshold(eval, model, k,
        relErr = 0.05))
      assert(thr === exact, s"k=$k: threshold selection must equal resample")
      val tight = sel(ImportanceResample.resampleThreshold(eval, model, k,
        relErr = 1e-4))
      assert(tight === exact, s"k=$k: tight-relErr parity")
    }
    // k >= n returns every weighable doc, matching resample
    val n = ImportanceResample.logWeights(eval, model).count().toInt
    assert(sel(ImportanceResample.resampleThreshold(eval, model, n + 10)) ===
      sel(ImportanceResample.resample(eval, model, n + 10)))
    intercept[IllegalArgumentException] {
      ImportanceResample.resampleThreshold(eval, model, 10, relErr = 0.5)
    }
  }
}
