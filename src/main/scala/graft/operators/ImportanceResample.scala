package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by IMPORTANCE RESAMPLING — the DSIR recipe (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): instead of thresholding a quality score (E24's
  * Pareto rule), estimate how much each raw document looks like the
  * TARGET distribution versus the RAW distribution over hashed n-gram
  * features, and draw the training subset ∝ that importance weight —
  * selection matches the target in distribution rather than clipping
  * at a boundary. The log importance weight of a document under two
  * smoothed bag-of-hashed-ngrams models is
  * `Σ_f c_f (log p̂_target(f) − log p̂_raw(f))` — algebraically the E24
  * multinomial-NB log-likelihood ratio WITHOUT the class prior, so the
  * estimator here IS [[QualityClassifier]]'s counting pass and scoring
  * fold (one corpus pass to fit, one model join + per-doc bounded fold
  * to weigh — every scale/determinism property documented there
  * carries over verbatim, including the ModelStore artifact).
  *
  * Sampling without replacement ∝ weight is the Gumbel top-k trick
  * (Vieira 2014): rank by `log w_i + G_i` with G_i standard Gumbel
  * noise and take the top k. The noise is DERIVED, not drawn —
  * G = −log(−log u) with u the E9/E15 md5-bucket uniform on
  * (id, seed) — so a selection is reproducible across runs, layouts
  * and engines (the paretoKeep determinism convention), and the top-k
  * is a per-partition TakeOrdered merge, never a global sort.
  */
object ImportanceResample {

  /** Fit the target-vs-raw contrast model: one labeled counting pass
    * over the union (label = comes-from-target). The result is a
    * standard E24 model frame — persist it with
    * [[QualityClassifier.save]], reload with load. Both corpora must
    * be non-empty (train's one-class guard). A bounded SAMPLE of the
    * raw corpus estimates p̂_raw just as well when the raw side is the
    * full 100 TB crawl — pass the sample, not the crawl. */
  def train(target: DataFrame, raw: DataFrame, textCol: String = "text",
      dim: Int = 1 << 18, order: Int = 2, minCount: Long = 1L): DataFrame =
    QualityClassifier.train(
      target.select(col(textCol).as("text"), lit(true).as("label"))
        .unionByName(
          raw.select(col(textCol).as("text"), lit(false).as("label"))),
      labelCol = "label", textCol = "text", dim = dim, order = order,
      minCount = minCount)

  /** Per-document log importance weight: (idCol, n_grams, log_weight)
    * with `log_weight = log_odds − log prior` — the DSIR estimator.
    * Empty/whitespace-only documents carry no features and do not
    * appear (the E23/E24 convention). All scoring knobs are E24's
    * (`alpha` smoothing, `broadcastModel`, the `maxDocTokens`
    * fail-loud probe). */
  def logWeights(docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 1.0, broadcastModel: Boolean = true,
      maxDocTokens: Long = 200000L): DataFrame = {
    val prior = model.filter(col("feature") === -2L)
      .select(col("cnt_pos").cast("long"), col("cnt_neg").cast("long"))
      .collect()
    require(prior.length == 1,
      "model frame lacks the reserved document-count row (feature −2) — " +
        "was it produced by ImportanceResample.train / QualityClassifier.train?")
    val logPrior =
      math.log(prior(0).getLong(0).toDouble) - math.log(prior(0).getLong(1).toDouble)
    QualityClassifier.score(docs, model, idCol, textCol, alpha,
        broadcastModel, maxDocTokens)
      .select(col(idCol), col("n_grams"),
        (col("log_odds") - lit(logPrior)).as("log_weight"))
  }

  /** Select `k` documents without replacement with probability ∝ their
    * importance weight (Gumbel top-k over [[logWeights]]): (idCol,
    * n_grams, log_weight, sample_key), the k largest sample_key =
    * log_weight + Gumbel(md5(id, seed)), ties broken by id. Same seed
    * → the identical selection on any layout; a fresh seed is a fresh
    * resample. `k ≥ n` returns every weighable document.
    *
    * Scale bound: the per-partition TakeOrdered keeps every EXECUTOR's
    * state at O(k), but the final merge materializes all k selected
    * rows at ONE point (the standard Spark top-k merge) — fine through
    * k in the millions (a (id, n_grams, log_weight, sample_key) row is
    * ~40 bytes), but corpus-scale DSIR selection (k in the tens of
    * millions, the paper's regime) should use [[resampleThreshold]],
    * which bounds the exact top-k to the quantile-boundary band and
    * never holds more than the band at one point. */
  def resample(docs: DataFrame, model: DataFrame, k: Int,
      seed: Long = 0L, idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 1.0, broadcastModel: Boolean = true,
      maxDocTokens: Long = 200000L): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    logWeights(docs, model, idCol, textCol, alpha, broadcastModel,
        maxDocTokens)
      .withColumn("sample_key", col("log_weight") + gumbel(idCol, seed))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }

  /** Derived standard Gumbel noise on (id, seed): u in (0,1) is the
    * 32-bit md5 prefix of "id:seed" (+0.5 to dodge the endpoints — the
    * paretoKeep draw, shared convention), G = −log(−log u). */
  private def gumbel(idCol: String, seed: Long) = {
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), lit(seed.toString))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    -log(-log(u))
  }

  /** [[resample]] for corpus-scale k (tens of millions — the paper's
    * regime), selecting the IDENTICAL set without ever holding k rows
    * at one point: an approx-quantile threshold splits the keyed frame
    * into definite keepers (`sample_key` strictly above the
    * conservative upper cut — provably inside the true top-k, kept as
    * a distributed FILTER) and a boundary band of O(relErr·n) rows
    * where a small exact top-(k − m) merge settles the edge. The
    * quantile sketch's rank guarantee (±eps·n with eps =
    * max(relErr, 1/n)) makes the split safe on both sides: rows above
    * the upper cut number ≤ k − eps·n, rows above the lower cut
    * ≥ k + eps·n ≥ k, so the selection ≡ [[resample]]'s exactly (ties
    * at the cut all land in the band, where the (sample_key desc, id)
    * order matches the global one beneath the strictly-greater
    * keepers).
    *
    * Execution contract: eager — the keyed frame localCheckpoints (it
    * feeds the quantile sketch, two counts and both filters; the
    * SemDedup convention) and the counts/quantile run at call time. */
  def resampleThreshold(docs: DataFrame, model: DataFrame, k: Int,
      seed: Long = 0L, idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 1.0, broadcastModel: Boolean = true,
      maxDocTokens: Long = 200000L, relErr: Double = 1e-4): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(relErr > 0.0 && relErr <= 0.1, s"relErr $relErr out of (0, 0.1]")
    val keyed = logWeights(docs, model, idCol, textCol, alpha,
        broadcastModel, maxDocTokens)
      .withColumn("sample_key", col("log_weight") + gumbel(idCol, seed))
      .localCheckpoint()
    val n = keyed.count()
    if (n <= k) keyed
    else {
      val eps = math.max(relErr, 1.0 / n)
      val pMid = 1.0 - k.toDouble / n
      val pLo = math.max(0.0, pMid - 2.0 * eps)
      val pHi = math.min(1.0, pMid + 2.0 * eps)
      val cuts = keyed.stat.approxQuantile("sample_key",
        Array(pLo, pHi), eps)
      val (tLo, tHi) = (cuts(0), cuts(1))
      val sure =
        if (pHi >= 1.0) keyed.filter(lit(false)) // k/n <= 2eps: band-only
        else keyed.filter(col("sample_key") > tHi)
      val m = sure.count()
      assert(m <= k, s"quantile upper cut admitted $m > k=$k rows — " +
        "rank guarantee violated")
      val band = keyed.filter(col("sample_key") > tLo &&
        (lit(pHi >= 1.0) || col("sample_key") <= tHi))
      val edge = band.orderBy(col("sample_key").desc, col(idCol))
        .limit((k - m).toInt)
      sure.unionByName(edge)
    }
  }
}
