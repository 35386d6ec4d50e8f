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
    * resample. `k ≥ n` returns every weighable document. */
  def resample(docs: DataFrame, model: DataFrame, k: Int,
      seed: Long = 0L, idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 1.0, broadcastModel: Boolean = true,
      maxDocTokens: Long = 200000L): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    // u in (0,1): 32-bit md5 prefix of "id:seed", +0.5 to dodge the
    // endpoints — the paretoKeep draw, shared convention
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), lit(seed.toString))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    logWeights(docs, model, idCol, textCol, alpha, broadcastModel,
        maxDocTokens)
      .withColumn("sample_key", col("log_weight") + (-log(-log(u))))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }
}
