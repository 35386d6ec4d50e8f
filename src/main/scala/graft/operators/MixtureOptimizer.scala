package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E38: DoReMi mixture-weight optimization (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
  * the closing tier of the mixture stack. E18's `temperatureWeights`
  * sets weights from corpus SIZE; DoReMi sets them from measured
  * LEARNING SIGNAL: train a small proxy under Group DRO (Sagawa et al.
  * 2020), and at each step upweight the domains where the proxy's loss
  * exceeds a reference model's — "excess loss", the per-domain headroom
  * still learnable — via multiplicative weights. The final mixture is
  * the AVERAGE of the per-step weights, and it transfers to the full-
  * size run (the paper's 8× speedup result).
  *
  * The model training itself happens outside this engine (a GPU
  * concern); what belongs HERE is the weight arithmetic over the
  * measured losses — the same loss-as-data boundary as E23 scoring vs
  * LM training. Inputs ride the E18 conventions: frames keyed by
  * `source`, output is the (source, weight) shape [[CurationOps
  * .planMixture]] consumes directly, so the full published loop is
  * doremiRun → planMixture → mixtureRepeat → TrainingExport.
  *
  * Arithmetic is DRIVER-SIDE EXACT over the domains-sized frames (the
  * planMixture precedent — a mixture is domains, not documents;
  * `maxSources` guards the collect loudly): deterministic source-sorted
  * order, no FP accumulation ambiguity across engines/partitionings.
  *
  * Per step (paper Alg. 1): α'ᵢ = αᵢ · exp(η · max(0, excessᵢ)) —
  * negative excess CLAMPS (a domain the proxy already beats the
  * reference on gets no downweight beyond renormalization) — then
  * normalize and smooth with the uniform mixture:
  * α ← (1−c)·α'/Σα' + c/k. Smoothing keeps every domain alive (a
  * zero weight is absorbing under multiplicative updates — one noisy
  * round would permanently kill a domain).
  *
  * Fail-closed contracts: the excess frame's source set must EQUAL the
  * prior's (a domain without a loss measurement this round is a
  * pipeline bug — silently carrying its stale weight would misreport
  * the round as measured); null/NaN/infinite losses and non-positive
  * prior weights refuse; duplicates refuse (the E18 recipe rule).
  */
object MixtureOptimizer {

  private def collectKeyed(df: DataFrame, valueCol: String,
      what: String, maxSources: Int): Seq[(String, Double)] = {
    val n = df.count()
    require(n <= maxSources,
      s"$n $what rows exceed maxSources=$maxSources — a mixture is " +
        "domains, not documents; raise the cap only if that is really true")
    val rows = df.select(col("source"), col(valueCol).cast("double"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1)))
      .sortBy(_._1).toSeq
    require(rows.map(_._1).distinct.size == rows.size,
      s"duplicate source rows in $what — a mixture frame must be " +
        "unique on source")
    require(rows.forall(r => !r._2.isNaN && !r._2.isInfinite),
      s"null/NaN/infinite values in $what — a round with unmeasurable " +
        "loss must be dropped upstream, not averaged in")
    rows
  }

  /** One multiplicative-weights round. `prior` and `excess` are
    * (source, weight) / (source, excess_loss) frames over the SAME
    * domain set. Returns the smoothed next weights, summing to 1. */
  def doremiStep(prior: DataFrame, excess: DataFrame, eta: Double,
      smoothing: Double = 1e-3, maxSources: Int = 100000): DataFrame = {
    require(eta > 0, s"eta $eta must be positive")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing $smoothing out of [0, 1)")
    val spark = prior.sparkSession
    val p = collectKeyed(prior, "weight", "prior weights", maxSources)
    val e = collectKeyed(excess, "excess_loss", "excess losses", maxSources)
    require(p.map(_._1) == e.map(_._1),
      s"domain sets differ: prior has ${p.map(_._1).mkString(",")} vs " +
        s"excess ${e.map(_._1).mkString(",")} — every prior domain needs " +
        "a loss measurement this round (and no extras)")
    require(p.forall(_._2 > 0), "non-positive prior weights — a dead " +
      "domain cannot re-enter a multiplicative update; restart from a " +
      "smoothed prior instead")
    spark.createDataFrame(stepExact(p, e, eta, smoothing))
      .toDF("source", "weight")
  }

  private def stepExact(p: Seq[(String, Double)], e: Seq[(String, Double)],
      eta: Double, smoothing: Double): Seq[(String, Double)] = {
    val k = p.size
    val up = p.zip(e).map { case ((s, w), (_, x)) =>
      (s, w * math.exp(eta * math.max(0.0, x))) }
    val tot = up.map(_._2).sum
    up.map { case (s, w) =>
      (s, (1.0 - smoothing) * w / tot + smoothing / k) }
  }

  /** The full loop over T measured rounds: fold [[doremiStep]] and
    * return the AVERAGE of the per-round weights (the paper's final
    * mixture — averaging is what makes one early aggressive round not
    * own the result). `rounds` is the per-round excess-loss frames in
    * training order; `prior` defaults to uniform when None. Also
    * returns nothing else: feed the result to planMixture. */
  def doremiRun(spark: SparkSession, rounds: Seq[DataFrame],
      prior: Option[DataFrame] = None, eta: Double = 1.0,
      smoothing: Double = 1e-3, maxSources: Int = 100000): DataFrame = {
    require(rounds.nonEmpty, "at least one round of measured losses")
    var cur: Seq[(String, Double)] = prior match {
      case Some(df) =>
        val p = collectKeyed(df, "weight", "prior weights", maxSources)
        require(p.forall(_._2 > 0), "non-positive prior weights")
        val tot = p.map(_._2).sum
        p.map { case (s, w) => (s, w / tot) }
      case None =>
        // uniform over the first round's domain set (collected only on
        // this path — a supplied prior already carries the domains)
        val first = collectKeyed(rounds.head, "excess_loss",
          "excess losses", maxSources)
        first.map { case (s, _) => (s, 1.0 / first.size) }
    }
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
    cur.foreach { case (s, _) => acc(s) = 0.0 }
    rounds.foreach { r =>
      val e = collectKeyed(r, "excess_loss", "excess losses", maxSources)
      require(cur.map(_._1) == e.map(_._1),
        "domain sets differ between rounds — every round measures the " +
          "same domains")
      cur = stepExact(cur, e, eta, smoothing)
      cur.foreach { case (s, w) => acc(s) += w }
    }
    val t = rounds.size
    spark.createDataFrame(acc.toSeq.map { case (s, w) => (s, w / t) })
      .toDF("source", "weight")
  }
}
