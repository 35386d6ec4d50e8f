package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import RecordLinkage.{Exact, FieldSim, Fuzzy}

/** Learned match weights for record linkage (G27's documented gap:
  * "learning the weights is E24's job if a labeled set exists" — this
  * is the UNLABELED path): the Fellegi-Sunter latent-class model fit
  * by EM over agreement patterns, producing the weight vector
  * [[RecordLinkage.scorePairs]] consumes.
  *
  * Model: each candidate pair is latently a match (probability `p`) or
  * a non-match; field k agrees (similarity ≥ `simThreshold`, binarized)
  * with probability m_k among matches and u_k among non-matches,
  * conditionally independent given the class — the 1969 Fellegi-Sunter
  * formulation, still the production standard (Splink, the Stanford
  * entity-resolution stack) precisely because it needs NO labels: the
  * bimodal structure of real rosters (near-duplicates agree on most
  * fields, random block-mates on few) identifies the classes.
  *
  * Scale: the corpus pays ONE aggregation — candidates are binarized
  * and grouped into agreement PATTERNS (≤ 2^K rows for K fields; K ≤ 16
  * enforced), and EM iterates driver-side over that tiny table. This is
  * the standard implementation shape: iterating EM over the pairs
  * themselves would re-scan the corpus per iteration for identical
  * sufficient statistics.
  *
  * The learned model converts to [[RecordLinkage.scorePairs]] weights
  * via the log-likelihood-ratio geometry: field k's agreement weight
  * a_k = log2(m_k/u_k) and disagreement weight d_k = log2((1−m_k)/(1−u_k))
  * make the FS score affine in the agreement vector, so normalizing
  * (a_k − d_k) to sum 1 yields `scorePairs` weights whose BINARIZED
  * score ranks pairs identically to the FS log-odds;
  * [[LinkModel.scoreThreshold]] maps a posterior cutoff into that
  * normalized scale exactly. Durable on the ModelStore `_meta`
  * convention (fresh-session parity spec'd).
  */
object LinkLearn {

  /** One field's learned parameters: P(agree | match) and
    * P(agree | non-match). `kind` preserves the FieldSim family so a
    * loaded model rebuilds the same comparators. */
  final case class FieldParams(name: String, kind: String,
      m: Double, u: Double) {
    require(kind == "fuzzy" || kind == "exact", s"kind $kind")
    /** Agreement / disagreement log-likelihood-ratio weights (base 2,
      * the FS convention). */
    def agreeWeight: Double = math.log(m / u) / math.log(2)
    def disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2)
  }

  /** A fitted Fellegi-Sunter model. */
  final case class LinkModel(p: Double, simThreshold: Double,
      fields: Seq[FieldParams]) {

    /** The learned weight vector in [[RecordLinkage.scorePairs]] form:
      * the same field comparators, weighted by each field's
      * DISCRIMINATING POWER (a_k − d_k, the full log-LR swing between
      * its agreement and disagreement evidence), normalized to sum 1.
      * Fields the EM found uninformative (m ≈ u) get ≈ 0 weight —
      * which is the point of learning them. */
    def toFieldSims: Seq[FieldSim] = {
      val swings = fields.map(f => f.agreeWeight - f.disagreeWeight)
      val tot = swings.sum
      require(tot > 0, s"degenerate model: no field discriminates ($this)")
      fields.zip(swings).map { case (f, s) =>
        val w = s / tot
        if (f.kind == "fuzzy") Fuzzy(f.name, w) else Exact(f.name, w)
      }
    }

    /** The [[RecordLinkage.linkWithPairs]] threshold equivalent to
      * `P(match | agreements) >= minPosterior` under BINARIZED
      * similarities: solving the affine FS score for the normalized
      * [[toFieldSims]] scale. Clamped to (0, 1] — a model so confident
      * that even all-disagree clears the posterior maps to the floor. */
    def scoreThreshold(minPosterior: Double = 0.5): Double = {
      require(minPosterior > 0 && minPosterior < 1, s"$minPosterior")
      def logit(x: Double) = math.log(x / (1 - x)) / math.log(2)
      val base = logit(p) + fields.map(_.disagreeWeight).sum
      val span = fields.map(f => f.agreeWeight - f.disagreeWeight).sum
      val t = (logit(minPosterior) - base) / span
      math.min(1.0, math.max(1e-9, t))
    }
  }

  private def simOf(f: FieldSim) = f match {
    case _: Fuzzy => "fuzzy"
    case _: Exact => "exact"
  }

  /** Agreement patterns over candidate pairs: one row per distinct
    * binarized agreement vector with its pair count — the EM's
    * sufficient statistics, ≤ 2^K rows. The `fields` weights are
    * ignored here (only the comparator kind matters); pass any valid
    * weighting, e.g. uniform. */
  def agreementPatterns(records: DataFrame, pairs: DataFrame, id: String,
      fields: Seq[FieldSim], simThreshold: Double): DataFrame = {
    require(fields.nonEmpty && fields.size <= 16,
      s"1..16 fields (got ${fields.size}) — patterns are 2^K")
    require(simThreshold > 0 && simThreshold <= 1, s"$simThreshold")
    val cols = col(id).as("_id") +: fields.map(f => col(f.colName))
    val a = records.select(cols: _*).as("ra")
    val b = records.select(cols: _*).as("rb")
    val gammas = fields.map(f =>
      (f.sim(col(s"ra.${f.colName}"), col(s"rb.${f.colName}"))
        >= simThreshold).cast("int").as(s"g_${f.colName}"))
    pairs
      .join(a, col("id_a") === col("ra._id"))
      .join(b, col("id_b") === col("rb._id"))
      .select(gammas: _*)
      .groupBy(fields.map(f => col(s"g_${f.colName}")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Fit by EM. Standard initialization (m=0.9, u=0.1, p=0.05) plus
    * the orientation guard: if EM converges with the classes flipped
    * (the "match" class agreeing LESS), swap them — the likelihood is
    * symmetric under relabeling, the semantics are not. Deterministic:
    * fixed init, fixed iteration count, driver arithmetic over the
    * collected pattern table. */
  def fit(records: DataFrame, pairs: DataFrame, id: String,
      fields: Seq[FieldSim], simThreshold: Double = 0.85,
      iters: Int = 50): LinkModel = {
    require(iters >= 1 && iters <= 1000, s"iters $iters")
    // the textbook identifiability bound: 2^K − 1 observable pattern
    // frequencies must cover the 2K + 1 free parameters. K = 2 gives
    // 3 < 5 and EM converges to an arbitrary point on a ridge —
    // refuse loudly rather than return confident nonsense
    require(fields.size >= 3,
      s"Fellegi-Sunter over binary agreements needs >= 3 fields " +
        s"(got ${fields.size}): 2^K-1 pattern frequencies must exceed " +
        "2K+1 parameters or the model is unidentifiable")
    val pat = agreementPatterns(records, pairs, id, fields, simThreshold)
      .collect().map { r =>
        (fields.indices.map(i => r.getInt(i)).toArray, r.getLong(fields.size))
      }
    require(pat.nonEmpty, "no candidate pairs to fit on")
    val k = fields.size
    val total = pat.map(_._2).sum.toDouble
    var p = 0.05
    var m = Array.fill(k)(0.9)
    var u = Array.fill(k)(0.1)
    def clamp(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
    (1 to iters).foreach { _ =>
      var sumR = 0.0
      val sumRg = Array.fill(k)(0.0)
      val sumQg = Array.fill(k)(0.0)
      var sumQ = 0.0
      pat.foreach { case (g, n) =>
        var lm = math.log(p); var lu = math.log(1 - p)
        var i = 0
        while (i < k) {
          lm += math.log(if (g(i) == 1) m(i) else 1 - m(i))
          lu += math.log(if (g(i) == 1) u(i) else 1 - u(i))
          i += 1
        }
        // responsibility via the stable log-sum-exp form
        val r = 1.0 / (1.0 + math.exp(lu - lm))
        sumR += n * r; sumQ += n * (1 - r)
        i = 0
        while (i < k) {
          if (g(i) == 1) { sumRg(i) += n * r; sumQg(i) += n * (1 - r) }
          i += 1
        }
      }
      p = clamp(sumR / total)
      m = Array.tabulate(k)(i => clamp(sumRg(i) / math.max(sumR, 1e-12)))
      u = Array.tabulate(k)(i => clamp(sumQg(i) / math.max(sumQ, 1e-12)))
    }
    // orientation guard (see scaladoc)
    if (m.sum < u.sum) { val t = m; m = u; u = t; p = 1 - p }
    LinkModel(p, simThreshold,
      fields.zipWithIndex.map { case (f, i) =>
        FieldParams(f.colName, simOf(f), m(i), u(i)) })
  }

  // ---- durability (ModelStore `_meta` convention) --------------------------

  /** Persist a fitted model: one fields-sized parquet table + the
    * scalars in `_meta`, committed by the atomic meta swap (keep-two
    * generations, lock-serialized writers — the MixtureArtifact
    * shape). */
  def save(model: LinkModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    ModelStore.withLock(spark, path, "link model") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "fields")
      model.fields.map(f => (f.name, f.kind, f.m, f.u))
        .toDF("name", "kind", "m", "u")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val n = spark.read.parquet(dir).count()
      require(n == model.fields.size,
        s"wrote $n field rows, expected ${model.fields.size}")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "link_model", "gen" -> g.toString,
        "p" -> model.p.toString,
        "simThreshold" -> model.simThreshold.toString,
        "nFields" -> model.fields.size.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed model — fresh-session parity is spec'd:
    * toFieldSims/scoreThreshold of the loaded model match the fitted
    * one exactly. Field order rides the saved table's name order
    * (deterministic re-sort; weights are per-name so order never
    * changes semantics). */
  def load(spark: SparkSession, path: String): LinkModel = {
    val kv = ModelStore.readMeta(spark, path, "link model")
    ModelStore.checkKind(kv, path, "link_model", "1")
    val rows = spark.read
      .parquet(ModelStore.genDir(path, kv("gen").toLong, "fields"))
      .orderBy("name").collect()
    require(rows.length == kv("nFields").toInt,
      s"field table holds ${rows.length} rows, _meta says ${kv("nFields")}")
    LinkModel(kv("p").toDouble, kv("simThreshold").toDouble,
      rows.toSeq.map(r => FieldParams(r.getAs[String]("name"),
        r.getAs[String]("kind"), r.getAs[Double]("m"),
        r.getAs[Double]("u"))))
  }
}
