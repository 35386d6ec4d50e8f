package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned document-quality classifier — the third tier of the
  * published curation stack, above the rule gates (E3/E11) and the
  * n-gram-LM perplexity filter (E23): train a classifier on labeled
  * examples ("looks like the trusted corpus" vs "looks like raw
  * crawl") and keep documents by classifier score, optionally through
  * the Pareto-smoothed stochastic rule. This is the GPT-3 recipe
  * (Brown et al. 2020, Appendix A: a linear classifier over hashed
  * n-gram features, kept when `score > 1 − pareto(α)`) and the fastText
  * supervised shape (Joulin et al. 2016: word + bigram features, hashed
  * into a fixed-dimension table). The classifier itself is multinomial
  * Naive Bayes with Laplace smoothing — the one linear text classifier
  * whose training IS a counting aggregation, i.e. exactly one
  * map-side-combinable corpus pass, no gradient loop. (The reference
  * repo stops at serving precomputed features — main.py:37-340 — so
  * this family, like E21-E23, is engine-added.)
  *
  * Scale shape:
  *  - [[train]]: ONE heavy corpus pass — position-explode into hashed
  *    (feature) rows and one keyed conditional count; the model table
  *    is bounded by `dim` (hashed features, fastText's trick: vocabulary
  *    growth lands in a fixed-size table by construction, no Heaps'-law
  *    blowup). Totals + priors ride a second NARROW scan (no explode).
  *  - [[score]]: one join of the gram-exploded candidate corpus
  *    (fan-out ≤ order rows per token) against the model — broadcast
  *    while it fits (≤ dim rows, typically MBs), size-based planner
  *    once it doesn't (`broadcastModel = false`, the NgramLm/encode
  *    convention) — then ONE per-document fold whose state is the doc's
  *    own matched-gram list: bounded by document length × order, never
  *    the corpus, never the model (`maxDocTokens` fail-loud probe, the
  *    NgramLm.score convention).
  *
  * Determinism: counts are exact integers; a document's score folds its
  * matched grams in ascending packed-position order inside one
  * `aggregate` expression, so the FP sum is a pure function of (text,
  * model) — layout- and join-strategy-independent (spec'd). The
  * unmatched grams' contribution is `count × log α` — order-free.
  *
  * Model frame layout (self-describing, the NgramLm n=0 convention):
  * (feature:long, cnt_pos:long, cnt_neg:long) with feature ≥ 0 the
  * hashed-gram counts per class, plus three reserved metadata rows:
  * feature −1 = total gram occurrences per class (pre-pruning — the
  * smoothing denominator stays honest under `minCount`), feature −2 =
  * labeled document counts per class (the prior), feature −3 =
  * (dim, order).
  */
object QualityClassifier {

  private def wordsCol(textCol: String): Column =
    filter(split(col(textCol), " "), w => length(w) > 0)

  /** Hashed feature id of an (n, gram) pair: stable xxhash64 (seed 42,
    * the engine-wide convention) folded into [0, dim). `n` rides in the
    * hash so a unigram and a bigram with the same text never alias by
    * construction (they still may by hash collision — the fastText
    * trade, bounded by dim). */
  private def featureCol(dim: Int): Column =
    pmod(xxhash64(col("n").cast("int"), col("gram")), lit(dim.toLong))

  /** (n, gram) rows for orders 1..order over `_ws` — the NgramLm.train
    * double-explode, shared shape. */
  private def gramRows(ws: DataFrame, order: Int): DataFrame =
    ws
      .select(ws.columns.map(col) :+
        explode(sequence(lit(1), least(lit(order), size(col("_ws"))))).as("n"): _*)
      .select(ws.columns.map(col) :+ col("n") :+
        explode(sequence(col("n") - 1, size(col("_ws")) - 1)).as("p"): _*)
      .select(ws.columns.map(col) :+ col("p") :+ col("n").cast("int").as("n") :+
        concat_ws(NgramLm.Sep,
          slice(col("_ws"), col("p") - col("n") + lit(2), col("n"))).as("gram"): _*)

  /** Total gram count (orders 1..order) of a doc with `len` words:
    * Σ_{n=1..order} max(len−n+1, 0) in closed form — the narrow-scan
    * twin of the explode, so totals never re-run the heavy pass. */
  private def totalGrams(len: Column, order: Int): Column = {
    val o = lit(order.toLong)
    // Column./ is DOUBLE division — halve with an integer cast (the
    // product of consecutive integers is even; exact far past any len)
    when(len >= order, o * len - lit(order.toLong * (order - 1L) / 2L))
      .otherwise((len * (len + 1L) / 2L).cast("long"))
  }

  /** Train the NB model over whitespace words of `docs(textCol)`,
    * labeled by boolean-castable `labelCol` (true = the trusted/positive
    * class). Output: the model frame documented on the object. Both
    * classes must be non-empty (an empty class has no estimable
    * likelihoods — fail loudly, not a NaN model). `minCount` prunes
    * rare features to shrink the table; the −1 totals row keeps the
    * smoothing denominator exact regardless (a pruned feature scores
    * exactly like an unseen one — the honest approximation). */
  def train(docs: DataFrame, labelCol: String = "label",
      textCol: String = "text", dim: Int = 1 << 18, order: Int = 2,
      minCount: Long = 1L): DataFrame = {
    require(dim >= 2, s"dim $dim must be >= 2")
    require(order >= 1 && order <= 4, s"order $order out of [1, 4]")
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val ws = docs
      .select(col(labelCol).cast("boolean").as("_lab"),
        wordsCol(textCol).as("_ws"))
      .filter(size(col("_ws")) > 0)
    // narrow pass: totals + priors (no explode, no shuffle)
    val meta = ws
      .select(col("_lab"),
        totalGrams(size(col("_ws")).cast("long"), order).as("_tg"))
      .agg(
        coalesce(sum(when(col("_lab"), col("_tg"))), lit(0L)).as("tp"),
        coalesce(sum(when(!col("_lab"), col("_tg"))), lit(0L)).as("tn"),
        count(when(col("_lab"), lit(1))).as("dp"),
        count(when(!col("_lab"), lit(1))).as("dn"))
      .head()
    val (tp, tn, dp, dn) =
      (meta.getLong(0), meta.getLong(1), meta.getLong(2), meta.getLong(3))
    require(dp > 0 && dn > 0,
      s"both classes must be non-empty: $dp positive / $dn negative " +
        "labeled documents — a one-class model has no likelihood ratio")
    // heavy pass: ONE explode + ONE keyed conditional count
    val counts = gramRows(ws, order)
      .select(col("_lab"), featureCol(dim).as("feature"))
      .groupBy(col("feature"))
      .agg(count(when(col("_lab"), lit(1))).as("cnt_pos"),
        count(when(!col("_lab"), lit(1))).as("cnt_neg"))
      .filter(col("cnt_pos") + col("cnt_neg") >= minCount)
    counts.unionByName(
      docs.sparkSession.createDataFrame(Seq(
        (-1L, tp, tn), (-2L, dp, dn), (-3L, dim.toLong, order.toLong)))
        .toDF("feature", "cnt_pos", "cnt_neg"))
  }

  /** Score `docs` against a [[train]]ed model: (idCol, n_grams,
    * log_odds, prob) — log_odds = log P(pos|doc) − log P(neg|doc) under
    * multinomial NB with Laplace α, prob its sigmoid; keep the
    * high-prob side. Empty/whitespace docs do not appear (the
    * NgramLm/encode convention). `idCol` must be unique per doc.
    *
    * CHUNK FIRST at scale: the per-document fold state is the doc's
    * matched-gram list — ≤ length × order entries; `maxDocTokens`
    * (default 200k words) fails loudly before the shuffle rather than
    * OOMing inside it (the NgramLm.score probe, same class). */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 1.0,
      broadcastModel: Boolean = true,
      maxDocTokens: Long = 200000L): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be > 0")
    require(maxDocTokens >= 1, s"maxDocTokens $maxDocTokens must be >= 1")
    // driver-bounded metadata: the three reserved rows
    val metaRows = model.filter(col("feature") < 0)
      .select(col("feature"), col("cnt_pos").cast("long"),
        col("cnt_neg").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(Seq(-1L, -2L, -3L).forall(metaRows.contains),
      "model frame lacks the reserved metadata rows (features −1/−2/−3) " +
        "— was it produced by QualityClassifier.train?")
    val (tp, tn) = metaRows(-1L)
    val (dp, dn) = metaRows(-2L)
    val (dim, order) = { val m = metaRows(-3L); (m._1.toInt, m._2.toInt) }
    val logPrior = math.log(dp.toDouble) - math.log(dn.toDouble)
    // per-class log smoothing denominator: log(total_c + α·dim)
    val logDenP = math.log(tp.toDouble + alpha * dim)
    val logDenN = math.log(tn.toDouble + alpha * dim)

    val ws = docs.select(col(idCol), wordsCol(textCol).as("_ws"))
      .filter(size(col("_ws")) > 0)
    val over = ws.filter(size(col("_ws")).cast("long") > maxDocTokens)
      .select(col(idCol)).limit(3).collect()
    require(over.isEmpty,
      s"document(s) ${over.map(_.get(0)).mkString(", ")} exceed " +
        s"maxDocTokens=$maxDocTokens — the per-document fold holds " +
        "length × order matched grams; chunk first (ChunkOps.chunkPlan) " +
        "and combine chunk log_odds, or raise the cap if executor memory " +
        "really covers it")
    val grams = gramRows(ws.select(col(idCol), col("_ws")), order)
      .select(col(idCol),
        (col("p").cast("long") * (order + 1) + col("n")).as("_key"),
        featureCol(dim).as("feature"))
    val m = model.filter(col("feature") >= 0)
      .select(col("feature"), col("cnt_pos").cast("long").as("_cp"),
        col("cnt_neg").cast("long").as("_cn"))
    val joined = grams
      .join(if (broadcastModel) broadcast(m) else m, Seq("feature"), "left")
    // per-doc: matched entries folded in ascending packed-position
    // order (deterministic FP sum); unmatched grams contribute the
    // constant log α each — order-free, counted not collected
    val perDoc = joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        collect_list(when(col("_cp").isNotNull,
          struct(col("_key"), col("_cp"), col("_cn")))).as("_e"))
    val folded = aggregate(
      array_sort(col("_e")),
      struct(lit(0.0).as("sp"), lit(0.0).as("sn")),
      (acc, e) => struct(
        (acc.getField("sp") +
          log(e.getField("_cp").cast("double") + alpha)).as("sp"),
        (acc.getField("sn") +
          log(e.getField("_cn").cast("double") + alpha)).as("sn")))
    perDoc
      .withColumn("_f", folded)
      // unmatched grams contribute log α to BOTH class scores — the
      // terms cancel exactly in the ratio, so only matched grams and
      // the per-gram denominator difference appear here
      .withColumn("log_odds",
        lit(logPrior) +
          (col("_f").getField("sp") - col("_f").getField("sn")) +
          col("n_grams").cast("double") * lit(logDenN - logDenP))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("log_odds"))))
      .select(col(idCol), col("n_grams"), col("log_odds"), col("prob"))
  }

  /** The GPT-3 stochastic keep rule, made deterministic: keep a
    * document when `prob > 1 − x` with x a Pareto(α)-distributed draw —
    * high-scoring docs always survive, low-scoring ones survive with
    * the heavy-tailed residual probability that keeps the kept corpus
    * diverse (Brown et al. 2020, Appendix A; they use α = 9). The draw
    * is the inverse-CDF transform x = u^(−1/α) − 1 of the E9/E15
    * md5-bucket uniform on (idCol, seed) — reproducible across runs,
    * layouts and engines, no RNG state. Output: the scored frame plus
    * a `keep` column. */
  def paretoKeep(scored: DataFrame, paretoAlpha: Double = 9.0,
      idCol: String = "doc_id", probCol: String = "prob",
      seed: Long = 0L): DataFrame = {
    require(paretoAlpha > 0, s"paretoAlpha $paretoAlpha must be > 0")
    // u in (0,1): 32-bit md5 prefix, +0.5 to dodge the endpoints
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), lit(seed.toString))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    scored.withColumn("keep",
      col(probCol) > lit(1.0) - (pow(u, lit(-1.0 / paretoAlpha)) - lit(1.0)))
  }

  /** Persist a [[train]]ed model durably on the [[ModelStore]] `_meta`
    * atomic-commit convention (writer-locked, keep-two retention) —
    * the NgramLm.save twin for the classifier artifact. The shape
    * validation runs against the files just written (the writeShards
    * read-back convention); a frame without the reserved metadata rows
    * fails BEFORE the meta swap — nothing commits. */
  def save(model: DataFrame, path: String): Unit = {
    val spark = model.sparkSession
    ModelStore.withLock(spark, path, "QualityClassifier model") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "weights")
      model.select(col("feature").cast("long").as("feature"),
          col("cnt_pos").cast("long").as("cnt_pos"),
          col("cnt_neg").cast("long").as("cnt_neg"))
        .write.mode("overwrite").parquet(dir)
      val metaRows = spark.read.parquet(dir).filter(col("feature") < 0)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      require(Seq(-1L, -2L, -3L).forall(metaRows.contains),
        "frame lacks the reserved metadata rows (features −1/−2/−3) — " +
          "was it produced by QualityClassifier.train? (nothing committed)")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "nb_quality", "gen" -> g.toString,
        "dim" -> metaRows(-3L)._1.toString,
        "order" -> metaRows(-3L)._2.toString,
        "docsPos" -> metaRows(-2L)._1.toString,
        "docsNeg" -> metaRows(-2L)._2.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed model: the (feature, cnt_pos, cnt_neg) frame
    * [[score]] takes, lazily over the committed generation's parquet —
    * no retraining, readable across one subsequent save (keep-two
    * retention). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "QualityClassifier model")
    ModelStore.checkKind(kv, path, "nb_quality", "1")
    spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "weights"))
  }
}
