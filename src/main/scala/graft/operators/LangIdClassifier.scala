package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned LANGUAGE IDENTIFICATION — the classifier tier of the langid
  * stage (SURVEY §2 E36). Every published curation stack OPENS with a
  * trained language classifier (CCNet runs fastText langid before any
  * other stage, Wenzek et al. 2020 §3.2; RefinedWeb and Dolma the
  * same); the engine's E2 `text_langid` is the fixed stopword-profile
  * heuristic — this is its LEARNED sibling: multinomial Naive Bayes
  * over hashed CHARACTER n-grams (char grams are the langid standard —
  * they see diacritics, scripts and morphology, and never depend on
  * whitespace segmentation, which unsegmented scripts don't have; the
  * fastText-langid feature shape, Joulin et al. 2016). The K-class
  * generalization of [[QualityClassifier]]'s binary NB, riding the
  * same conventions end to end.
  *
  * Scale shape (the E24 shape, K-wide):
  *  - [[train]]: ONE heavy corpus pass — char-position explode into
  *    hashed features + one keyed count per (feature, class); the model
  *    is bounded by dim × K rows (hashed features — no Heaps'-law
  *    growth). Class totals + priors ride a narrow closed-form scan.
  *  - [[score]]: the model pivots to (feature, per-class count vector)
  *    — vocabulary-sized — then one broadcast-or-shuffle join
  *    (`broadcastModel`, the E22/E23 convention) + ONE per-document
  *    fold of matched grams in ascending packed-position order whose
  *    state is K doubles plus the doc's matched-gram list. The fold is
  *    bounded BY CONSTRUCTION: language identity needs only a prefix,
  *    so text truncates to `maxChars` first (the reason no
  *    maxDocTokens probe exists here — truncation IS the bound).
  *  - Unmatched grams contribute log α − log(total_c + α·dim) per
  *    class; unlike the binary ratio these do NOT cancel across
  *    classes (denominators differ), so they enter in closed form via
  *    (n_grams − n_matched) — counted, never collected.
  *
  * Determinism: exact integer counts; per-doc FP sums fold in ascending
  * packed-position order (layout- and join-strategy-independent
  * bit-exactly, spec'd); `lang_pred` is the argmax with ties broken to
  * the LEXICOGRAPHICALLY SMALLEST class (strict-improve fold over the
  * sorted class list — first max wins; pinned by spec).
  *
  * Model frame layout (long format, self-describing — the E24 reserved
  * -row convention widened by a class column): (feature ≥ 0, lang,
  * cnt) the per-class gram counts; (−1, lang, total grams_c)
  * pre-pruning; (−2, lang, docs_c) the prior; (−3, "dim"/"order"/
  * "maxChars", value) the extraction parameters.
  */
object LangIdClassifier {

  val MaxClasses = 256

  /** Hashed feature id of an (n, gram) char pair — the E24 hash
    * convention (xxhash64 over (n, gram), folded into [0, dim)). */
  private def featureCol(dim: Int): Column =
    pmod(xxhash64(col("_n").cast("int"), col("_g")), lit(dim.toLong))

  /** Total char-gram count of a doc with `len` chars, orders 1..order:
    * Σ_{n=1..order} max(len−n+1, 0) in closed form — the narrow twin
    * of the explode (the E24 totalGrams arithmetic on chars). */
  private def totalGrams(len: Column, order: Int): Column = {
    val o = lit(order.toLong)
    when(len >= order, o * len - lit(order.toLong * (order - 1L) / 2L))
      .otherwise((len * (len + 1L) / 2L).cast("long"))
  }

  private def truncated(textCol: String, maxChars: Int): Column =
    substring(col(textCol), 1, maxChars)

  /** THE char-gram feature stream — one double explode over `_t`
    * (order n = 1..min(order, len), end position p = n..len, gram =
    * substring(p−n+1, n)), hashed to features, carrying `keep` plus
    * the packed fold-order key p·(order+1)+n (the E24 total-order
    * convention). ONE definition shared by train and score so the two
    * paths cannot drift (and mirrored independently by the spec). */
  private def charGrams(ws: DataFrame, order: Int, dim: Int,
      keep: Seq[String]): DataFrame =
    ws
      .select(keep.map(col) :+ col("_t") :+
        explode(sequence(lit(1), least(lit(order), length(col("_t")))))
          .as("_n"): _*)
      .select(keep.map(col) :+ col("_t") :+ col("_n") :+
        explode(sequence(col("_n"), length(col("_t")))).as("_p"): _*)
      .select(keep.map(col) :+
        (col("_p").cast("long") * (order + 1) + col("_n")).as("_key") :+
        col("_n") :+
        substring(col("_t"), (col("_p") - col("_n") + lit(1)).cast("int"),
          col("_n").cast("int")).as("_g"): _*)
      .select(keep.map(col) :+ col("_key") :+
        featureCol(dim).as("feature"): _*)

  /** Train the K-class NB model over char grams of `docs(textCol)`
    * truncated to `maxChars`, classed by `labelCol` (string). Classes
    * are discovered from the data — 2..MaxClasses distinct non-null
    * labels (null labels fail loudly: a null class would silently
    * absorb mass). `minCount` prunes features whose TOTAL count across
    * classes is below it; the −1 totals rows keep smoothing
    * denominators pre-pruning exact (a pruned feature scores exactly
    * like an unseen one). */
  def train(docs: DataFrame, labelCol: String = "lang",
      textCol: String = "text", dim: Int = 1 << 16, order: Int = 3,
      maxChars: Int = 2000, minCount: Long = 1L): DataFrame = {
    require(dim >= 2, s"dim $dim must be >= 2")
    require(order >= 1 && order <= 6, s"order $order out of [1, 6]")
    require(maxChars >= 1, s"maxChars $maxChars must be >= 1")
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val spark = docs.sparkSession
    val nullLab = docs.filter(col(labelCol).isNull).limit(1).collect()
    require(nullLab.isEmpty,
      s"null labels in '$labelCol' — filter or impute upstream")
    val ws = docs
      .select(col(labelCol).cast("string").as("_lab"),
        truncated(textCol, maxChars).as("_t"))
      .filter(length(col("_t")) > 0)
    // narrow pass: per-class totals + document counts (no explode)
    val metaRows = ws
      .select(col("_lab"),
        totalGrams(length(col("_t")).cast("long"), order).as("_tg"))
      .groupBy(col("_lab"))
      .agg(sum(col("_tg")).as("total"), count(lit(1)).as("docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(metaRows.length >= 2,
      s"need >= 2 classes with non-empty text, got ${metaRows.length}")
    require(metaRows.length <= MaxClasses,
      s"${metaRows.length} classes exceed MaxClasses=$MaxClasses — " +
        "a class list beyond this stops being driver-bounded metadata")
    // heavy pass: ONE double explode + ONE keyed count per (feature,
    // class); pruning on the per-feature TOTAL via a vocabulary-sized
    // regroup (never a second corpus pass)
    val counts = charGrams(ws, order, dim, Seq("_lab"))
      .groupBy(col("feature"), col("_lab"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("feature"))
      .agg(sum(col("cnt")).as("_tot"),
        collect_list(struct(col("_lab"), col("cnt"))).as("_e"))
      .filter(col("_tot") >= minCount)
      .select(col("feature"), explode(col("_e")).as("_x"))
      .select(col("feature"), col("_x._lab").as("lang"),
        col("_x.cnt").as("cnt"))
    val meta = metaRows.flatMap { case (l, tot, dcs) =>
      Seq((-1L, l, tot), (-2L, l, dcs)) } ++
      Seq((-3L, "dim", dim.toLong), (-3L, "order", order.toLong),
        (-3L, "maxChars", maxChars.toLong))
    counts.unionByName(
      spark.createDataFrame(meta).toDF("feature", "lang", "cnt"))
  }

  private def scoreMeta(model: DataFrame): (Seq[(String, Long, Long)],
      Int, Int, Int) = {
    val rows = model.filter(col("feature") < 0)
      .select(col("feature"), col("lang"), col("cnt").cast("long"))
      .collect()
    val params = rows.filter(_.getLong(0) == -3L)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    require(Seq("dim", "order", "maxChars").forall(params.contains),
      "model frame lacks the reserved parameter rows (feature −3) — " +
        "was it produced by LangIdClassifier.train?")
    val totals = rows.filter(_.getLong(0) == -1L)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val docs = rows.filter(_.getLong(0) == -2L)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    require(totals.keySet == docs.keySet && totals.nonEmpty,
      "model frame's totals (−1) and priors (−2) rows disagree on the " +
        "class list — torn model")
    val classes = totals.keySet.toSeq.sorted
      .map(l => (l, totals(l), docs(l)))
    (classes, params("dim").toInt, params("order").toInt,
      params("maxChars").toInt)
  }

  /** Score `docs` against a [[train]]ed model: (idCol, n_grams,
    * lang_pred, scores) — scores the per-class NB log posterior (up to
    * the class-free evidence constant) as a map, lang_pred its argmax
    * with ties to the lexicographically smallest class. Empty docs do
    * not appear (the E24 convention). */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 1.0,
      broadcastModel: Boolean = true): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be > 0")
    val (classes, dim, order, maxChars) = scoreMeta(model)
    val k = classes.length
    val nDocs = classes.map(_._3).sum.toDouble
    val classLits = array(classes.map(c => lit(c._1)): _*)
    val priorLits = array(classes.map(c =>
      lit(math.log(c._3.toDouble) - math.log(nDocs))): _*)
    val denLits = array(classes.map(c =>
      lit(math.log(c._2.toDouble + alpha * dim))): _*)
    val logAlpha = math.log(alpha)

    // vocabulary-sized pivot: per-feature K-vector in class-list order
    val m = model.filter(col("feature") >= 0)
      .groupBy(col("feature"))
      .agg(map_from_entries(collect_list(
        struct(col("lang"), col("cnt").cast("long")))).as("_cm"))
      .select(col("feature"),
        transform(classLits, l =>
          coalesce(try_element_at(col("_cm"), l), lit(0L))).as("_cnts"))

    val ws = docs.select(col(idCol), truncated(textCol, maxChars).as("_t"))
      .filter(length(col("_t")) > 0)
    val grams = charGrams(ws, order, dim, Seq(idCol))
    val joined = grams
      .join(if (broadcastModel) broadcast(m) else m, Seq("feature"), "left")
    val perDoc = joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("_cnts")).as("_nm"),
        collect_list(when(col("_cnts").isNotNull,
          struct(col("_key"), col("_cnts")))).as("_e"))
    // K-wide fold in ascending packed-position order: deterministic
    // FP sums per class; unmatched grams enter in closed form below
    val folded = aggregate(
      array_sort(col("_e")),
      array_repeat(lit(0.0), k),
      (acc, e) => zip_with(acc, e.getField("_cnts"),
        (a, c) => a + log(c.cast("double") + alpha)))
    val withScores = perDoc
      .withColumn("_f", folded)
      .withColumn("_scores", transform(sequence(lit(0), lit(k - 1)), i =>
        element_at(priorLits, i + 1) +
          element_at(col("_f"), i + 1) +
          (col("n_grams") - col("_nm")).cast("double") * lit(logAlpha) -
          col("n_grams").cast("double") * element_at(denLits, i + 1)))
    // strict-improve argmax over the sorted class list: first max wins
    val best = aggregate(
      sequence(lit(0), lit(k - 1)),
      struct(lit(-1).as("i"), lit(Double.NegativeInfinity).as("v")),
      (acc, i) => when(element_at(col("_scores"), i + 1) > acc.getField("v"),
        struct(i.cast("int").as("i"), element_at(col("_scores"), i + 1).as("v")))
        .otherwise(acc))
    withScores
      .withColumn("_b", best)
      .select(col(idCol), col("n_grams"),
        element_at(classLits, col("_b").getField("i") + 1).as("lang_pred"),
        map_from_arrays(classLits, col("_scores")).as("scores"))
  }

  /** Persist a [[train]]ed model on the [[ModelStore]] convention
    * (writer-locked `_meta` swap, keep-two retention) — kind
    * `nb_langid`. The reserved rows are validated on the WRITTEN files
    * before the swap. */
  def save(model: DataFrame, path: String): Unit = {
    val spark = model.sparkSession
    ModelStore.withLock(spark, path, "LangIdClassifier model") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "weights")
      model.select(col("feature").cast("long").as("feature"),
          col("lang").cast("string").as("lang"),
          col("cnt").cast("long").as("cnt"))
        .write.mode("overwrite").parquet(dir)
      val (classes, dim, order, maxChars) =
        scoreMeta(spark.read.parquet(dir))
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "nb_langid", "gen" -> g.toString,
        "dim" -> dim.toString, "order" -> order.toString,
        "maxChars" -> maxChars.toString,
        "nClasses" -> classes.length.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed model — the long-format frame [[score]] takes,
    * lazy over the committed generation's parquet. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "LangIdClassifier model")
    ModelStore.checkKind(kv, path, "nb_langid", "1")
    spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "weights"))
  }
}
