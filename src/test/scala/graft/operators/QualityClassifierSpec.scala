package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The learned quality classifier must be an exact distributed
  * re-expression of multinomial Naive Bayes over hashed n-gram
  * features: counts match a single-node reference feature by feature,
  * per-document log-odds match a single-node fold, scoring is layout-
  * and join-strategy-independent, pruning behaves exactly like
  * unseen-feature smoothing, the Pareto keep rule is bit-reproducible,
  * and the durable artifact round-trips to identical scores. The
  * classifier property itself is asserted where the data guarantees
  * it: trained on real-vs-mangled documents (disjoint vocabularies),
  * the two populations' scores must actually separate.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val S = NgramLm.Sep
  private val Dim = 1 << 14
  private val Order = 2

  /** Real docs as the trusted class; the SAME corpus with every word
    * mangled (disjoint vocabulary) as the junk class — the testdata's
    * `lang` column does not correlate with the (shared-vocabulary)
    * synthetic text, so a label with actual textual signal has to be
    * constructed, exactly like NgramLmSpec's all-OOV junk doc. */
  private lazy val labeled = {
    val docs = Tables.documents(spark, sf)
    val pos = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"), lit(true).as("label"))
    val neg = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .select(col("doc_id"),
        expr("array_join(transform(filter(split(text, ' '), " +
          "w -> length(w) > 0), w -> concat(w, 'q')), ' ')").as("text"),
        lit(false).as("label"))
    pos.unionByName(neg).cache()
  }

  private def refWords(t: String): Vector[String] =
    t.split(" ").filter(_.nonEmpty).toVector

  /** (packedKey, n, gram) for orders 1..Order — the operator's fan-out. */
  private def refGrams(w: Vector[String]): Vector[(Long, Int, String)] =
    (for {
      n <- 1 to Order
      p <- (n - 1) until w.length
    } yield (p.toLong * (Order + 1) + n, n,
      w.slice(p - n + 1, p + 1).mkString(S))).toVector

  /** Feature ids via the SAME hash the operator uses (xxhash64 has no
    * plain-JVM twin here, so the mapping is computed once through the
    * expression and collected — the mapping is what's shared, the
    * counting/scoring math is independent). */
  private def featureMap(grams: Seq[(Int, String)]): Map[(Int, String), Long] = {
    if (grams.isEmpty) return Map.empty
    spark.createDataFrame(grams.distinct).toDF("n", "gram")
      .select(col("n"), col("gram"),
        pmod(xxhash64(col("n").cast("int"), col("gram")), lit(Dim.toLong))
          .as("f"))
      .as[(Int, String, Long)].collect()
      .map { case (n, g, f) => (n, g) -> f }.toMap
  }

  private case class Ref(
      cnt: Map[Long, (Long, Long)], tp: Long, tn: Long, dp: Long, dn: Long)

  private def refTrain(rows: Seq[(Long, String, Boolean)]): Ref = {
    val grams = rows.flatMap { case (_, t, lab) =>
      refGrams(refWords(t)).map(g => (g._2, g._3, lab)) }
    val fm = featureMap(grams.map(g => (g._1, g._2)).distinct)
    val cnt = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      .withDefaultValue((0L, 0L))
    var (tp, tn, dp, dn) = (0L, 0L, 0L, 0L)
    rows.foreach { case (_, t, lab) =>
      val w = refWords(t)
      if (w.nonEmpty) {
        if (lab) dp += 1 else dn += 1
        refGrams(w).foreach { case (_, n, g) =>
          val f = fm((n, g))
          val (a, b) = cnt(f)
          cnt(f) = if (lab) (a + 1, b) else (a, b + 1)
          if (lab) tp += 1 else tn += 1
        }
      }
    }
    Ref(cnt.toMap, tp, tn, dp, dn)
  }

  /** Single-node NB score with the operator's exact fold order:
    * matched grams ascending by packed key, two running double sums. */
  private def refScore(text: String, ref: Ref,
      fm: Map[(Int, String), Long], alpha: Double): Option[(Long, Double)] = {
    val w = refWords(text)
    if (w.isEmpty) return None
    val grams = refGrams(w)
    val logPrior = math.log(ref.dp.toDouble) - math.log(ref.dn.toDouble)
    val logDenP = math.log(ref.tp.toDouble + alpha * Dim)
    val logDenN = math.log(ref.tn.toDouble + alpha * Dim)
    var sp = 0.0; var sn = 0.0
    grams.sortBy(_._1).foreach { case (_, n, g) =>
      ref.cnt.get(fm((n, g))).foreach { case (a, b) =>
        sp += math.log(a.toDouble + alpha)
        sn += math.log(b.toDouble + alpha)
      }
    }
    val lo = logPrior + (sp - sn) + grams.length.toDouble * (logDenN - logDenP)
    Some((grams.length.toLong, lo))
  }

  test("train: hashed per-class counts, totals and priors match the single-node reference") {
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order).cache()
    val rows = labeled.as[(Long, String, Boolean)].collect().toSeq
    val ref = refTrain(rows)
    val got = model.filter(col("feature") >= 0)
      .select("feature", "cnt_pos", "cnt_neg").as[(Long, Long, Long)]
      .collect()
    assert(got.length === ref.cnt.size)
    got.foreach { case (f, a, b) => assert(ref.cnt(f) === ((a, b)), s"feature $f") }
    val meta = model.filter(col("feature") < 0)
      .select("feature", "cnt_pos", "cnt_neg").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(meta(-1L) === ((ref.tp, ref.tn)))
    assert(meta(-2L) === ((ref.dp, ref.dn)))
    assert(meta(-3L) === ((Dim.toLong, Order.toLong)))
  }

  test("score: per-doc log-odds match the single-node fold; real-vs-mangled training separates the populations") {
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order).cache()
    val rows = labeled.as[(Long, String, Boolean)].collect().toSeq
    val ref = refTrain(rows)
    val fm = featureMap(rows.flatMap(r =>
      refGrams(refWords(r._2)).map(g => (g._2, g._3))).distinct)
    val got = QualityClassifier.score(labeled, model)
      .select("doc_id", "n_grams", "log_odds").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    var checked = 0
    rows.foreach { case (id, t, _) =>
      refScore(t, ref, fm, 1.0).foreach { case (ng, lo) =>
        val (gng, glo) = got(id)
        assert(gng === ng, s"doc $id n_grams")
        assert(math.abs(glo - lo) <= 1e-9 * math.max(1.0, math.abs(lo)),
          s"doc $id log_odds $glo vs $lo")
        checked += 1
      }
    }
    assert(checked > 100)
    // the classifier property: the two populations separate on the
    // training corpus (their vocabularies are disjoint by construction)
    val scored = QualityClassifier.score(labeled, model)
      .join(labeled.select("doc_id", "label"), "doc_id")
    val avg = scored.groupBy(col("label"))
      .agg(org.apache.spark.sql.functions.avg(col("prob")).as("p"))
      .as[(Boolean, Double)].collect().toMap
    assert(avg(true) > 0.9, s"positive-class mean prob ${avg(true)}")
    assert(avg(false) < 0.1, s"negative-class mean prob ${avg(false)}")
  }

  test("score: layout- and join-strategy-independent, bit-exact") {
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order)
      .localCheckpoint(true)
    val base = QualityClassifier.score(labeled, model)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    val relaid = QualityClassifier.score(labeled.repartition(7), model)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    val shuffled = QualityClassifier.score(labeled, model,
        broadcastModel = false)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    assert(base === relaid)
    assert(base === shuffled)
  }

  test("minCount pruning scores pruned features exactly like unseen ones (denominators stay pre-pruning)") {
    val full = QualityClassifier.train(labeled, dim = Dim, order = Order)
      .localCheckpoint(true)
    val pruned = QualityClassifier.train(labeled, dim = Dim, order = Order,
      minCount = 3L).localCheckpoint(true)
    // meta rows identical: pruning must not touch totals or priors
    val metaOf = (m: org.apache.spark.sql.DataFrame) =>
      m.filter(col("feature") < 0)
        .select("feature", "cnt_pos", "cnt_neg").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(metaOf(full) === metaOf(pruned))
    // single-node check on a sample: re-scoring under the pruned model
    // equals the fold with pruned features dropped from the count map
    val rows = labeled.as[(Long, String, Boolean)].collect().toSeq
    val ref = refTrain(rows)
    val keep = ref.cnt.filter { case (_, (a, b)) => a + b >= 3L }
    val refP = ref.copy(cnt = keep)
    val fm = featureMap(rows.flatMap(r =>
      refGrams(refWords(r._2)).map(g => (g._2, g._3))).distinct)
    val got = QualityClassifier.score(labeled, pruned)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    rows.take(50).foreach { case (id, t, _) =>
      refScore(t, refP, fm, 1.0).foreach { case (_, lo) =>
        assert(math.abs(got(id) - lo) <= 1e-9 * math.max(1.0, math.abs(lo)),
          s"doc $id")
      }
    }
  }

  test("paretoKeep: bit-reproducible, matches the inverse-CDF reference, keeps the high-prob class more") {
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order)
      .localCheckpoint(true)
    val scored = QualityClassifier.score(labeled, model).localCheckpoint(true)
    val k1 = QualityClassifier.paretoKeep(scored, seed = 7L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val k2 = QualityClassifier.paretoKeep(scored, seed = 7L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(k1 === k2)
    // plain-JVM md5 reference of the same rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def refKeep(id: Long, prob: Double): Boolean = {
      val hex = md.digest(s"$id:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      prob > 1.0 - (math.pow(u, -1.0 / 9.0) - 1.0)
    }
    val probs = scored.select("doc_id", "prob").as[(Long, Double)]
      .collect().toMap
    probs.foreach { case (id, p) =>
      assert(k1(id) === refKeep(id, p), s"doc $id") }
    // the rule keeps essentially all high-prob docs, few low-prob ones
    val byLabel = QualityClassifier.paretoKeep(scored, seed = 7L)
      .join(labeled.select("doc_id", "label"), "doc_id")
      .groupBy(col("label"))
      .agg(org.apache.spark.sql.functions.avg(col("keep").cast("double")).as("r"))
      .as[(Boolean, Double)].collect().toMap
    assert(byLabel(true) > 0.9)
    assert(byLabel(false) < byLabel(true))
  }

  test("save/load round-trips to identical scores; kind guard names a mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("qc-artifact").toString
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order)
      .localCheckpoint(true)
    QualityClassifier.save(model, dir)
    val loaded = QualityClassifier.load(spark, dir)
    val base = QualityClassifier.score(labeled, model)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    val fresh = QualityClassifier.score(labeled, loaded)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    assert(base === fresh)
    // a non-classifier artifact at the path fails by NAME, not downstream
    val e = intercept[IllegalArgumentException] {
      NgramLm.load(spark, dir) }
    assert(e.getMessage.contains("kind"))
  }

  test("guards: one-class corpora and over-long documents fail loudly") {
    val oneClass = labeled.withColumn("label", lit(true))
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.train(oneClass, dim = Dim, order = Order) }
    assert(e1.getMessage.contains("non-empty"))
    val model = QualityClassifier.train(labeled, dim = Dim, order = Order)
      .localCheckpoint(true)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.score(labeled, model, maxDocTokens = 3L) }
    assert(e2.getMessage.contains("maxDocTokens"))
  }
}
