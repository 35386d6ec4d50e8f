package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LangIdClassifierSpec extends SparkSpec {

  import spark.implicits._

  // three synthetic "languages" over disjoint alphabets — the langid
  // signal constructed, not assumed (the testdata lang column is
  // uncorrelated with its synthetic text, the E24 adjudication)
  private def synth(alpha: String, lang: String, n: Int,
      from: Int = 0): Seq[(Long, String, String)] =
    (0 until n).map { i =>
      val r = new scala.util.Random(lang.hashCode * 1000 + i + from)
      val words = Seq.fill(12)(
        Seq.fill(3 + r.nextInt(4))(alpha(r.nextInt(alpha.length))).mkString)
      ((i + from).toLong, lang, words.mkString(" "))
    }

  private def trainDf = (synth("abcde", "aru", 8) ++
    synth("fghij", "bel", 8, 100) ++ synth("klmno", "cym", 8, 200))
    .toDF("doc_id", "lang", "text")

  private def heldOut = (synth("abcde", "aru", 4, 50) ++
    synth("fghij", "bel", 4, 150) ++ synth("klmno", "cym", 4, 250))
    .toDF("doc_id", "lang", "text")

  /** Independent re-derivation of the documented char-gram feature
    * stream (hash parity through Spark's xxhash64; arithmetic mirrored
    * from the scaladoc, not the implementation). */
  private def refGrams(docs: DataFrame, order: Int, dim: Int,
      maxChars: Int): Map[Long, Seq[(Long, Long)]] =
    docs.select(col("doc_id"), substring(col("text"), 1, maxChars).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("doc_id"), col("_t"),
        explode(sequence(lit(1), least(lit(order), length(col("_t")))))
          .as("n"))
      .select(col("doc_id"), col("n"),
        explode(sequence(col("n"), length(col("_t")))).as("p"),
        col("_t"))
      .select(col("doc_id"),
        (col("p").cast("long") * (order + 1) + col("n")).as("key"),
        pmod(xxhash64(col("n").cast("int"),
          substring(col("_t"), (col("p") - col("n") + lit(1)).cast("int"),
            col("n").cast("int"))), lit(dim.toLong)).as("feature"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSeq.sortBy(_._1)).toMap

  /** Single-node NB reference over a collected model frame. */
  private def refScores(model: DataFrame,
      grams: Map[Long, Seq[(Long, Long)]], alpha: Double, dim: Int)
      : Map[Long, (Map[String, Double], String)] = {
    val rows = model.select(col("feature").cast("long"), col("lang"),
      col("cnt").cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = rows.filter(_._1 == -1L).map(r => r._2 -> r._3).toMap
    val docsC = rows.filter(_._1 == -2L).map(r => r._2 -> r._3).toMap
    val classes = totals.keySet.toSeq.sorted
    val nDocs = docsC.values.sum.toDouble
    val cnts = rows.filter(_._1 >= 0)
      .map(r => (r._1, r._2) -> r._3).toMap
    val present = rows.filter(_._1 >= 0).map(_._1).toSet
    grams.map { case (id, gs) =>
      val matched = gs.filter(g => present(g._2))
      val scores = classes.map { c =>
        var s = math.log(docsC(c).toDouble) - math.log(nDocs)
        for ((_, f) <- matched)
          s += math.log(cnts.getOrElse((f, c), 0L).toDouble + alpha)
        s += (gs.length - matched.length) * math.log(alpha)
        s -= gs.length * math.log(totals(c).toDouble + alpha * dim)
        c -> s
      }.toMap
      // strict-improve over the sorted list: first max wins
      val pred = classes.find(c => scores(c) == classes.map(scores).max).get
      id -> (scores, pred)
    }
  }

  test("scores match a single-node NB reference (incl. pruning) at 1e-9") {
    for (minCount <- Seq(1L, 2L)) {
      val dim = 1 << 14
      val model = LangIdClassifier.train(trainDf, dim = dim, order = 2,
        maxChars = 100, minCount = minCount)
      val got = LangIdClassifier.score(heldOut, model)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Map[String, Double]]("scores"), r.getString(2))).toMap
      val expect = refScores(model, refGrams(heldOut, 2, dim, 100), 1.0, dim)
      assert(got.keySet === expect.keySet)
      for ((id, (scores, pred)) <- expect) {
        assert(got(id)._2 === pred, s"doc $id pred (minCount=$minCount)")
        for ((c, v) <- scores)
          assert(math.abs(got(id)._1(c) - v) < 1e-9,
            s"doc $id class $c: got ${got(id)._1(c)}, want $v")
      }
    }
  }

  test("disjoint-alphabet languages classify held-out docs perfectly") {
    val model = LangIdClassifier.train(trainDf, dim = 1 << 14, order = 3,
      maxChars = 500)
    val preds = LangIdClassifier.score(heldOut, model)
      .join(heldOut, Seq("doc_id"))
      .select(col("lang"), col("lang_pred")).collect()
    assert(preds.nonEmpty)
    assert(preds.forall(r => r.getString(0) == r.getString(1)),
      preds.filter(r => r.getString(0) != r.getString(1)).mkString(", "))
  }

  test("all-unseen text ties exactly and resolves to the smallest class") {
    // mirrored classes: same doc count, same lengths => equal priors
    // and denominators; a doc of chars neither class saw matches no
    // feature, so every class scores identically — the pinned tie rule
    // must pick the lexicographically smallest label
    val sym = Seq((0L, "bb", "xxxx"), (1L, "aa", "yyyy"))
      .toDF("doc_id", "lang", "text")
    val model = LangIdClassifier.train(sym, dim = 1 << 16, order = 2,
      maxChars = 100)
    val row = LangIdClassifier.score(
      Seq((9L, "zzzz")).toDF("doc_id", "text"), model).head()
    val scores = row.getAs[Map[String, Double]]("scores")
    assert(scores("aa") === scores("bb"))
    assert(row.getString(2) === "aa")
  }

  test("scores are layout- and join-strategy-invariant bit-exactly") {
    val model = LangIdClassifier.train(trainDf, dim = 1 << 14)
    def run(docs: DataFrame, bc: Boolean) =
      LangIdClassifier.score(docs, model, broadcastModel = bc)
        .collect().map(r => r.getLong(0) ->
          (r.getString(2), r.getAs[Map[String, Double]]("scores"))).toMap
    val base = run(heldOut, bc = true)
    assert(run(heldOut.repartition(7), bc = true) === base)
    assert(run(heldOut, bc = false) === base)
  }

  test("truncation bound: the model's maxChars decides what scores") {
    // prefix says "aru", long suffix says "bel" — a short-maxChars
    // model never sees the suffix (langid needs only a prefix; the
    // truncation IS the fold bound)
    val doc = Seq((7L, "abcde " * 2 + "fghij " * 40)).toDF("doc_id", "text")
    val shortM = LangIdClassifier.train(trainDf, dim = 1 << 14,
      maxChars = 12)
    val longM = LangIdClassifier.train(trainDf, dim = 1 << 14,
      maxChars = 2000)
    assert(LangIdClassifier.score(doc, shortM).head().getString(2) === "aru")
    assert(LangIdClassifier.score(doc, longM).head().getString(2) === "bel")
  }

  test("real-table smoke: every non-empty doc gets a prediction from the class set") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val model = LangIdClassifier.train(docs, dim = 1 << 14, order = 2,
      maxChars = 300)
    val scored = LangIdClassifier.score(docs, model)
    val classes = docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val n = docs.filter(length(col("text")) > 0).count()
    assert(scored.count() === n)
    assert(scored.select("lang_pred").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(classes))
  }

  test("artifact round-trip; wrong-kind load refused") {
    val model = LangIdClassifier.train(trainDf, dim = 1 << 14)
    val dir = java.nio.file.Files.createTempDirectory("langid-art").toString
    LangIdClassifier.save(model, dir)
    val loaded = LangIdClassifier.load(spark, dir)
    val a = LangIdClassifier.score(heldOut, model).collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    val b = LangIdClassifier.score(heldOut, loaded).collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(a === b)
    val other = java.nio.file.Files.createTempDirectory("langid-kind").toString
    ModelStore.writeMeta(spark, other, Seq(
      "version" -> "1", "kind" -> "bloom_filter", "gen" -> "0"))
    val e = intercept[IllegalArgumentException] {
      LangIdClassifier.load(spark, other) }
    assert(e.getMessage.contains("nb_langid"))
  }

  test("guards: one class, null labels, class-count cap, parameter bounds") {
    val one = synth("abcde", "aru", 4).toDF("doc_id", "lang", "text")
    val eOne = intercept[IllegalArgumentException] {
      LangIdClassifier.train(one) }
    assert(eOne.getMessage.contains("2 classes"))
    val withNull = trainDf.select(col("doc_id"),
      when(col("doc_id") === 1, lit(null)).otherwise(col("lang")).as("lang"),
      col("text"))
    assert(intercept[IllegalArgumentException] {
      LangIdClassifier.train(withNull) }.getMessage.contains("null"))
    val many = spark.range(300)
      .select(col("id").as("doc_id"), concat(lit("l"), col("id")).as("lang"),
        lit("abc def").as("text"))
    assert(intercept[IllegalArgumentException] {
      LangIdClassifier.train(many) }.getMessage.contains("MaxClasses"))
    intercept[IllegalArgumentException] {
      LangIdClassifier.train(trainDf, dim = 1) }
    intercept[IllegalArgumentException] {
      LangIdClassifier.train(trainDf, order = 0) }
    intercept[IllegalArgumentException] {
      LangIdClassifier.score(heldOut,
        LangIdClassifier.train(trainDf), alpha = 0.0) }
  }

  test("no single-partition exchange in train or score plans") {
    val model = LangIdClassifier.train(trainDf, dim = 1 << 14)
    val mp = model.queryExecution.executedPlan.toString
    assert(!mp.contains("Exchange SinglePartition"), mp)
    val sp = LangIdClassifier.score(heldOut, model)
      .queryExecution.executedPlan.toString
    assert(!sp.contains("Exchange SinglePartition"), sp)
  }
}
