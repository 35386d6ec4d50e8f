package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The n-gram LM must be an exact distributed re-expression of the
  * published count-table + stupid-backoff recipe: counts match a
  * single-node reference for every order, per-document scores match a
  * single-node backoff walk, pruning never breaks the backoff chain,
  * and the scoring is layout- and join-strategy-independent. The
  * filter property itself is asserted where it is mathematically
  * guaranteed: the backoff floor is the strict per-token minimum, so
  * an all-out-of-vocabulary document must out-ppl every in-domain one.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val S = "\u0001"
  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 150).select("doc_id", "text").cache()

  private def refWords(t: String): Vector[String] =
    t.split(" ").filter(_.nonEmpty).toVector

  /** The single-node stupid-backoff walk (the reference both the score
    * and scoreChunked specs pin against): penalty counts ACTUAL backoff
    * steps from the position's maximum expressible order kMax =
    * min(order, p+1) — the KenLM start-of-document convention. */
  private def refScoreWalk(mm: Map[(Int, String), Long], total: Long,
      order: Int, alpha: Double)(w: Vector[String]): Double = {
    var s = 0.0
    for (p <- w.indices) {
      val kMax = math.min(order, p + 1)
      var k = kMax; var v = Double.NaN
      while (v.isNaN && k >= 1) {
        mm.get((k, w.slice(p - k + 1, p + 1).mkString(S))) match {
          case Some(c) =>
            val ctx = if (k > 1) mm((k - 1, w.slice(p - k + 1, p).mkString(S))).toDouble
                      else total.toDouble
            v = (kMax - k) * math.log(alpha) + math.log(c.toDouble) - math.log(ctx)
          case None => k -= 1
        }
      }
      if (v.isNaN)
        v = (kMax - 1) * math.log(alpha) + math.log(1.0 / (total.toDouble + 1.0))
      s += v
    }
    s
  }

  test("train: counts match the single-node reference for every order, plus the total row") {
    val order = 3
    val model = NgramLm.train(docs, order).cache()
    val texts = docs.select("text").as[String].collect()
    val ref = scala.collection.mutable.Map.empty[(Int, String), Long]
      .withDefaultValue(0L)
    var total = 0L
    texts.foreach { t =>
      val w = refWords(t); total += w.length
      for (n <- 1 to order; p <- (n - 1) until w.length)
        ref((n, w.slice(p - n + 1, p + 1).mkString(S))) += 1L
    }
    val got = model.filter(col("n") > 0)
      .select("n", "gram", "cnt").as[(Int, String, Long)].collect()
    assert(got.length === ref.size)
    got.foreach { case (n, g, c) => assert(ref((n, g)) === c, s"($n, $g)") }
    assert(model.filter(col("n") === 0).select("cnt").as[Long].head() === total)
  }

  test("score: per-doc log-prob matches the single-node stupid-backoff walk; all-OOV junk out-ppls every in-domain doc") {
    val order = 3; val alpha = 0.4
    val model = NgramLm.train(docs, order).cache()
    val mm = model.filter(col("n") > 0)
      .select("n", "gram", "cnt").as[(Int, String, Long)].collect()
      .map { case (n, g, c) => (n, g) -> c }.toMap
    val total = model.filter(col("n") === 0).select("cnt").as[Long].head()
    val refScore = refScoreWalk(mm, total, order, alpha) _
    val got = NgramLm.score(docs, model, alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "ppl")
      .as[(Long, Long, Double, Double)].collect()
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length === texts.count { case (_, t) => refWords(t).nonEmpty })
    got.foreach { case (id, n, lp, ppl) =>
      val w = refWords(texts(id))
      assert(n === w.length.toLong, s"doc $id token count")
      val rlp = refScore(w)
      assert(math.abs(lp - rlp) <= 1e-9 * math.max(1.0, math.abs(rlp)),
        s"doc $id: $lp vs reference $rlp")
      assert(math.abs(ppl - math.exp(-lp / n)) <= 1e-9 * ppl, s"doc $id ppl")
    }
    // the floor is the strict per-token minimum (any matched unigram
    // scores ln(c/total) > ln(1/(total+1))), so the all-OOV doc's ppl
    // strictly dominates every in-domain doc's — the filter property
    val junk = Seq((900001L, "zxqv wvut qqqz zxqv mmmw qqqz"))
      .toDF("doc_id", "text")
    val junkPpl = NgramLm.score(junk, model, alpha = alpha)
      .select("ppl").as[Double].head()
    assert(got.map(_._4).forall(_ < junkPpl),
      s"junk ppl $junkPpl does not dominate in-domain")
  }

  test("minCount pruning keeps the model closed under prefixes and scores total") {
    val model = NgramLm.train(docs, 3, minCount = 3L).cache()
    // closure: every surviving n>1 gram's backoff context survives too
    val kept = model.filter(col("n") > 0)
      .select("n", "gram").as[(Int, String)].collect()
    val set = kept.toSet
    kept.filter(_._1 > 1).foreach { case (n, g) =>
      val parts = g.split(S)
      assert(set((n - 1, parts.dropRight(1).mkString(S))),
        s"pruned context of surviving gram ($n, $g)")
    }
    val scored = NgramLm.score(docs, model)
    assert(scored.filter(col("ppl").isNull || isnan(col("ppl")) ||
      col("ppl") <= 0.0).count() === 0L)
    assert(scored.count() > 0L)
  }

  test("score is layout-independent and identical under the shuffle-join fallback") {
    val model = NgramLm.train(docs, 2)
    val a = NgramLm.score(docs, model)
      .select("doc_id", "log_prob").as[(Long, Double)].collect().sortBy(_._1)
    val b = NgramLm.score(docs.repartition(7), model, broadcastModel = false)
      .select("doc_id", "log_prob").as[(Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("plan audit: train partial-aggregates below its one shuffle; score broadcasts the model and never single-partitions") {
    val model = NgramLm.train(docs, 3)
    val tp = model.queryExecution.executedPlan.toString
    // the gram count must collapse repeats map-side: the shuffle
    // carries vocabulary rows, not the order-exploded token stream
    val ex = tp.indexOf("Exchange hashpartitioning")
    val partial = tp.lastIndexOf("HashAggregate")
    assert(ex >= 0 && partial > ex,
      s"no partial aggregate below the gram-count shuffle:\n$tp")
    assert(!tp.contains("Exchange SinglePartition"), tp)
    val sp = NgramLm.score(docs, model).queryExecution.executedPlan.toString
    assert(sp.contains("BroadcastHashJoin"), s"model join did not broadcast:\n$sp")
    assert(!sp.contains("Exchange SinglePartition"), s"global stage in score:\n$sp")
  }

  test("guards: order/alpha/minCount bounds, non-model frame, empty corpus") {
    intercept[IllegalArgumentException] { NgramLm.train(docs, 0) }
    intercept[IllegalArgumentException] { NgramLm.train(docs, 9) }
    intercept[IllegalArgumentException] { NgramLm.train(docs, 3, minCount = 0L) }
    intercept[IllegalArgumentException] {
      NgramLm.train(docs.filter(lit(false)), 2)
    }
    val model = NgramLm.train(docs, 2)
    intercept[IllegalArgumentException] {
      NgramLm.score(docs, model, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      NgramLm.score(docs, model.filter(col("n") > 0)) // total row missing
    }
  }

  test("score fails loudly on documents beyond maxDocTokens, naming the offender") {
    val model = NgramLm.train(docs, 2).cache()
    val long = Seq((1L, ("w " * 40).trim), (2L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NgramLm.score(long, model, maxDocTokens = 30L)
    }
    assert(e.getMessage.contains("maxDocTokens") && e.getMessage.contains("1"))
    // at the default cap the same frame scores fine
    assert(NgramLm.score(long, model).count() === 2L)
  }

  test("scoreChunked: identical to score when nothing chunks; exact per-chunk-walk parity and conservation when it does") {
    val order = 3; val alpha = 0.4
    val model = NgramLm.train(docs, order).cache()
    // no document reaches the default chunk size -> zero boundaries ->
    // bit-identical to the whole-doc scorer, ppl included
    val whole = NgramLm.score(docs, model, alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "avg_log_prob", "ppl")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val unchunked = NgramLm.scoreChunked(docs, model, alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "avg_log_prob", "ppl")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(unchunked.toSeq === whole.toSeq,
      "chunkTokens >= max doc length must be bit-identical to score")

    // small chunks: every doc's log_prob must equal the single-node
    // backoff walk run over each disjoint 7-word chunk independently —
    // the context-reset semantics, pinned exactly
    val mm = model.filter(col("n") > 0)
      .select("n", "gram", "cnt").as[(Int, String, Long)].collect()
      .map { case (n, g, c) => (n, g) -> c }.toMap
    val total = model.filter(col("n") === 0).select("cnt").as[Long].head()
    val walk = refScoreWalk(mm, total, order, alpha) _
    val chunkT = 7
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val expect = texts.flatMap { case (id, t) =>
      val w = refWords(t)
      if (w.isEmpty) None
      else Some(id -> w.grouped(chunkT).map(c => walk(c.toVector)).sum)
    }
    val got = NgramLm.scoreChunked(docs, model, chunkTokens = chunkT,
        alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "ppl")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === expect.size)
    got.foreach { case (id, n, lp, ppl) =>
      assert(n === refWords(texts(id)).length.toLong, s"doc $id conservation")
      val rlp = expect(id)
      assert(math.abs(lp - rlp) <= 1e-9 * math.max(1.0, math.abs(rlp)),
        s"doc $id: $lp vs per-chunk walk $rlp")
      assert(math.abs(ppl - math.exp(-lp / n)) <= 1e-9 * ppl, s"doc $id ppl")
    }
    // a multi-chunk doc whose boundary token had longer context in the
    // whole-doc walk scores differently — the reset is real, documented
    val wholeMap = whole.map(r => r._1 -> r._3).toMap
    val diff = got.count { case (id, n, lp, _) =>
      n > chunkT && math.abs(lp - wholeMap(id)) > 1e-12 }
    assert(diff > 0, "some multi-chunk doc must feel the context reset")
    intercept[IllegalArgumentException] {
      NgramLm.scoreChunked(docs, model, chunkTokens = 0)
    }
  }

  test("scoreChunked scores documents past score's maxDocTokens guard, conserving tokens") {
    val model = NgramLm.train(docs, 2).cache()
    val long = Seq((1L, ("w " * 40).trim), (2L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      NgramLm.score(long, model, maxDocTokens = 30L)
    }
    // the chunked composition handles the same frame with a 10-word
    // bound on every aggregation buffer
    val out = NgramLm.scoreChunked(long, model, chunkTokens = 10)
      .select("doc_id", "n_tokens", "ppl").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq === Seq(1L -> 40L, 2L -> 3L))
    assert(out.forall(r => r._3 > 0.0 && !r._3.isNaN && !r._3.isInfinite))
  }

  test("trainFp: fingerprint counts are exactly the string counts under the rolling hash, injective on this corpus") {
    import org.apache.spark.sql.graft.RollingWindowFp.rollingFp
    val order = 3
    val model = NgramLm.train(docs, order).cache()
    val modelFp = NgramLm.trainFp(docs, order).cache()
    for (k <- 1 to order) {
      // map each string gram to its fingerprint THROUGH the shared
      // expression (an n-word gram has exactly one length-n window),
      // then the fp model must be that mapping row for row
      val viaString = model.filter(col("n") === k)
        .select(element_at(rollingFp(split(col("gram"), S), k), 1).as("fp"),
          col("cnt"))
        .as[(Long, Long)].collect().sorted
      val direct = modelFp.filter(col("n") === k)
        .select("fp", "cnt").as[(Long, Long)].collect().sorted
      // equal cardinality of distinct grams and distinct fps IS the
      // injectivity premise the bit-exact score parity rests on
      assert(viaString.map(_._1).distinct.length === viaString.length,
        s"order $k: fingerprint collision among real grams")
      assert(direct.toSeq === viaString.toSeq, s"order $k count table")
    }
    // the metadata row carries the same total under fp=0
    assert(modelFp.filter(col("n") === 0).select("cnt").as[Long].head() ===
      model.filter(col("n") === 0).select("cnt").as[Long].head())
  }

  test("scoreFp: bit-identical to score on the real corpus; layout/shuffle-join invariant; plan broadcasts without single-partition stages") {
    val order = 3; val alpha = 0.4
    val model = NgramLm.train(docs, order).cache()
    val modelFp = NgramLm.trainFp(docs, order).cache()
    val a = NgramLm.score(docs, model, alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "avg_log_prob", "ppl")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val b = NgramLm.scoreFp(docs, modelFp, alpha = alpha)
      .select("doc_id", "n_tokens", "log_prob", "avg_log_prob", "ppl")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    // same counts reach the same shared chain -> identical doubles
    assert(b.toSeq === a.toSeq, "fp path diverged from the string path")
    val c = NgramLm.scoreFp(docs.repartition(7), modelFp, alpha = alpha,
        broadcastModel = false)
      .select("doc_id", "n_tokens", "log_prob", "avg_log_prob", "ppl")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(c.toSeq === a.toSeq, "fp path layout/join-strategy variant")
    val sp = NgramLm.scoreFp(docs, modelFp).queryExecution.executedPlan.toString
    assert(sp.contains("BroadcastHashJoin"), s"fp model join did not broadcast:\n$sp")
    assert(!sp.contains("Exchange SinglePartition"), s"global stage in scoreFp:\n$sp")
  }

  test("fp artifact round-trip: save/load scores identically from the committed generation; key kinds cannot cross") {
    def tmpDir(p: String): String =
      java.nio.file.Files.createTempDirectory(p).resolve("art").toString
    val dir = tmpDir("ngramfp")
    val modelFp = NgramLm.trainFp(docs, 2).cache()
    NgramLm.save(modelFp, dir)
    val loaded = NgramLm.load(spark, dir)
    val a = NgramLm.scoreFp(docs, modelFp)
      .select("doc_id", "log_prob").as[(Long, Double)].collect().sortBy(_._1)
    val b = NgramLm.scoreFp(docs, loaded)
      .select("doc_id", "log_prob").as[(Long, Double)].collect().sortBy(_._1)
    assert(b.toSeq === a.toSeq)
    // the wrong scorer for a key representation fails loudly by name
    val e1 = intercept[IllegalArgumentException] { NgramLm.score(docs, loaded) }
    assert(e1.getMessage.contains("scoreFp"))
    val dirS = tmpDir("ngramstr")
    NgramLm.save(NgramLm.train(docs, 2), dirS)
    val e2 = intercept[IllegalArgumentException] {
      NgramLm.scoreFp(docs, NgramLm.load(spark, dirS))
    }
    assert(e2.getMessage.contains("score"))
  }

  test("doc-start positions are not charged phantom backoff: a bigram-opening doc scores its first token at zero penalty") {
    // train where "alpha beta" is frequent; score a doc STARTING with
    // a seen unigram: position 0 has kMax = 1, so a unigram match must
    // carry NO alpha penalty under the KenLM-style convention
    val train = Seq((1L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val model = NgramLm.train(train, 3).cache()
    val one = Seq((10L, "alpha")).toDF("doc_id", "text")
    val lp = NgramLm.score(one, model).select("log_prob").as[Double].head()
    // cnt(alpha) = 2, total = 5 — exactly log(2/5), no alpha factor
    assert(math.abs(lp - math.log(2.0 / 5.0)) <= 1e-12, s"got $lp")
  }
}
