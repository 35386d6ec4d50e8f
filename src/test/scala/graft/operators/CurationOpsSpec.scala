package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mixture is data, not a naming convention: [[CurationOps.mixtureSample]]
  * must work on source names of any shape, keep each source at exactly its
  * declared per-mille rate under the portable md5-bucket hash, and treat
  * undeclared sources by the caller's default — fail-closed unless told
  * otherwise. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // nothing `srcN` about these names — the round-7 implementation parsed
  // substring(source, 4) as an int and silently fell to the 12.5% band on
  // any other shape; the operator now takes the rate from the table
  private def docs = Seq.tabulate(400) { i =>
    val src = Seq("wikipedia", "common-crawl", "books", "unlisted")(i % 4)
    (i.toLong, src, 100L + i)
  }.toDF("doc_id", "source", "n_chars")

  private def mixture = Seq(
    ("wikipedia", 1000L), ("common-crawl", 250L), ("books", 500L))
    .toDF("source", "keep_per_mille")

  // the E9/E15 portable-hash keep decision, recomputed independently
  private def expectedKeep(docId: Long, perMille: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 1000 < perMille
  }

  test("keeps each source at exactly its declared rate; undeclared sources fail closed") {
    val got = CurationOps.mixtureSample(docs, mixture)
      .select("doc_id", "source", "keep")
      .as[(Long, String, Boolean)].collect()
      .map { case (id, src, keep) => id -> ((src, keep)) }.toMap
    assert(got.size === 400)
    got.foreach { case (id, (src, keep)) =>
      val rate = Map("wikipedia" -> 1000L, "common-crawl" -> 250L,
        "books" -> 500L).getOrElse(src, 0L)
      assert(keep === expectedKeep(id, rate),
        s"doc $id from $src: keep=$keep at rate $rate")
    }
    // a 100% source keeps everything, an undeclared one keeps nothing
    assert(got.values.count { case (s, k) => s == "wikipedia" && k } === 100)
    assert(got.values.count { case (s, k) => s == "unlisted" && k } === 0)
  }

  test("defaultPerMille opts undeclared sources back in at the given rate") {
    val kept = CurationOps.mixtureSample(docs, mixture, defaultPerMille = 1000L)
      .filter(col("source") === "unlisted" && col("keep"))
    assert(kept.count() === 100)
  }

  test("the mixture join is a broadcast, and the plan has no shuffle") {
    val plan = CurationOps.mixtureSample(docs, mixture)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"mixture join not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mixtureSample must not shuffle the corpus:\n$plan")
  }

  test("rates above 1000 oversample: floor(rate/1000) copies plus the md5-bucket remainder") {
    val over = Seq(("wikipedia", 2500L), ("common-crawl", 250L), ("books", 1000L))
      .toDF("source", "keep_per_mille")
    val got = CurationOps.mixtureSample(docs, over)
      .select("doc_id", "source", "n_copies", "keep")
      .as[(Long, String, Long, Boolean)].collect()
    assert(got.length === 400)
    got.foreach { case (id, src, nCopies, keep) =>
      val rate = Map("wikipedia" -> 2500L, "common-crawl" -> 250L,
        "books" -> 1000L).getOrElse(src, 0L)
      val expected = rate / 1000 + (if (expectedKeep(id, rate % 1000)) 1L else 0L)
      assert(nCopies === expected, s"doc $id from $src at rate $rate")
      assert(keep === (expected > 0))
    }
    // every wikipedia doc appears at least twice; some clear the 500‰ extra
    val wiki = got.filter(_._2 == "wikipedia").map(_._3)
    assert(wiki.forall(_ >= 2) && wiki.exists(_ == 3L) && wiki.exists(_ == 2L))
  }

  test("mixtureRepeat materializes the copies as (doc, epoch) rows, shuffle-free") {
    val over = Seq(("wikipedia", 2500L), ("books", 500L))
      .toDF("source", "keep_per_mille")
    val repeated = CurationOps.mixtureRepeat(docs, over)
    // realized copy counts track the declared plan exactly
    val byDoc = repeated.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val sample = CurationOps.mixtureSample(docs, over)
      .filter(col("n_copies") > 0).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(byDoc === sample, "realized copies diverged from n_copies")
    // epochs are 0..n_copies-1 per doc
    val epochs = repeated.groupBy("doc_id")
      .agg(sort_array(collect_list("epoch")).as("es"), count(lit(1)).as("n"))
      .as[(Long, Seq[Long], Long)].collect()
    epochs.foreach { case (id, es, n) =>
      assert(es === (0L until n), s"doc $id epochs $es") }
    // the fan-out is a per-row projection: no corpus shuffle
    val plan = repeated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mixtureRepeat must not shuffle the corpus:\n$plan")
  }

  test("mixtureRepeat qualifyMaxEpochs: ids become unique by construction, recoverable, and guarded") {
    val over = Seq(("wikipedia", 2500L), ("books", 500L))
      .toDF("source", "keep_per_mille")
    val plain = CurationOps.mixtureRepeat(docs, over)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    val q = CurationOps.mixtureRepeat(docs, over, qualifyMaxEpochs = 3)
      .select("doc_id", "epoch").as[(Long, Long)].collect()
    // unique by construction — the packSequences guard passes as-is
    assert(q.map(_._1).distinct.length === q.length)
    // original (id, epoch) recover as div/mod — same rows as unqualified
    assert(q.map { case (id, e) => (id / 3, id % 3) }.toSet === plain)
    q.foreach { case (id, e) => assert(id % 3 === e, s"qualified id $id") }
    // a recipe reaching epochs >= qualifyMaxEpochs fails loudly per row
    // (collect the id column — a count would let pruning skip the guard)
    val e = intercept[Exception] {
      CurationOps.mixtureRepeat(docs, over, qualifyMaxEpochs = 2)
        .select("doc_id").collect()
    }
    assert(e.getMessage.contains("qualifyMaxEpochs"))
    // a string id cannot qualify — fail at plan time, naming the fix
    val sdocs = docs.withColumn("doc_id", concat(lit("d"), col("doc_id")))
    val e2 = intercept[IllegalArgumentException] {
      CurationOps.mixtureRepeat(sdocs, over, qualifyMaxEpochs = 3)
    }
    assert(e2.getMessage.contains("integral"))
    // an id past the overflow bound fails loudly, never wraps
    val big = Seq((Long.MaxValue / 2, "wikipedia", 5L))
      .toDF("doc_id", "source", "n_chars")
    val e3 = intercept[Exception] {
      CurationOps.mixtureRepeat(big, over, qualifyMaxEpochs = 3)
        .select("doc_id").collect()
    }
    assert(e3.getMessage.contains("overflow"))
  }

  test("a mixture with duplicate source rows fails loudly, not silently duplicating docs") {
    val dup = Seq(("wikipedia", 1000L), ("wikipedia", 250L), ("books", 500L))
      .toDF("source", "keep_per_mille")
    val e = intercept[IllegalArgumentException] {
      CurationOps.mixtureSample(docs, dup).count()
    }
    assert(e.getMessage.contains("wikipedia"))
    val e2 = intercept[IllegalArgumentException] {
      CurationOps.planMixture(
        Seq(("a", 1000L)).toDF("source", "n_tokens"),
        Seq(("a", 1.0), ("a", 2.0)).toDF("source", "weight"), 100L)
    }
    assert(e2.getMessage.contains("unique on source"))
  }

  test("planMixture maxEpochs: a too-small curated source repeats before redistributing") {
    val stats = Seq(("a", 10000L), ("b", 100000L), ("c", 200000L))
      .toDF("source", "n_tokens")
    val weights = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("source", "weight")
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 100000L,
      maxEpochs = 3)
    val rates = plan.as[(String, Long)].collect().toMap
    // a's 50k share exceeds 3 passes of its 10k — capped at 3000‰; the
    // unmet 20k redistributes 3:2 over b and c
    assert(rates === Map("a" -> 3000L, "b" -> 420L, "c" -> 140L))
    val expected = Map("a" -> 10000L, "b" -> 100000L, "c" -> 200000L)
      .map { case (s, avail) => avail * rates(s) / 1000 }.sum
    assert(expected === 100000L)
    // and the plan feeds the sampler: an oversampled source realizes
    // ~3 copies per doc end-to-end
    val aDocs = Seq.tabulate(50)(i => (i.toLong, "a", 100L))
      .toDF("doc_id", "source", "n_chars")
    val realized = CurationOps.mixtureRepeat(aDocs, plan).count()
    assert(realized === 150L, s"50 docs at 3000 per mille must emit 150 rows")
  }

  test("sampleFixedK: exactly min(k, group size) per group, layout-invariant members") {
    val k = 7
    val sample = CurationOps.sampleFixedK(docs, k)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // 100 docs per source, k = 7 -> exactly 7 each
    assert(sample.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("wikipedia" -> k, "common-crawl" -> k, "books" -> k, "unlisted" -> k))
    // a group smaller than k yields the whole group
    val tiny = docs.filter(col("doc_id") < 8)
    assert(CurationOps.sampleFixedK(tiny, k).count() === tiny.count())
    // the selected set is a function of the DATA, not the layout
    val relaid = CurationOps.sampleFixedK(docs.repartition(7), k)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(relaid === sample)
  }

  test("planMixture: uncapped rates split the target by weight exactly") {
    val stats = Seq(("a", 100000L), ("b", 100000L), ("c", 200000L))
      .toDF("source", "n_tokens")
    val weights = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("source", "weight")
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 100000L)
      .as[(String, Long)].collect().toMap
    assert(plan === Map("a" -> 500L, "b" -> 300L, "c" -> 100L))
  }

  test("planMixture water-fills: a too-small source caps at 1000 and its share redistributes") {
    val stats = Seq(("a", 10000L), ("b", 100000L), ("c", 200000L))
      .toDF("source", "n_tokens")
    val weights = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("source", "weight")
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 100000L)
      .as[(String, Long)].collect().toMap
    // a gives all 10k; the unmet 40k redistributes 3:2 over b and c
    assert(plan("a") === 1000L)
    assert(plan("b") === 540L) // (30k + 24k) / 100k
    assert(plan("c") === 180L) // (20k + 16k) / 200k
    // planned expected tokens re-sum to the target
    val expected = Map("a" -> 10000L, "b" -> 100000L, "c" -> 200000L)
      .map { case (s, avail) => avail * plan(s) / 1000 }.sum
    assert(expected === 100000L)
  }

  test("planMixture on an infeasible target keeps everything; unweighted sources get no row") {
    val stats = Seq(("a", 1000L), ("b", 2000L), ("zz", 99999L))
      .toDF("source", "n_tokens")
    val weights = Seq(("a", 1.0), ("b", 1.0)).toDF("source", "weight")
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 100000L)
      .as[(String, Long)].collect().toMap
    assert(plan === Map("a" -> 1000L, "b" -> 1000L)) // no zz row: fail-closed downstream
  }

  test("planMixture composes with mixtureSample: realized kept counts track the plan") {
    // docs: 100 per source, ~101 tokens each (n_chars stands in for tokens)
    val stats = docs.groupBy("source").agg(count(lit(1)).multiply(100).as("n_tokens"))
    val weights = Seq(("wikipedia", 0.6), ("books", 0.4)).toDF("source", "weight")
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 5000L)
    val kept = CurationOps.mixtureSample(docs, plan)
      .filter(col("keep")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // rates are 300 and 200 per mille over 100 docs each; the md5 bucket
    // draw is deterministic, so these are fixed counts — near expectation
    val rates = plan.as[(String, Long)].collect().toMap
    assert(rates === Map("wikipedia" -> 300L, "books" -> 200L))
    assert(kept.keySet === Set("wikipedia", "books")) // others fail closed
    assert((kept("wikipedia") - 30L).abs <= 10, s"got $kept")
    assert((kept("books") - 20L).abs <= 10, s"got $kept")
  }

  test("temperatureWeights: α=1 is proportional, smaller α flattens toward uniform, end-to-end through planMixture") {
    val stats = Seq(("big", 90000L), ("small", 10000L)).toDF("source", "n_tokens")
    // α = 1: weights ARE the token counts — planMixture splits the
    // target proportionally (every token equally likely)
    val prop = CurationOps.planMixture(stats,
      CurationOps.temperatureWeights(stats, 1.0), targetTokens = 10000L)
      .as[(String, Long)].collect().toMap
    assert(prop === Map("big" -> 100L, "small" -> 100L))
    // α = 0.5: w = (300, 100) — the small source's share rises from
    // 10% to 25%: share_small = 2500 of 10000 → rate 250‰, share_big =
    // 7500 of 90000 → 83‰ (floored)
    val flat = CurationOps.planMixture(stats,
      CurationOps.temperatureWeights(stats, 0.5), targetTokens = 10000L)
      .as[(String, Long)].collect().toMap
    assert(flat === Map("big" -> 83L, "small" -> 250L))
    assert(flat("small") > prop("small") && flat("big") < prop("big"),
      "lower α must shift share toward the low-resource source")
    intercept[IllegalArgumentException] {
      CurationOps.temperatureWeights(stats, 0.0)
    }
    intercept[IllegalArgumentException] {
      CurationOps.temperatureWeights(stats, 1.5)
    }
  }

  test("sampleFixedK grows stably: new docs only swap in by beating an incumbent") {
    val k = 5
    val old = docs.filter(col("doc_id") < 200)
    val oldSample = CurationOps.sampleFixedK(old, k)
      .select("doc_id").as[Long].collect().toSet
    val unionSample = CurationOps.sampleFixedK(docs, k)
      .select("doc_id").as[Long].collect().toSet
    // survivors from the old corpus were already in the old sample —
    // growth never promotes a previously-rejected old document
    assert(unionSample.filter(_ < 200).subsetOf(oldSample))
  }

  test("selectByBudget: greedy by (score desc, id asc), boundary doc " +
    "excluded, running totals exact") {
    val docs = Seq(
      (1L, 10.0, 300L), (2L, 50.0, 400L), (3L, 50.0, 500L),
      (4L, 90.0, 600L), (5L, 20.0, 100L))
      .toDF("doc_id", "score", "n_tok")
    // order: 4(600), 2(400 - tie 50 with 3, smaller id first), 3(500),
    // 5(100), 1(300); budget 1200 keeps 4+2 (1000) and EXCLUDES 3
    // (1000+500 > 1200) and everything after: PREFIX selection, not
    // knapsack - once the running total passes the budget, later docs
    // sit past it too
    val out = CurationOps.selectByBudget(docs, 1200L, "score", "n_tok")
      .select("doc_id", "cum_before", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(4L) == ((0L, true)))
    assert(out(2L) == ((600L, true)))
    assert(out(3L) == ((1000L, false)))
    assert(out(5L) == ((1500L, false)))
    assert(out(1L) == ((1600L, false)))
  }

  test("selectByBudget: a budget below the best doc keeps nothing; a " +
    "budget covering everything keeps all") {
    val docs = Seq((1L, 1.0, 50L), (2L, 2.0, 60L))
      .toDF("doc_id", "score", "n_tok")
    assert(CurationOps.selectByBudget(docs, 10L, "score", "n_tok")
      .filter(col("keep")).count() == 0L)
    assert(CurationOps.selectByBudget(docs, 1000L, "score", "n_tok")
      .filter(col("keep")).count() == 2L)
  }
}
