package graft.registry

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** G26 Write-Audit-Publish: every bound fires independently with
  * evidence, a healthy refresh passes, failures accumulate (never
  * first-only), and the drift bound fails closed when unscorable. */
class ReleaseGateSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Double)*) =
    rows.toDF("id", "text", "v")

  test("healthy refresh publishes with the evidence attached") {
    val old = snap((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0))
    val cur = snap((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d2", 4.0), (5L, "e", 5.0), (6L, "f", 3.5))
    val a = ReleaseGate.audit(old, cur, "id",
      maxChurnFrac = 0.5, maxRemovedFrac = 0.2,
      rules = Seq(Expectations.NotNull("text")),
      driftOn = Some("v"), maxPsi = 2.0)
    assert(a.publishable, a.failures.mkString("; "))
    assert(a.added === 1 && a.changed === 1 && a.unchanged === 4 &&
      a.removed === 0)
    assert(a.nOld === 5 && a.nCur === 6)
    assert(math.abs(a.churnFrac - 2.0 / 6) < 1e-15)
    assert(a.psi.exists(_ >= 0.0))
  }

  test("each bound fires independently and failures accumulate") {
    val old = snap((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0))
    // 2 of 4 removed, 1 changed, 1 added, and a null text row:
    // removals, churn, and the expectation all fail AT ONCE
    val cur = Seq((1L, Some("a"), 1.0), (2L, Some("B"), 2.0),
      (9L, Option.empty[String], 9.0)).toDF("id", "text", "v")
    val a = ReleaseGate.audit(old, cur, "id",
      maxChurnFrac = 0.25, maxRemovedFrac = 0.25,
      rules = Seq(Expectations.NotNull("text")))
    assert(!a.publishable)
    assert(a.failures.exists(_.contains("churn")), a.failures.toString)
    assert(a.failures.exists(_.contains("removals")), a.failures.toString)
    assert(a.failures.exists(_.contains("not_null(text)")), a.failures.toString)
    assert(a.failures.size === 3, s"all reasons, not the first: ${a.failures}")
    assert(a.removed === 2 && a.changed === 1 && a.added === 1)
    assert(a.removedFrac === 0.5)
  }

  test("drift bound: a shifted distribution blocks, inclusive bounds pass") {
    val old = snap((1 to 40).map(i => (i.toLong, "t", (i % 10).toDouble)): _*)
    val shifted = snap((1 to 40).map(i =>
      (i.toLong, "t", (i % 10) + 100.0)): _*)
    val a = ReleaseGate.audit(old, shifted, "id", compare = Seq("text"),
      maxChurnFrac = 1.0, maxRemovedFrac = 1.0,
      driftOn = Some("v"), maxPsi = 0.25)
    assert(!a.publishable)
    assert(a.failures.exists(_.contains("drift psi")), a.failures.toString)
    assert(a.psi.exists(_ > 0.25))

    // inclusive: exactly-at-the-bound churn publishes
    val cur = snap((1L, "x", 1.0), (2L, "b", 2.0)) // 1 changed of 2 = 0.5
    val old2 = snap((1L, "a", 1.0), (2L, "b", 2.0))
    val b = ReleaseGate.audit(old2, cur, "id", maxChurnFrac = 0.5,
      maxRemovedFrac = 0.0)
    assert(b.publishable, b.failures.mkString("; "))
  }

  test("fail-closed edges: empty candidate, unscorable drift column") {
    val old = snap((1L, "a", 1.0), (2L, "b", 2.0))
    val empty = snap().filter(lit(false))
    val a = ReleaseGate.audit(old, empty, "id")
    assert(!a.publishable && a.failures.exists(_.contains("empty")))

    // all-null drift column on the old side cannot freeze edges -> the
    // drift bound fails closed instead of throwing or silently passing
    val oldNull = Seq((1L, "a", Option.empty[Double]),
      (2L, "b", Option.empty[Double])).toDF("id", "text", "v")
    val curOk = Seq((1L, "a", Some(1.0)), (2L, "b", Some(2.0)))
      .toDF("id", "text", "v")
    val b = ReleaseGate.audit(oldNull, curOk, "id", compare = Seq("text"),
      maxChurnFrac = 1.0, driftOn = Some("v"))
    assert(!b.publishable &&
      b.failures.exists(_.contains("could not be scored")), b.failures.toString)
  }

  test("categorical bound: novel-category surge blocked, matching mix passes") {
    def roster(cats: Seq[String]) = cats.zipWithIndex
      .map { case (c, i) => (i.toLong, "t", c) }.toDF("id", "text", "cat")
    val old = roster(Seq("a", "a", "a", "b", "b"))
    val same = roster(Seq("a", "a", "a", "b", "b"))
    val ok = ReleaseGate.audit(old, same, "id", compare = Seq("text"),
      maxChurnFrac = 1.0, catDriftOn = Some("cat"),
      maxCatPsi = 0.25, maxNovelFrac = 0.1)
    assert(ok.publishable, ok.failures.mkString("; "))
    assert(ok.catPsi === Some(0.0) && ok.novelFrac === Some(0.0))

    // 40% of cur rows carry a category old never saw
    val surged = roster(Seq("a", "a", "z", "z", "b"))
    val bad = ReleaseGate.audit(old, surged, "id", compare = Seq("text"),
      maxChurnFrac = 1.0, catDriftOn = Some("cat"),
      maxCatPsi = 10.0, maxNovelFrac = 0.1) // psi bound slack: isolate novel
    assert(!bad.publishable)
    assert(bad.failures.exists(_.contains("novel-category mass")),
      bad.failures.toString)
    assert(bad.novelFrac === Some(0.4))

    // an empty cur side fails the categorical bound closed too
    val empty = roster(Seq())
    val closed = ReleaseGate.audit(old, empty, "id", compare = Seq("text"),
      catDriftOn = Some("cat"))
    assert(closed.failures.exists(_.contains("categorical drift bound")) ||
      closed.failures.exists(_.contains("empty")), closed.failures.toString)
  }

  test("real corpus: a 5%-edit refresh publishes, a broken extractor is caught") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"),
      length(col("text")).cast("double").as("len"))
    val refresh = docs.withColumn("text",
      when(col("doc_id") % 20 === 0, concat(col("text"), lit(" [rev]")))
        .otherwise(col("text")))
    val ok = ReleaseGate.audit(docs, refresh, "doc_id",
      compare = Seq("text"), maxChurnFrac = 0.10, maxRemovedFrac = 0.01,
      rules = Seq(Expectations.NotNull("text")),
      driftOn = Some("len"), maxPsi = 0.1)
    assert(ok.publishable, ok.failures.mkString("; "))

    // the incident: 40% of the corpus silently vanished
    val broken = docs.filter(col("doc_id") % 5 > 1)
    val bad = ReleaseGate.audit(docs, broken, "doc_id",
      compare = Seq("text"), maxRemovedFrac = 0.05)
    assert(!bad.publishable && bad.failures.exists(_.contains("removals")))
  }

  test("embedding bound: an unmoved embedding column passes; a biased " +
    "refresh blocks with the measured psi/shift; unscorable fails closed") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding"),
        lit("t").as("text"))
    val same = ReleaseGate.audit(emb, emb, "id", compare = Seq("text"),
      embOn = Some("embedding"), embNlist = 8)
    assert(same.publishable, same.failures.toString)
    assert(same.embPsi.contains(0.0))
    val biased = emb.withColumn("embedding",
      expr("transform(embedding, x -> x + 0.5f)"))
    val a = ReleaseGate.audit(emb, biased, "id", compare = Seq("text"),
      maxChurnFrac = 1.0, // isolate the embedding bound
      embOn = Some("embedding"), embNlist = 8,
      maxEmbPsi = 0.25, maxEmbShift = 0.05)
    assert(!a.publishable)
    assert(a.failures.exists(_.contains("embedding")), a.failures.toString)
    assert(a.embPsi.exists(_ > 0.25) || a.embShift.exists(_ > 0.05),
      s"${a.embPsi} / ${a.embShift}")
    // unscorable: a non-embedding column fails closed, never passes
    val bad = ReleaseGate.audit(emb, emb, "id", compare = Seq("text"),
      embOn = Some("text"), embNlist = 8)
    assert(!bad.publishable)
    assert(bad.failures.exists(_.contains("could not be scored")),
      bad.failures.toString)
  }
}
