package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Span-duplication coverage must be exact interval arithmetic over
  * exactly the spans a single-node count of the corpus would flag:
  * constructed cases pin the union/overlap/short-doc/empty-doc edges,
  * a brute-force reference pins the whole table, and the plan must
  * partial-aggregate the fingerprint count and never single-partition.
  */
class SpanDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 200).select("doc_id", "text").cache()

  test("constructed duplicates: exact coverage, overlap union, intra-doc repeats, short and empty docs") {
    val d = Seq(
      (1L, "a b c d e x y z"),
      (2L, "q q q a b c d e"),
      (3L, "totally unique words here indeed"),
      (4L, "tiny doc"),
      (5L, ""),
      (6L, "m n o p m n o p")
    ).toDF("doc_id", "text")
    val got = SpanDup.spanDupStats(d, window = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 6, "every input doc must appear")
    // docs 1/2 share the 5-word span "a b c d e": three flagged
    // 3-windows each, overlapping into 5 covered tokens of 8
    assert(got(1L) === ((1L, 8L, 3L, 5L, 5.0 / 8)))
    assert(got(2L) === ((2L, 8L, 3L, 5L, 5.0 / 8)))
    // doc 6 repeats "m n o p" WITHIN itself: starts 0,1,4,5 union to
    // full coverage — intra-doc duplication counts, as in the paper
    assert(got(6L) === ((6L, 8L, 4L, 8L, 1.0)))
    assert(got(3L) === ((3L, 5L, 0L, 0L, 0.0)))
    assert(got(4L) === ((4L, 2L, 0L, 0L, 0.0)))
    assert(got(5L) === ((5L, 0L, 0L, 0L, 0.0)))
  }

  test("matches the single-node reference on the real table (plus seeded duplicates), any layout") {
    val window = 8
    val seeded = docs.unionByName(Seq(
      (900001L, Array.fill(3)("alpha beta gamma delta eps zeta eta theta").mkString(" ")),
      (900002L, "alpha beta gamma delta eps zeta eta theta plus unrelated tail words")
    ).toDF("doc_id", "text")).cache()
    val texts = seeded.as[(Long, String)].collect().toMap
    def words(t: String) = t.split(" ").filter(_.nonEmpty)
    // brute force: span STRINGS (collision-free reference; xxhash64
    // agreeing with it on every doc is the collision non-event)
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.values.foreach { t =>
      val w = words(t)
      for (p <- 0 to w.length - window)
        counts(w.slice(p, p + window).mkString("\u0001")) += 1L
    }
    val expect = texts.map { case (id, t) =>
      val w = words(t)
      val starts = (0 to w.length - window)
        .filter(p => counts(w.slice(p, p + window).mkString("\u0001")) >= 2L)
      var tot = 0L; var until = 0L
      starts.foreach { p =>
        tot += math.max(0L, p + window - math.max(until, p))
        until = math.max(until, p + window)
      }
      id -> ((id, w.length.toLong, starts.length.toLong, tot,
        if (w.nonEmpty) tot.toDouble / w.length else 0.0))
    }
    assert(expect(900001L)._3 > 0L && expect(900002L)._3 > 0L,
      "seeded spans must actually duplicate")
    val got = SpanDup.spanDupStats(seeded, window)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === expect.size)
    expect.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
    val relaid = SpanDup.spanDupStats(seeded.repartition(7), window)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    expect.foreach { case (id, e) => assert(relaid(id) === e, s"relaid $id") }
  }

  test("spanDedup: keep-first excision, one surviving copy, clean docs verbatim, tokens conserved") {
    val d = Seq(
      (1L, "a b c d e x y z"),
      (2L, "q q q a b c d e"),
      (3L, "totally  unique   words here indeed"),
      (6L, "m n o p m n o p")
    ).toDF("doc_id", "text")
    val got = SpanDup.spanDedup(d, window = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 holds every keeper occurrence (min (doc, p)): untouched
    assert(got(1L) === ((1L, "a b c d e x y z", 8L, 0L)))
    // doc 2 loses the shared "a b c d e" tail (starts 3,4,5 merge to
    // [3,8)): only its own prefix remains
    assert(got(2L) === ((2L, "q q q", 3L, 5L)))
    // untouched docs return their text VERBATIM — whitespace runs intact
    assert(got(3L)._2 === "totally  unique   words here indeed")
    assert(got(3L)._4 === 0L)
    // intra-doc repeat: the second "m n o p" excises, one copy survives
    assert(got(6L) === ((6L, "m n o p", 4L, 4L)))
  }

  test("spanDedup matches the single-node keep-first reference on the real table, any layout") {
    val window = 8
    val seeded = docs.unionByName(Seq(
      (900001L, Array.fill(3)("alpha beta gamma delta eps zeta eta theta").mkString(" ")),
      (900002L, "alpha beta gamma delta eps zeta eta theta plus unrelated tail words")
    ).toDF("doc_id", "text")).cache()
    val texts = seeded.as[(Long, String)].collect().toMap
    def words(t: String) = t.split(" ").filter(_.nonEmpty)
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val first = scala.collection.mutable.Map.empty[String, (Long, Long)]
    texts.toSeq.sortBy(_._1).foreach { case (id, t) =>
      val w = words(t)
      for (p <- 0 to w.length - window) {
        val k = w.slice(p, p + window).mkString("\u0001")
        counts(k) += 1L
        val cand = (id, p.toLong)
        if (!first.contains(k) ||
            Ordering[(Long, Long)].lt(cand, first(k))) first(k) = cand
      }
    }
    val expect = texts.map { case (id, t) =>
      val w = words(t)
      val starts = (0 to w.length - window).filter { p =>
        val k = w.slice(p, p + window).mkString("\u0001")
        counts(k) >= 2L && first(k) != ((id, p.toLong))
      }
      val keep = Array.fill(w.length)(true)
      starts.foreach(p => (p until p + window).foreach(keep(_) = false))
      val kept = w.indices.filter(keep).map(w)
      val removed = keep.count(!_).toLong
      id -> ((id,
        if (starts.isEmpty) t else kept.mkString(" "),
        w.length.toLong - removed, removed))
    }
    val got = SpanDup.spanDedup(seeded, window)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size === expect.size)
    expect.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
    assert(expect.values.exists(_._4 > 0L), "seeded duplicates must excise")
    // conservation: remaining + removed == original, for every doc
    got.values.foreach { case (id, _, n, r) =>
      assert(n + r === words(texts(id)).length.toLong, s"doc $id leaks tokens")
    }
    val relaid = SpanDup.spanDedup(seeded.repartition(7), window)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    expect.foreach { case (id, e) => assert(relaid(id) === e, s"relaid $id") }
  }

  test("plan audit: fingerprint count partial-aggregates below its shuffle, nothing single-partitions") {
    val p = SpanDup.spanDupStats(docs, 8).queryExecution.executedPlan.toString
    val ex = p.indexOf("Exchange hashpartitioning")
    val partial = p.lastIndexOf("HashAggregate")
    assert(ex >= 0 && partial > ex,
      s"no partial aggregate below the fingerprint shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("guards: window and minDupCount bounds") {
    intercept[IllegalArgumentException] { SpanDup.spanDupStats(docs, 0) }
    intercept[IllegalArgumentException] { SpanDup.spanDedup(docs, 0) }
    intercept[IllegalArgumentException] {
      SpanDup.spanDedup(docs, 8, minDupCount = 1L)
    }
    intercept[IllegalArgumentException] {
      SpanDup.spanDupStats(docs, 8, minDupCount = 1L)
    }
  }
}
