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

  test("rolling and joined fingerprints flag identical window sets: stats and excision bit-equal on the real table") {
    val window = 8
    val seeded = docs.unionByName(Seq(
      (900001L, Array.fill(3)("alpha beta gamma delta eps zeta eta theta").mkString(" ")),
      (900002L, "alpha beta gamma delta eps zeta eta theta plus unrelated tail words")
    ).toDF("doc_id", "text")).cache()
    val statsRolling = SpanDup.spanDupStats(seeded, window)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val statsJoined = SpanDup.spanDupStats(seeded, window, rolling = false)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(statsRolling.toSeq === statsJoined.toSeq)
    assert(statsRolling.exists(_._3 > 0L), "must actually flag something")
    val dedupRolling = SpanDup.spanDedup(seeded, window)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val dedupJoined = SpanDup.spanDedup(seeded, window, rolling = false)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(dedupRolling.toSeq === dedupJoined.toSeq)
  }

  test("the rolling fingerprint slide equals direct polynomial evaluation at every position") {
    import org.apache.spark.sql.graft.RollingWindowFp
    // single-node reference: FNV-1a word hashes folded as a degree-
    // (w-1) polynomial in the same base — computed WITHOUT the slide
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * RollingWindowFp.Base)
      h
    }
    def direct(ws: Array[String], p: Int, w: Int): Long =
      ws.slice(p, p + w).foldLeft(0L)((acc, x) => acc * RollingWindowFp.Base + fnv(x))
    val text = "the quick brown fox jumps over the lazy dog the quick brown fox again"
    val ws = text.split(" ")
    for (w <- Seq(1, 3, 5)) {
      val got = Seq((1L, text)).toDF("doc_id", "text")
        .select(posexplode(RollingWindowFp.rollingFp(
          split(col("text"), " "), w)).as(Seq("p", "fp")))
        .as[(Int, Long)].collect().sortBy(_._1)
      assert(got.length === ws.length - w + 1)
      got.foreach { case (p, fp) =>
        assert(fp === direct(ws, p, w), s"window $w position $p") }
    }
    // identical spans share a fingerprint; the repeated "the quick
    // brown fox" at 0 and 9 must collide by construction
    val fp3 = Seq((1L, text)).toDF("doc_id", "text")
      .select(posexplode(RollingWindowFp.rollingFp(
        split(col("text"), " "), 4)).as(Seq("p", "fp")))
      .as[(Int, Long)].collect().toMap
    assert(fp3(0) === fp3(9))
  }

  test("spanDupSpans merges flagged windows into maximal spans with occurrence lower bounds") {
    val d = Seq(
      // docs 1/2 share "c1 c2 c3 c4" (two 3-windows, overlapping) and,
      // disjointly, "z1 z2 z3" (one window) — two maximal spans in each
      (1L, "u1 u2 c1 c2 c3 c4 u3 z1 z2 z3"),
      (2L, "c1 c2 c3 c4 v1 v2 v3 v4 z1 z2 z3"),
      // doc 3 is clean
      (3L, "totally unique words here indeed today")
    ).toDF("doc_id", "text")
    val got = SpanDup.spanDupSpans(d, window = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).toSeq }
    // doc 1: "c1..c4" occupies words [2,6) (windows at 2,3 merge),
    // "z1 z2 z3" words [7,10)
    assert(got(1L) === Seq((1L, 2L, 4L, 2L, 2L), (1L, 7L, 3L, 1L, 2L)))
    // doc 2: same spans at its own offsets
    assert(got(2L) === Seq((2L, 0L, 4L, 2L, 2L), (2L, 8L, 3L, 1L, 2L)))
    assert(!got.contains(3L), "clean docs report no spans")
    // min_occurrences is a lower bound: a window occurring 3x inside a
    // span whose other window occurs 2x reports 2
    val t = Seq(
      (10L, "a b c d"),   // windows (a,b,c) and (b,c,d)
      (11L, "a b c d"),
      (12L, "x a b c y")  // (a,b,c) only -> that window occurs 3x
    ).toDF("doc_id", "text")
    val spans10 = SpanDup.spanDupSpans(t, window = 3)
      .filter(col("doc_id") === 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans10.toSeq === Seq((10L, 0L, 4L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      SpanDup.spanDupSpans(d, window = 0)
    }
  }

  test("spanDupSpansExact: exact whole-span occurrences where the window bound over-counts, equality where the span repeats as a unit") {
    // doc 20 merges two pairwise-duplicated windows into a span that
    // never recurs as a unit: (a b c) recurs in 21, (b c d) in 22, but
    // "a b c d" exists once — the bound says 2, the exact count 1
    val d = Seq(
      (20L, "a b c d"),
      (21L, "p q a b c"),
      (22L, "b c d r s"),
      // docs 23/24 share "e f g h" verbatim — bound and exact agree
      (23L, "e f g h t1 t2"),
      (24L, "t3 e f g h")
    ).toDF("doc_id", "text")
    val got = SpanDup.spanDupSpansExact(d, window = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // the divergence case: min_occurrences 2, occurrences 1
    assert(got((20L, 0L)) === ((4L, 2L, 2L, 1L)),
      s"merged-but-unique span must report exact 1, got ${got((20L, 0L))}")
    // its window-length mates count both true positions
    assert(got((21L, 2L)) === ((3L, 1L, 2L, 2L)))
    assert(got((22L, 0L)) === ((3L, 1L, 2L, 2L)))
    // the unit-repeat case: bound == exact == 2 in both carriers
    assert(got((23L, 0L)) === ((4L, 2L, 2L, 2L)))
    assert(got((24L, 1L)) === ((4L, 2L, 2L, 2L)))
    assert(got.size === 5)

    // both fingerprint paths agree on the exact counts
    val gotJoined = SpanDup.spanDupSpansExact(d, window = 3, rolling = false)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(gotJoined === got)

    // real table: one row per spanDupSpans row, and the invariant
    // 1 <= occurrences <= min_occurrences holds everywhere
    val base = SpanDup.spanDupSpans(docs, 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val exact = SpanDup.spanDupSpansExact(docs, 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(exact.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet === base,
      "the exact pass must preserve spanDupSpans' rows verbatim")
    exact.foreach { r =>
      assert(r._6 >= 1L && r._6 <= r._5,
        s"span ${(r._1, r._2)}: occurrences ${r._6} outside [1, ${r._5}]")
    }
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
