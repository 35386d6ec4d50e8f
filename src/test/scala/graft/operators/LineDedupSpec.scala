package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal must excise exactly the lines a
  * single-node distinct-document count would flag — all occurrences,
  * trim-matched, short/blank lines exempt — and rebuild every other
  * document verbatim: constructed cases pin the rule's edges, a
  * brute-force reference pins the whole (multi-line-ified) real table,
  * and stats/removal must agree because they share one line frame.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 200).select("doc_id", "text").cache()

  test("paragraph granularity (sep = two newlines): whole paragraphs flag as units") {
    val footer = "Follow us on social media\nCopyright 2020 SITE"
    val d = Seq(
      (1L, s"real content about one thing\n\n$footer"),
      (2L, s"entirely different real content\n\n$footer"),
      (3L, "no footer on this page at all")
    ).toDF("doc_id", "text")
    // paragraph-granular: the two-LINE footer flags as ONE unit
    val para = LineDedup.dedupLines(d, sep = "\n\n")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(para(1L) === ((1L, "real content about one thing", 1L, 1L)))
    assert(para(2L) === ((2L, "entirely different real content", 1L, 1L)))
    assert(para(3L) === ((3L, "no footer on this page at all", 1L, 0L)))
    // line-granular on the same input: the footer's TWO lines flag
    // individually (2 removals per doc), the content lines survive
    val line = LineDedup.dedupLines(d)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(line(1L)._4 === 2L, "line mode removes the footer's two lines")
    assert(line(1L)._2 === "real content about one thing\n")
  }

  test("constructed: flagged lines removed everywhere, trim-matched, others verbatim") {
    val d = Seq(
      (1L, "Welcome to SITE\nunique content one\nCopyright 2020 SITE"),
      (2L, "   Welcome to SITE\nother words here\nCopyright 2020 SITE"),
      (3L, "solo text, no boilerplate at all"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(d)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 4, "every input doc must appear")
    // both shared lines flagged (2 distinct docs each), ALL occurrences
    // removed — including doc 2's indented variant (trim match)
    assert(got(1L) === ((1L, "unique content one", 1L, 2L)))
    assert(got(2L) === ((2L, "other words here", 1L, 2L)))
    // untouched docs come back VERBATIM (not split/rejoined)
    assert(got(3L) === ((3L, "solo text, no boilerplate at all", 1L, 0L)))
    assert(got(4L) === ((4L, "", 1L, 0L)))

    val stats = LineDedup.lineDupStats(d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(stats(1L) === ((1L, 3L, 2L, 2.0 / 3)))
    assert(stats(2L) === ((2L, 3L, 2L, 2.0 / 3)))
    assert(stats(3L) === ((3L, 1L, 0L, 0.0)))
    assert(stats(4L) === ((4L, 1L, 0L, 0.0)))
  }

  test("blank and short lines never flag; minLineChars raises the floor") {
    val d = Seq(
      (1L, "alpha\n\nok\nbravo"),
      (2L, "charlie\n\nok\ndelta")
    ).toDF("doc_id", "text")
    // blank lines appear in both docs but are structure, not
    // boilerplate; "ok" (2 chars) flags at the default floor of 1
    val got1 = LineDedup.dedupLines(d)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got1(1L) === ((1L, "alpha\n\nbravo", 3L, 1L)))
    assert(got1(2L) === ((2L, "charlie\n\ndelta", 3L, 1L)))
    // at minLineChars = 3, "ok" is exempt too — nothing flags, both
    // docs come back verbatim
    val got3 = LineDedup.dedupLines(d, minLineChars = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got3(1L) === ((1L, "alpha\n\nok\nbravo", 4L, 0L)))
    assert(got3(2L) === ((2L, "charlie\n\nok\ndelta", 4L, 0L)))
  }

  test("minDocs counts DISTINCT documents — intra-doc repetition alone never flags") {
    val d = Seq(
      (1L, "same line\nsame line\nsame line\nfiller"),
      (2L, "same line\nunrelated"),
      (3L, "nothing shared here")
    ).toDF("doc_id", "text")
    // "same line" is in 2 distinct docs: flagged at minDocs=2 (all 4
    // occurrences removed), unflagged at minDocs=3 even though it
    // OCCURS 4 times
    val at2 = LineDedup.dedupLines(d, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(at2(1L) === ((1L, "filler", 1L, 3L)))
    assert(at2(2L) === ((2L, "unrelated", 1L, 1L)))
    val at3 = LineDedup.dedupLines(d, minDocs = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(at3(1L)._4 === 0L)
    assert(at3(1L)._2 === "same line\nsame line\nsame line\nfiller")
    assert(at3(2L)._4 === 0L)
  }

  test("matches the single-node reference on the real table (word-per-line + seeded boilerplate), any layout") {
    // the testdata texts are single-line; explode them into one word
    // per line — a brutal corpus where stopwords become boilerplate —
    // and seed two multi-doc footer lines on top
    val multi = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", "\n").as("text"))
    val seeded = multi.unionByName(Seq(
      (900001L, "first page body words\nVisit example dot com\nfooter"),
      (900002L, "second page entirely\nVisit example dot com\nfooter"),
      (900003L, "   Visit example dot com   \nunique closing line")
    ).toDF("doc_id", "text")).cache()

    val minDocs = 3L
    val texts = seeded.as[(Long, String)].collect().toMap
    // reference: trimmed-content -> distinct docs; flag at >= minDocs
    val df = texts.toSeq
      .flatMap { case (id, t) => t.split("\n", -1).map(_.trim)
        .filter(_.nonEmpty).distinct.map(l => (l, id)) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.size.toLong }
    val flagged = df.filter(_._2 >= minDocs).keySet
    val expect = texts.map { case (id, t) =>
      val ls = t.split("\n", -1)
      val kept = ls.filterNot(l => l.trim.nonEmpty && flagged(l.trim))
      id -> ((kept.mkString("\n"), kept.length.toLong,
        (ls.length - kept.length).toLong))
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      LineDedup.dedupLines(d, minDocs = minDocs)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = run(seeded)
    assert(got.keySet === expect.keySet)
    // untouched docs must be byte-identical originals, not rejoins
    expect.foreach { case (id, e) =>
      val want = if (e._3 == 0L) (texts(id), e._2, 0L) else e
      assert(got(id) === want, s"doc $id")
    }
    assert(expect.values.exists(_._3 > 0L), "seeded boilerplate must flag")
    // layout invariance
    assert(run(seeded.repartition(7)) === got)
    // conservation + stats/removal agreement off the one shared frame
    val stats = LineDedup.lineDupStats(seeded, minDocs = minDocs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    got.foreach { case (id, (_, nl, rm)) =>
      assert(texts(id).split("\n", -1).length.toLong === nl + rm,
        s"doc $id line conservation")
      assert(stats(id)._3 === rm, s"doc $id stats/removal agreement")
    }
  }

  test("topBoilerplate ranks flagged lines by reach, deterministically") {
    val d = Seq(
      (1L, "footer\nbanner\nbody one"),
      (2L, "footer\nbanner\nbody two"),
      (3L, "footer\nbody three"),
      (4L, "footer\nfooter\nbody four")
    ).toDF("doc_id", "text")
    val got = LineDedup.topBoilerplate(d, k = 5)
      .as[(String, Long, Long)].collect().toSeq
    // footer: 4 docs, 5 occurrences; banner: 2 docs, 2 occurrences
    assert(got === Seq(("footer", 4L, 5L), ("banner", 2L, 2L)))
    assert(LineDedup.topBoilerplate(d, k = 1)
      .as[(String, Long, Long)].collect().toSeq === Seq(("footer", 4L, 5L)))
  }

  test("frozen index: known boilerplate excises from NEW docs; delta-only duplication never flags") {
    val corpusA = Seq(
      (1L, "footer line\nbody a"),
      (2L, "footer line\nbody b"),
      (3L, "footer line\nbody c")
    ).toDF("doc_id", "text")
    val index = LineDedup.boilerplateIndex(corpusA, minDocs = 2L).cache()
    // dedupLines IS the composition of index + against, on the same corpus
    val viaIndex = LineDedup.dedupLinesAgainst(corpusA, index)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = LineDedup.dedupLines(corpusA, minDocs = 2L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaIndex === direct)
    // NEW docs: the frozen footer excises; a line duplicated only
    // among the new docs does NOT (frozen-index semantics — the
    // O(delta) / streaming-service contract)
    val delta = Seq(
      (10L, "footer line\nnew shared line\nfresh body x"),
      (11L, "footer line\nnew shared line\nfresh body y")
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesAgainst(delta, index)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) === ((10L, "new shared line\nfresh body x", 2L, 1L)))
    assert(got(11L) === ((11L, "new shared line\nfresh body y", 2L, 1L)))
    // the frozen coverage signal agrees with the frozen removal, and
    // the delta-only shared line does not count as duplicated
    val stats = LineDedup.lineDupStatsAgainst(delta, index)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(stats(10L) === ((10L, 3L, 1L, 1.0 / 3)))
    assert(stats(11L) === ((11L, 3L, 1L, 1.0 / 3)))
  }

  test("index artifact round-trips through ModelStore; cross-kind load fails loudly") {
    val corpus = Seq(
      (1L, "banner here\nalpha"),
      (2L, "banner here\nbeta")
    ).toDF("doc_id", "text")
    val index = LineDedup.boilerplateIndex(corpus, minDocs = 2L)
    val path = java.nio.file.Files.createTempDirectory("graft-lineidx").toString
    LineDedup.save(index, path)
    val loaded = LineDedup.load(spark, path)
    assert(loaded.as[Long].collect().toSet === index.as[Long].collect().toSet)
    val viaLoaded = LineDedup.dedupLinesAgainst(corpus, loaded)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaLoaded.map(_._2) === Seq("alpha", "beta"))
    // a committed artifact of another kind must be refused by name
    val clfPath = java.nio.file.Files.createTempDirectory("graft-clf").toString
    QualityClassifier.save(QualityClassifier.train(Seq(
      (true, "some trusted words here"), (false, "junky junk words there"))
      .toDF("label", "text"), dim = 64), clfPath)
    val e = intercept[IllegalArgumentException] {
      LineDedup.load(spark, clfPath)
    }
    assert(e.getMessage.contains("kind"))
  }

  test("guards fail loudly; no stage is single-partition") {
    val d = Seq((1L, "a\nb")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { LineDedup.dedupLines(d, minDocs = 1) }
    intercept[IllegalArgumentException] { LineDedup.lineDupStats(d, minDocs = 1) }
    intercept[IllegalArgumentException] { LineDedup.dedupLines(d, minLineChars = 0) }
    intercept[IllegalArgumentException] { LineDedup.topBoilerplate(d, k = 0) }
    val p = LineDedup.dedupLines(docs, minDocs = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
