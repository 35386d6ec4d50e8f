package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("bm25-").toString + "/idx"

  /** Scalar reference BM25 — independent of every Spark expression in
    * the implementation (its own tokenizer, its own maps). */
  private def refScores(docs: Seq[(Long, String)], query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val terms = query.map(_.toLowerCase).filter(_.nonEmpty).distinct
    val n = docs.size.toDouble
    val dls = docs.map { case (id, t) => id -> toks(t).size.toDouble }.toMap
    val avgdl = dls.values.sum / n
    val tfs = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (w, xs) => w -> xs.size } }.toMap
    val dfm = terms.map(t => t -> docs.count { case (id, _) =>
      tfs(id).contains(t) }).toMap
    docs.flatMap { case (id, _) =>
      val s = terms.map { t =>
        val tf = tfs(id).getOrElse(t, 0).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls(id) / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toMap
  }

  private val fixture = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log and the dog barked"),
    (3L, "cat cat cat everywhere a cat"),
    (4L, "completely unrelated words about spark and shuffles"),
    (5L, "a dog and a cat shared a mat"),
    (6L, "nothing in common here"))

  private def fixtureDf = {
    import spark.implicits._
    fixture.toDF("doc_id", "text")
  }

  test("score matches the scalar reference on every candidate (1e-12)") {
    val idx = Bm25.buildIndex(fixtureDf)
    for (q <- Seq(Seq("cat"), Seq("cat", "dog"), Seq("dog", "mat", "spark"))) {
      val got = Bm25.score(idx, q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = refScores(fixture, q)
      assert(got.keySet === want.keySet, s"candidate set for $q")
      for ((id, s) <- want)
        assert(math.abs(got(id) - s) < 1e-12, s"doc $id query $q: ${got(id)} vs $s")
    }
  }

  test("topK order: score desc, doc_id asc on exact ties; k bounds output") {
    import spark.implicits._
    // identical docs => identical scores; the tie must break by id
    val tied = Seq((10L, "alpha beta"), (7L, "alpha beta"), (9L, "alpha beta"))
      .toDF("doc_id", "text")
    val idx = Bm25.buildIndex(tied)
    val top = Bm25.topK(idx, Seq("alpha"), k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(7L, 9L))
    assert(top.map(_.getDouble(1)).distinct.length === 1)
  }

  test("query term SET semantics: repeats collapse; unknown-only query is empty") {
    val idx = Bm25.buildIndex(fixtureDf)
    val once = Bm25.score(idx, Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val thrice = Bm25.score(idx, Seq("cat", "CAT", "cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once === thrice)
    assert(Bm25.score(idx, Seq("zzzgone")).count() === 0)
    intercept[IllegalArgumentException](Bm25.score(idx, Seq.empty))
  }

  test("save/load/topKAt: fresh-session parity with the transient index") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val idx = Bm25.buildIndex(docs)
    val path = tmpPath()
    Bm25.save(idx, path, nBuckets = 16)
    val q = Seq("table", "window", "hash")
    // k covers every candidate, and the comparison is by doc (not by
    // rank): double-sum order inside an agg is not pinned, so two
    // near-tied neighbors may legally swap ranks between runs — the
    // deterministic tie RULE is pinned by the tied-fixture test above
    val transient = Bm25.topK(idx, q, k = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val s2 = spark.newSession()
    val served = Bm25.topKAt(s2, path, q, k = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(served.keySet === transient.keySet)
    assert(served.nonEmpty)
    for ((id, a) <- served)
      assert(math.abs(a - transient(id)) < 1e-9, s"doc $id")
    // meta kind check fails loudly on a foreign artifact
    val err = intercept[IllegalArgumentException](NgramLm.load(s2, path))
    assert(err.getMessage.contains("bm25_index"))
  }

  test("served query reads only the query terms' bucket partitions") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val path = tmpPath()
    Bm25.save(Bm25.buildIndex(docs), path, nBuckets = 16)
    val res = Bm25.topKAt(spark, path, Seq("table"), k = 5)
    res.collect()
    val lines = res.queryExecution.executedPlan.toString.split('\n')
    val scans = lines.filter(l => l.contains("FileScan") && l.contains("/postings"))
    assert(scans.nonEmpty, s"no postings FileScan:\n${lines.mkString("\n")}")
    scans.foreach { l =>
      val pf = l.indexOf("PartitionFilters:")
      assert(pf >= 0 && l.substring(pf).takeWhile(_ != ']').contains("bucket"),
        s"postings scan not pruned by bucket:\n$l")
    }
  }

  test("gated query: integer stats present for present terms, absent for absent") {
    val out = Bm25.bm25Postings(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out.contains("table") && out.contains("spark"))
    assert(!out.contains("quantum")) // not in the synthetic vocabulary
    // df can never exceed corpus size or tf_total; tf_max <= tf_total
    val n = Tables.documents(spark, sf).count()
    for ((t, (df, tft, tfm, top)) <- out) {
      assert(df <= n && df <= tft, s"$t df=$df tft=$tft")
      assert(tfm <= tft, t)
      assert(top >= 0, t)
    }
  }
}
