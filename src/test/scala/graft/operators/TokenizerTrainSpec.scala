package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must be indistinguishable from the
  * published single-node algorithm: same merges, in the same order, and
  * the same tokenization — with the corpus read once and everything
  * after vocabulary-sized. */
class TokenizerTrainSpec extends SparkSpec {
  import spark.implicits._

  // the single-node reference: Sennrich-style BPE over word counts —
  // adjacent positions count once each (overlaps included), max-count
  // pair merges each round (ties by lexicographic (left, right)),
  // greedy left-to-right application
  private def mergeGreedy(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def referenceBpe(wc: Map[String, Long], numMerges: Int,
      minCount: Long = 2L): (Seq[(String, String)], Map[String, Vector[String]]) = {
    var syms: Map[String, Vector[String]] =
      wc.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, c) <- wc; s = syms(w); i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) += c
      if (pc.isEmpty) done = true
      else {
        val ((a, b), n) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minCount) done = true
        else {
          merges += ((a, b))
          syms = syms.map { case (w, s) => w -> mergeGreedy(s, a, b) }
        }
      }
    }
    (merges.toSeq, syms)
  }

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 150).select("text").cache()

  private lazy val refWc: Map[String, Long] = docs.as[String].collect()
    .flatMap(_.split(" ")).filter(_.nonEmpty)
    .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("learned merges match the single-node reference on the real documents table") {
    val n = 12
    val (refMerges, refSyms) = referenceBpe(refWc, n)
    assert(refMerges.length === n, "corpus too small to learn 12 merges")
    val got = TokenizerTrain.learnMerges(docs, n)
    assert(got === refMerges,
      s"distributed merge sequence diverged from the reference")
    // and the applied tokenization agrees word-for-word
    val tok = TokenizerTrain.tokenizeWords(docs, got)
      .select("word", "tokens").as[(String, Seq[String])]
      .collect().toMap
    assert(tok.keySet === refSyms.keySet)
    tok.foreach { case (w, ts) =>
      assert(ts === refSyms(w), s"word '$w' tokenized differently") }
    // merged tokens reconstruct their word — no symbol lost or invented
    tok.foreach { case (w, ts) => assert(ts.mkString === w) }
  }

  test("tokenizeCorpus emits each document's flat token stream in word order") {
    val withId = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select("doc_id", "text").cache()
    val n = 12
    val merges = TokenizerTrain.learnMerges(withId, n)
    val (_, refSyms) = referenceBpe(refWc, n)
    val got = TokenizerTrain.tokenizeCorpus(withId, merges)
      .select("doc_id", "tokens", "n_tokens")
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    val texts = withId.as[(Long, String)].collect().toMap
    assert(got.keySet === texts.keySet)
    texts.foreach { case (id, text) =>
      val expected = text.split(" ").filter(_.nonEmpty)
        .flatMap(refSyms(_)).toSeq
      assert(got(id)._2 === expected, s"doc $id token stream diverged")
      assert(got(id)._3 === expected.length.toLong)
    }
  }

  test("the merge sequence is a pure function of the data, not the layout") {
    val a = TokenizerTrain.learnMerges(docs, 6)
    val b = TokenizerTrain.learnMerges(docs.repartition(7), 6)
    assert(a === b)
  }

  test("learnMergesLocal: driver-side rounds are bit-identical to the distributed rounds") {
    val distributed = TokenizerTrain.learnMerges(docs, 12)
    val local = TokenizerTrain.learnMergesLocal(docs, 12)
    assert(local === distributed,
      "the two engine splits must learn the same merge sequence")
    // the driver collect is bounded: an over-cap vocabulary fails loudly
    val e = intercept[IllegalArgumentException] {
      TokenizerTrain.learnMergesLocal(docs, 2, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
    // degenerate corpora behave identically too
    val aaa = Seq("aaa aaa aa").toDF("text")
    assert(TokenizerTrain.learnMergesLocal(aaa, 1) ===
      TokenizerTrain.learnMerges(aaa, 1))
    val unique = Seq("ab cd").toDF("text")
    assert(TokenizerTrain.learnMergesLocal(unique, 5) === Seq.empty)
    assert(TokenizerTrain.learnMergesLocal(unique, 2, minCount = 1L) ===
      Seq(("a", "b"), ("c", "d")))
  }

  test("training stops when no pair reaches minCount; degenerate corpora are fine") {
    // all words are single symbols -> no adjacent pairs at all
    val singles = Seq("a b c", "d e").toDF("text")
    assert(TokenizerTrain.learnMerges(singles, 5) === Seq.empty)
    // every pair occurs once -> below the default minCount
    val unique = Seq("ab cd").toDF("text")
    assert(TokenizerTrain.learnMerges(unique, 5) === Seq.empty)
    // ...but minCount=1 learns them deterministically (lex tie-break)
    assert(TokenizerTrain.learnMerges(unique, 2, minCount = 1L) ===
      Seq(("a", "b"), ("c", "d")))
    // repeated-symbol overlaps resolve left-to-right like the reference
    val aaa = Seq("aaa aaa aa").toDF("text")
    val m = TokenizerTrain.learnMerges(aaa, 1)
    assert(m === Seq(("a", "a")))
    val tok = TokenizerTrain.tokenizeWords(aaa, m)
      .select("word", "tokens").as[(String, Seq[String])].collect().toMap
    assert(tok("aaa") === Seq("aa", "a"))
    assert(tok("aa") === Seq("aa"))
  }
}
