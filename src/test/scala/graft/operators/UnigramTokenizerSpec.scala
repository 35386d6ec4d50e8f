package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The unigram tokenizer must honor EM's likelihood invariant during
  * training, segment every word exactly as a single-node Viterbi with
  * the pinned tie rule, round-trip losslessly (unseen characters
  * included), reproduce on any layout, and round-trip through its
  * ModelStore artifact.
  */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 120).select("doc_id", "text").cache()

  private lazy val model = UnigramTokenizer.train(docs, vocabSize = 300)

  /** Single-node Viterbi with the SAME edge order and strict-improve
    * tie rule the operator documents — independent implementation. */
  private def refSegment(word: String): (Seq[String], Double) = {
    val pieces = model.pieces.toMap
    val maxLen = model.maxPieceLen
    val L = word.length
    val best = Array.fill(L + 1)(-1e30); best(0) = 0.0
    val bps = Array.fill(L + 1)(-1); val bpp = Array.fill(L + 1)("")
    for (e <- 1 to L; s <- math.max(0, e - maxLen) until e) {
      val p = word.substring(s, e)
      val lpOpt =
        if (e - s == 1) Some(pieces.getOrElse(p, model.unkLogp))
        else pieces.get(p)
      lpOpt.foreach { lp =>
        if (best(s) + lp > best(e)) {
          best(e) = best(s) + lp; bps(e) = s; bpp(e) = p
        }
      }
    }
    val parts = scala.collection.mutable.Buffer.empty[String]
    var pos = L
    while (pos > 0) { parts += bpp(pos); pos = bps(pos) }
    (parts.reverse.toSeq, best(L))
  }

  test("training: EM log-likelihood non-decreasing, chars kept, probs normalized") {
    assert(model.emLogLik.nonEmpty)
    model.emLogLik.foreach { run =>
      run.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a - math.abs(a) * 1e-9,
          s"EM likelihood decreased: $a -> $b")
        case _ => ()
      }
    }
    val pieceSet = model.pieces.map(_._1).toSet
    val corpusChars = docs.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).toSet
    corpusChars.foreach(c => assert(pieceSet.contains(c.toString),
      s"char '$c' missing — single characters must never prune"))
    val z = model.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(z - 1.0) < 1e-9, s"piece probs sum to $z")
    assert(model.pieces.exists(_._1.length >= 2),
      "no multi-char piece survived — training learned nothing")
  }

  test("distributed Viterbi equals the single-node reference on every real word") {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val got = UnigramTokenizer.segmentWords(spark, words, model)
      .as[(String, Seq[String], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size > 25)
    got.foreach { case (w, (pieces, score)) =>
      val (refPieces, refScore) = refSegment(w)
      assert(pieces === refPieces, s"word '$w'")
      assert(math.abs(score - refScore) < 1e-9, s"word '$w' score")
      assert(pieces.mkString("") === w, s"word '$w' must round-trip")
    }
  }

  test("unseen characters segment as UNK char pieces and still round-trip") {
    val got = UnigramTokenizer.segmentWords(spark,
        Seq("naïve©x").toDF("word"), model)
      .as[(String, Seq[String], Double)].collect().head
    assert(got._2.mkString("") === "naïve©x")
    assert(got._2.exists(_ == "©"),
      "the unseen char must come back as its own fallback piece")
    val (refPieces, _) = refSegment("naïve©x")
    assert(got._2 === refPieces)
  }

  test("layout invariance and the compression property") {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val a = UnigramTokenizer.segmentWords(spark, words, model)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    val b = UnigramTokenizer.segmentWords(spark, words.repartition(7), model)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    assert(a === b)
    val totalPieces = a.toSeq.map(_._2.length.toLong).sum
    val totalChars = a.keys.toSeq.map(_.length.toLong).sum
    assert(totalPieces < totalChars,
      s"$totalPieces pieces over $totalChars chars — no compression learned")
  }

  test("corpus tokenization assembles per-word pieces in word order; join-strategy invariant") {
    val d = Seq((1L, "alpha beta alpha"), (2L, "beta  gamma")).toDF("doc_id", "text")
    val seg = UnigramTokenizer.segmentWords(spark,
        d.select(explode(split(col("text"), " ")).as("word")), model)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    val got = UnigramTokenizer.tokenizeCorpus(d, model)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === seg("alpha") ++ seg("beta") ++ seg("alpha"))
    assert(got(2L)._2 === seg("beta") ++ seg("gamma")) // empty word skipped
    assert(got(1L)._3 === got(1L)._2.length.toLong)
    val shuffled = UnigramTokenizer.tokenizeCorpus(d, model,
        broadcastWords = false)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r._2).toMap
    assert(shuffled(1L) === got(1L)._2 && shuffled(2L) === got(2L)._2)
  }

  test("compound corpus: EM learns reusable subunits and Viterbi splits on them") {
    // every word is a 2-unit compound LONGER than maxPieceLen (8), so
    // no word can be a single piece — the DP must take multi-edge
    // paths, and EM's fixed point should reuse the six shared units
    val units = Seq("spark", "stream", "batch", "merge")
    val compounds = for (a <- units; b <- units if a != b) yield a + b
    val text = (compounds ++ compounds ++ compounds).mkString(" ")
    val cdocs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val m = UnigramTokenizer.train(cdocs, vocabSize = 40)
    val got = UnigramTokenizer.segmentWords(spark,
        cdocs.select(explode(split(col("text"), " ")).as("word")), m)
      .as[(String, Seq[String], Double)].collect()
      .map(r => r._1 -> r._2).toMap
    compounds.foreach { w =>
      assert(got(w).mkString("") === w, s"compound '$w' must round-trip")
      assert(got(w).length >= 2, s"compound '$w' cannot be one piece")
    }
    // the shared units carry 3x the mass of any other substring — the
    // EM fixed point segments every compound exactly at the unit seam
    compounds.foreach { w =>
      val (a, b) = units.collectFirst {
        case u if w.startsWith(u) && units.contains(w.stripPrefix(u)) =>
          (u, w.stripPrefix(u))
      }.get
      assert(got(w) === Seq(a, b), s"'$w' segmented as ${got(w)}")
    }
    // and the multi-piece paths agree with an independent Viterbi over
    // the same trained pieces (the real-table parity test can't reach
    // these paths — its words are all single pieces)
    val pieces = m.pieces.toMap
    def ref(word: String): Seq[String] = {
      val L = word.length
      val best = Array.fill(L + 1)(-1e30); best(0) = 0.0
      val bps = Array.fill(L + 1)(-1); val bpp = Array.fill(L + 1)("")
      for (e <- 1 to L; s <- math.max(0, e - m.maxPieceLen) until e) {
        val p = word.substring(s, e)
        val lpOpt = if (e - s == 1) Some(pieces.getOrElse(p, m.unkLogp))
          else pieces.get(p)
        lpOpt.foreach { lp =>
          if (best(s) + lp > best(e)) {
            best(e) = best(s) + lp; bps(e) = s; bpp(e) = p
          }
        }
      }
      val parts = scala.collection.mutable.Buffer.empty[String]
      var pos = L
      while (pos > 0) { parts += bpp(pos); pos = bps(pos) }
      parts.reverse.toSeq
    }
    compounds.foreach(w => assert(got(w) === ref(w), s"parity on '$w'"))
  }

  test("subword-regularization sampling: exact FFBS parity, limits, frequencies", graft.Slow) {
    // hand-set model so every segmentation's probability is enumerable:
    // "ab" segments as [ab] (p=.5) or [a][b] (.25*.25) -> P([ab]) = 8/9
    val m = UnigramTokenizer.Model(
      Seq(("a", math.log(0.25)), ("b", math.log(0.25)), ("ab", math.log(0.5))),
      maxPieceLen = 2, emLogLik = Seq.empty)
    val w = Seq("ab").toDF("word")

    /** Single-node FFBS with the same md5-derived uniform, the same
      * lse, the same (e, s) edge order — independent implementation. */
    def refSample(word: String, seed: Long, alpha: Double): Seq[String] = {
      val pieces = m.pieces.toMap
      val L = word.length
      val es = (for {
        e <- 1 to L; s <- math.max(0, e - m.maxPieceLen) until e
        p = word.substring(s, e)
        lp <- if (e - s == 1) Some(pieces.getOrElse(p, m.unkLogp)) else pieces.get(p)
      } yield (e, s, lp, p)).sortBy(t => (t._1, t._2))
      def lse(p: Double, q: Double): Double = {
        val (hi, lo) = if (p >= q) (p, q) else (q, p)
        hi + math.log(math.exp(lo - hi) + 1.0)
      }
      val fwd = Array.fill(L + 1)(-1e30); fwd(0) = 0.0
      es.foreach { case (e, s, lp, _) => fwd(e) = lse(fwd(e), fwd(s) + alpha * lp) }
      def uniform(pos: Int): Double = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$word:$pos:$seed".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      }
      val parts = scala.collection.mutable.Buffer.empty[String]
      var pos = L
      while (pos > 0) {
        val target = math.log(uniform(pos)) + fwd(pos)
        var cum = -1e30
        var chosen: Option[(Int, String)] = None
        es.filter(_._1 == pos).foreach { case (_, s, lp, p) =>
          if (chosen.isEmpty) {
            cum = lse(cum, fwd(s) + alpha * lp)
            if (cum >= target) chosen = Some((s, p))
          }
        }
        val (s, p) = chosen.get
        parts += p; pos = s
      }
      parts.reverse.toSeq
    }

    val seeds = (0L until 600L)
    // engine == reference exactly, seed by seed, at three alphas
    Seq(0.0, 1.0, 8.0).foreach { alpha =>
      val some = seeds.take(40)
      val df = some.map(sd => UnigramTokenizer
        .sampleSegmentations(spark, w, m, seed = sd, alpha = alpha)
        .as[(String, Seq[String], Double)].collect().head)
      df.zip(some).foreach { case ((word, pieces, lp), sd) =>
        assert(pieces === refSample(word, sd, alpha), s"alpha=$alpha seed=$sd")
        assert(pieces.mkString("") === word)
        val expLp = pieces.map(p => m.pieces.toMap.apply(p)).sum
        assert(math.abs(lp - expLp) < 1e-12, "sample_logp is the untempered sum")
      }
    }
    // frequencies via the (cheap) reference proved identical above:
    // alpha=1 -> P([ab]) = 8/9; alpha=0 -> uniform 1/2
    val f1 = seeds.count(sd => refSample("ab", sd, 1.0) == Seq("ab")).toDouble / seeds.size
    assert(math.abs(f1 - 8.0 / 9.0) < 0.05, s"posterior freq $f1")
    val f0 = seeds.count(sd => refSample("ab", sd, 0.0) == Seq("ab")).toDouble / seeds.size
    assert(math.abs(f0 - 0.5) < 0.07, s"uniform freq $f0")
    // large alpha concentrates on the Viterbi segmentation
    assert(seeds.take(50).forall(sd => refSample("ab", sd, 50.0) == Seq("ab")))
    // determinism + layout invariance on the real corpus at alpha=1
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val s1 = UnigramTokenizer.sampleSegmentations(spark, words, model, seed = 7L)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    val s2 = UnigramTokenizer.sampleSegmentations(spark, words.repartition(5),
        model, seed = 7L)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    assert(s1 === s2)
    s1.foreach { case (word, pieces) => assert(pieces.mkString("") === word) }
    // rotating the seed actually changes some segmentation somewhere
    val s3 = UnigramTokenizer.sampleSegmentations(spark, words, model, seed = 8L)
      .as[(String, Seq[String], Double)].collect().map(r => r._1 -> r._2).toMap
    assert(s1.keySet === s3.keySet)
  }

  test("artifact round-trip; torn and cross-kind loads fail loudly") {
    val path = java.nio.file.Files
      .createTempDirectory("unigram-art").toString
    UnigramTokenizer.save(spark, path, model)
    val loaded = UnigramTokenizer.load(spark, path)
    assert(loaded.pieces === model.pieces)
    assert(loaded.maxPieceLen === model.maxPieceLen)
    val d = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val a = UnigramTokenizer.tokenizeCorpus(d, model)
      .as[(Long, Seq[String], Long)].collect().toSeq
    val b = UnigramTokenizer.tokenizeCorpus(d, loaded)
      .as[(Long, Seq[String], Long)].collect().toSeq
    assert(a === b)
    // cross-kind: a path committed under another kind must refuse
    val other = java.nio.file.Files
      .createTempDirectory("unigram-other").toString
    ModelStore.writeMeta(spark, other, Seq(
      "version" -> "1", "kind" -> "tokenizer", "gen" -> "0",
      "nPieces" -> "0", "maxPieceLen" -> "8"))
    val err = intercept[IllegalArgumentException] {
      UnigramTokenizer.load(spark, other)
    }
    assert(err.getMessage.contains("kind"))
  }

  test("guards: oversize words and bad parameters fail loudly") {
    intercept[IllegalArgumentException] {
      UnigramTokenizer.train(docs, vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      UnigramTokenizer.train(docs, vocabSize = 10, maxVocab = 3)
    }
    val long = "x" * 300
    val err = intercept[Exception] {
      UnigramTokenizer.segmentWords(spark, Seq(long).toDF("word"), model)
        .collect()
    }
    assert(err.getMessage.contains("maxWordLen") ||
      err.getCause != null && err.getCause.getMessage.contains("maxWordLen"))
  }
}
