package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** E29: the UNIGRAM-LM tokenizer — the second learned-tokenizer family
  * (Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates"; the
  * SentencePiece unigram model). Where BPE (E21) grows a vocabulary
  * bottom-up by merge rules, the unigram model starts from a LARGE
  * seed vocabulary and prunes it down under an EM-fitted unigram
  * language model over pieces; tokenization is then the Viterbi-best
  * segmentation of each word under the final piece probabilities.
  *
  * Engine split — the [[TokenizerTrain.learnMergesLocal]] adjudication
  * applied again: the corpus is touched EXACTLY ONCE (the map-side-
  * combinable word count), and everything after runs on the driver
  * over the collected Zipf-small word-count table (maxVocab-guarded
  * collect, the PercentileOps bounded-driver-state convention). EM's
  * per-iteration cost is Σ|word|·maxPieceLen over DISTINCT words —
  * KBs–MBs of state at any corpus scale; a Spark job per EM iteration
  * would be scheduler round-trips over a table that fits in L2.
  *
  * SEGMENTATION is distributed and vocabulary-shaped: all Viterbi work
  * happens per distinct WORD ([[segmentWords]] — candidate substrings
  * join the broadcast piece table, then ONE per-word fold runs the DP
  * with |word|+1 doubles of state), and reaches the corpus through the
  * same broadcast join + per-document re-assembly as
  * [[TokenizerTrain.tokenizeCorpus]] — the only corpus-sized shuffle
  * is the unavoidable per-document groupBy.
  *
  * Pinned algorithm details (the spec's single-node reference mirrors
  * them exactly):
  *  - seed = every single character plus the top `seedSize` substrings
  *    of length 2..maxPieceLen scored by count × length (prefer long
  *    covering pieces — the SentencePiece seed heuristic);
  *  - EM: exact per-word forward-backward in log space; M-step
  *    re-normalizes expected counts (1e-12 floor against log 0);
  *  - prune: multi-char pieces with the lowest expected count drop
  *    first, `shrinkFactor` of the multi-char set per round (single
  *    characters NEVER drop — they are the coverage guarantee), EM
  *    re-runs between rounds; documented simplification of
  *    SentencePiece's likelihood-loss criterion, same fixed point
  *    shape (frequent long pieces survive, rare ones die);
  *  - Viterbi ties break toward the EARLIEST piece start (the longest
  *    final piece): edges fold in ascending (end, start) order and
  *    only a STRICTLY better score updates — deterministic on any
  *    layout, and the spec's reference implements the identical rule;
  *  - characters unseen at training segment as single-char UNK pieces
  *    at `minLogp − 10` (the char-fallback analog), so every word
  *    round-trips losslessly.
  */
object UnigramTokenizer {

  /** A trained unigram model: pieces with log probabilities (log-space,
    * normalized), the segmentation window, and the EM log-likelihood
    * trajectory (one entry per EM iteration, non-decreasing within each
    * fixed-vocabulary run — the spec asserts the EM invariant on it). */
  final case class Model(pieces: Seq[(String, Double)], maxPieceLen: Int,
      emLogLik: Seq[Seq[Double]]) {
    require(pieces.nonEmpty, "empty piece set")
    /** Fallback log-prob for characters unseen at training. */
    def unkLogp: Double = pieces.map(_._2).min - 10.0
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** One exact E-step + corpus log-likelihood over the collected word
    * counts. */
  private def eStep(wc: Seq[(String, Long)], logp: Map[String, Double],
      maxLen: Int): (mutable.Map[String, Double], Double) = {
    val expCnt = mutable.Map.empty[String, Double]
    var ll = 0.0
    wc.foreach { case (w, cnt) =>
      val L = w.length
      val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      var e = 1
      while (e <= L) {
        var s = math.max(0, e - maxLen)
        while (s < e) {
          if (alpha(s) != Double.NegativeInfinity) {
            logp.get(w.substring(s, e)).foreach { lp =>
              alpha(e) = logAdd(alpha(e), alpha(s) + lp)
            }
          }
          s += 1
        }
        e += 1
      }
      val beta = Array.fill(L + 1)(Double.NegativeInfinity)
      beta(L) = 0.0
      var s2 = L - 1
      while (s2 >= 0) {
        var e2 = s2 + 1
        val lim = math.min(L, s2 + maxLen)
        while (e2 <= lim) {
          if (beta(e2) != Double.NegativeInfinity) {
            logp.get(w.substring(s2, e2)).foreach { lp =>
              beta(s2) = logAdd(beta(s2), lp + beta(e2))
            }
          }
          e2 += 1
        }
        s2 -= 1
      }
      val z = alpha(L)
      require(z != Double.NegativeInfinity,
        s"word '$w' unreachable under the piece set — single characters " +
          "must never be pruned (internal invariant)")
      ll += cnt * z
      var s3 = 0
      while (s3 < L) {
        var e3 = s3 + 1
        val lim = math.min(L, s3 + maxLen)
        while (e3 <= lim) {
          val p = w.substring(s3, e3)
          logp.get(p).foreach { lp =>
            if (alpha(s3) != Double.NegativeInfinity &&
              beta(e3) != Double.NegativeInfinity) {
              expCnt.update(p, expCnt.getOrElse(p, 0.0) +
                cnt * math.exp(alpha(s3) + lp + beta(e3) - z))
            }
          }
          e3 += 1
        }
        s3 += 1
      }
    }
    (expCnt, ll)
  }

  private def normalize(cnt: collection.Map[String, Double],
      pieces: Iterable[String]): Map[String, Double] = {
    val floored = pieces.map(p => p -> (cnt.getOrElse(p, 0.0) + 1e-12)).toMap
    val tot = math.log(floored.values.sum)
    floored.map { case (p, c) => p -> (math.log(c) - tot) }
  }

  /** Train on the corpus: ONE distributed word-count pass, then the
    * driver-side seed → EM → prune loop. `maxVocab` bounds the collect
    * (fail-loud, the learnMergesLocal convention); `maxWordLen` bounds
    * per-word DP state. */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 8,
      seedSize: Int = 0, emIters: Int = 2, shrinkFactor: Double = 0.75,
      textCol: String = "text", maxVocab: Int = 2000000,
      maxWordLen: Int = 256): Model = {
    require(vocabSize >= 1, s"vocabSize $vocabSize must be >= 1")
    require(maxPieceLen >= 1, s"maxPieceLen $maxPieceLen must be >= 1")
    require(emIters >= 1 && shrinkFactor > 0 && shrinkFactor < 1,
      s"emIters $emIters / shrinkFactor $shrinkFactor out of range")
    val wcDf = docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val n = wcDf.count()
    require(n <= maxVocab, s"distinct-word count $n exceeds maxVocab " +
      s"$maxVocab — raise the bound knowingly or pre-truncate")
    val wc = wcDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1) // deterministic driver order on any layout
    require(wc.nonEmpty, "empty corpus")
    wc.foreach { case (w, _) =>
      require(w.length <= maxWordLen,
        s"word of length ${w.length} exceeds maxWordLen $maxWordLen")
    }

    // seed: chars always; multi-char substrings by count × length
    val subCnt = mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      var s = 0
      while (s < w.length) {
        var l = 1
        val lim = math.min(maxPieceLen, w.length - s)
        while (l <= lim) {
          val p = w.substring(s, s + l)
          subCnt.update(p, subCnt.getOrElse(p, 0L) + c)
          l += 1
        }
        s += 1
      }
    }
    val chars = subCnt.keys.filter(_.length == 1).toSeq.sorted
    val targetSeed = if (seedSize > 0) seedSize else vocabSize * 4
    val multi = subCnt.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c * p.length, p) } // stable: score desc, piece
      .take(math.max(0, targetSeed - chars.length)).map(_._1)
    var pieceSet: Seq[String] = chars ++ multi
    val seedSet = pieceSet.toSet
    var logp = normalize(subCnt.collect {
      case (p, c) if seedSet.contains(p) => p -> c.toDouble }.toMap, pieceSet)

    val trajectories = mutable.Buffer.empty[Seq[Double]]
    var lastExp: collection.Map[String, Double] = Map.empty
    def runEm(): Unit = {
      val lls = mutable.Buffer.empty[Double]
      var it = 0
      while (it < emIters) {
        val (cnt, ll) = eStep(wc, logp, maxPieceLen)
        lls += ll
        logp = normalize(cnt, pieceSet)
        lastExp = cnt
        it += 1
      }
      trajectories += lls.toSeq
    }
    runEm()
    val targetMulti = math.max(0, vocabSize - chars.length)
    while (pieceSet.length - chars.length > targetMulti) {
      val curMulti = pieceSet.filter(_.length >= 2)
      val keep = math.max(targetMulti,
        math.ceil(curMulti.length * shrinkFactor).toInt)
      val survivors = curMulti
        .sortBy(p => (-lastExp.getOrElse(p, 0.0), p)).take(keep)
      pieceSet = chars ++ survivors
      logp = normalize(lastExp, pieceSet)
      runEm()
    }
    Model(pieceSet.sorted.map(p => (p, logp(p))), maxPieceLen,
      trajectories.toSeq)
  }

  /** Viterbi-best segmentation of every distinct word in `words`
    * (one `word` column) under `model`: (word, pieces array<string>,
    * word_logp). Distributed: candidate substrings explode row-locally,
    * the piece table joins BROADCAST (piece-vocabulary-sized by
    * construction), and the DP is one per-word fold — state is three
    * arrays of |word|+1 elements. Unseen characters fall back to
    * single-char UNK edges at `model.unkLogp`, so segmentation is
    * total and lossless. */
  /** The per-word lattice: (word, _edges) with _edges the sorted
    * struct(e, s, lp, p) array — every vocabulary piece occurrence
    * plus single-char UNK fallbacks; shared by Viterbi and sampling
    * so the two decodings see the identical lattice. */
  private def latticeEdges(spark: SparkSession, words: DataFrame,
      model: Model, maxWordLen: Int): DataFrame = {
    import spark.implicits._
    val maxLen = model.maxPieceLen
    val piecesDf = model.pieces.toDF("p", "lp")
    val guarded = words.select(col("word")).distinct()
      .filter(length(col("word")) > 0)
      .withColumn("word", when(length(col("word")) > maxWordLen,
        raise_error(concat(lit(s"word longer than maxWordLen $maxWordLen: "),
          substring(col("word"), 1, 40)))).otherwise(col("word")))
    // multi-char candidates (l >= 2): row-local explode, then the
    // broadcast piece join keeps only real vocabulary edges
    val multi = guarded.select(col("word"), explode(expr(
      s"""flatten(transform(sequence(0, length(word) - 1), s ->
         |  filter(transform(sequence(2, $maxLen), l ->
         |    IF(s + l <= length(word),
         |       named_struct('s', s, 'p', substring(word, s + 1, l)), NULL)),
         |    x -> x IS NOT NULL)))""".stripMargin)).as("c"))
      .select(col("word"), col("c.s").as("s"), col("c.p").as("p"))
      .join(broadcast(piecesDf), Seq("p"))
    // single-char edges: LEFT join so unseen characters get the UNK
    // fallback instead of silently vanishing from the lattice
    val single = guarded.select(col("word"), explode(expr(
      """transform(sequence(0, length(word) - 1), s ->
        |  named_struct('s', s, 'p', substring(word, s + 1, 1)))""".stripMargin)).as("c"))
      .select(col("word"), col("c.s").as("s"), col("c.p").as("p"))
      .join(broadcast(piecesDf), Seq("p"), "left")
      .withColumn("lp", coalesce(col("lp"), lit(model.unkLogp)))
    multi.unionByName(single)
      .select(col("word"), struct(
        (col("s") + length(col("p"))).cast("int").as("e"),
        col("s").cast("int").as("s"),
        col("lp").as("lp"), col("p").as("p")).as("edge"))
      .groupBy("word").agg(array_sort(collect_list(col("edge"))).as("_edges"))
  }

  def segmentWords(spark: SparkSession, words: DataFrame,
      model: Model, maxWordLen: Int = 256): DataFrame = {
    val edges = latticeEdges(spark, words, model, maxWordLen)
    // DP fold: only a STRICTLY better score updates, so the first edge
    // in (e, s) order wins ties — earliest start = longest piece
    val dp = edges.withColumn("_dp", expr(
      """aggregate(_edges,
        |  named_struct(
        |    'best', concat(array(CAST(0.0 AS DOUBLE)),
        |       transform(sequence(1, length(word)), i -> CAST(-1e30 AS DOUBLE))),
        |    'bps', transform(sequence(0, length(word)), i -> -1),
        |    'bpp', transform(sequence(0, length(word)), i -> '')),
        |  (st, x) -> IF(st.best[x.s] + x.lp > st.best[x.e],
        |    named_struct(
        |      'best', transform(st.best, (v, i) -> IF(i = x.e, st.best[x.s] + x.lp, v)),
        |      'bps',  transform(st.bps,  (v, i) -> IF(i = x.e, x.s, v)),
        |      'bpp',  transform(st.bpp,  (v, i) -> IF(i = x.e, x.p, v))),
        |    st))""".stripMargin))
    dp.select(col("word"),
      expr(
        """reverse(aggregate(sequence(1, length(word)),
          |  named_struct('pos', length(word), 'parts', CAST(array() AS ARRAY<STRING>)),
          |  (st, i) -> IF(st.pos <= 0, st,
          |    named_struct('pos', _dp.bps[st.pos],
          |                 'parts', concat(st.parts, array(_dp.bpp[st.pos])))),
          |  st -> st.parts))""".stripMargin).as("pieces"),
      expr("_dp.best[length(word)]").as("word_logp"))
  }

  /** Stable two-operand log-sum-exp as a SQL snippet — used by BOTH
    * the forward fold and the backward sampling scan, in the SAME
    * accumulation order, so the sampler's final cumulative mass is
    * BITWISE equal to the forward value it normalizes against (the
    * crossing `log u + fwd < fwd` is therefore guaranteed — no
    * fallback branch exists to hide an arithmetic bug). */
  private def lse(p: String, q: String): String =
    s"(greatest($p, $q) + log(exp(least($p, $q) - greatest($p, $q)) + 1.0d))"

  /** SUBWORD REGULARIZATION — the sampling decode that is the point of
    * Kudo 2018: draw a segmentation with probability ∝ P(seg)^alpha
    * by exact forward-filtering backward-sampling over the word's
    * lattice (alpha = 1 the true posterior, alpha = 0 uniform over
    * segmentations, large alpha → Viterbi). Output: (word, pieces,
    * sample_logp) — sample_logp the UNtempered log P(seg).
    *
    * The randomness is DERIVED, not drawn (the E9/E15/E26 md5
    * convention): the uniform at boundary position `pos` is the 32-bit
    * md5 prefix of "word:pos:seed" — a sample is a pure function of
    * (word, model, alpha, seed), reproducible across runs, layouts and
    * engines. One draw per (word, seed): callers wanting fresh
    * segmentations per epoch rotate the seed (the mixtureRepeat epoch
    * convention) — per-OCCURRENCE draws would forfeit the per-distinct-
    * word economics that make the decode corpus-scale.
    *
    * Scale shape: identical to [[segmentWords]] — same lattice frame,
    * one per-word fold; the backward scan re-walks ≤ |word| boundary
    * positions, each an O(edges) pass, so per-word cost is
    * O(|word| × edges) with |word|+1 doubles of state. */
  def sampleSegmentations(spark: SparkSession, words: DataFrame,
      model: Model, seed: Long, alpha: Double = 1.0,
      maxWordLen: Int = 256): DataFrame = {
    require(alpha >= 0.0, s"alpha $alpha must be >= 0")
    val edges = latticeEdges(spark, words, model, maxWordLen)
    val a = s"CAST($alpha AS DOUBLE)"
    // forward: fwd[e] = logsumexp over edges (s -> e) of fwd[s] + a*lp,
    // accumulated in the sorted (e, s) edge order
    val fwd = edges.withColumn("_fwd", expr(
      s"""aggregate(_edges,
         |  concat(array(CAST(0.0 AS DOUBLE)),
         |    transform(sequence(1, length(word)), i -> CAST(-1e30 AS DOUBLE))),
         |  (acc, x) -> transform(acc, (v, i) ->
         |    IF(i = x.e, ${lse("v", s"acc[x.s] + $a * x.lp")}, v)))""".stripMargin))
    // backward: at each boundary pos, draw the incoming edge whose
    // cumulative tempered mass first reaches log(u) + fwd[pos]; the
    // scan accumulates in the same edge order as the forward fold
    val choose =
      s"""aggregate(
         |  filter(_edges, x -> x.e = st.pos),
         |  named_struct('cum', CAST(-1e30 AS DOUBLE), 'cs', -1,
         |               'cp', CAST(NULL AS STRING), 'cl', CAST(0.0 AS DOUBLE)),
         |  (c, x) -> IF(c.cp IS NOT NULL, c,
         |    IF(${lse("c.cum", s"_fwd[x.s] + $a * x.lp")} >=
         |         log((CAST(conv(substring(md5(concat(word, ':',
         |           CAST(st.pos AS STRING), ':', '${seed}')), 1, 8), 16, 10)
         |           AS DOUBLE) + 0.5d) / 4294967296.0d) + _fwd[st.pos],
         |       named_struct('cum', ${lse("c.cum", s"_fwd[x.s] + $a * x.lp")},
         |                    'cs', x.s, 'cp', x.p, 'cl', x.lp),
         |       named_struct('cum', ${lse("c.cum", s"_fwd[x.s] + $a * x.lp")},
         |                    'cs', -1, 'cp', CAST(NULL AS STRING),
         |                    'cl', CAST(0.0 AS DOUBLE)))))""".stripMargin
    fwd.withColumn("_bs", expr(
      s"""aggregate(sequence(1, length(word)),
         |  named_struct('pos', length(word),
         |               'parts', CAST(array() AS ARRAY<STRING>),
         |               'lp', CAST(0.0 AS DOUBLE)),
         |  (st, i) -> IF(st.pos <= 0, st,
         |    named_struct('pos', ($choose).cs,
         |                 'parts', concat(st.parts, array(($choose).cp)),
         |                 'lp', st.lp + ($choose).cl)))""".stripMargin))
      .select(col("word"),
        expr("reverse(_bs.parts)").as("pieces"),
        col("_bs.lp").as("sample_logp"))
  }

  /** Corpus tokenization under the unigram model — the
    * [[TokenizerTrain.tokenizeCorpus]] assembly shape verbatim: all
    * segmentation per distinct word, broadcast-joined onto the
    * position-exploded corpus, re-assembled per document. */
  def tokenizeCorpus(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastWords: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    val vocab = segmentWords(spark,
      docs.select(explode(split(col(textCol), " ")).as("word"))
        .filter(length(col("word")) > 0),
      model).select(col("word"), col("pieces"))
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(if (broadcastWords) broadcast(vocab) else vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("pieces"))))
        .getField("pieces")).as("tokens"))
      .select(col(idCol), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"))
  }

  /** Durable artifact on the G20 [[ModelStore]] convention: the piece
    * table (piece, logp) plus maxPieceLen in `_meta`; the row count
    * cross-checks `_meta` so a torn table fails loudly (the
    * TokenizerArtifact discipline). The EM trajectory is training
    * telemetry, not model state — deliberately not persisted. */
  def save(spark: SparkSession, path: String, model: Model): Unit =
    ModelStore.withLock(spark, path, "UnigramTokenizer") {
      val g = ModelStore.nextGen(spark, path)
      import spark.implicits._
      model.pieces.toDF("piece", "logp").repartition(1)
        .write.mode("overwrite").parquet(ModelStore.genDir(path, g, "pieces"))
      val written = spark.read
        .parquet(ModelStore.genDir(path, g, "pieces")).count()
      require(written == model.pieces.length,
        s"pieces table holds $written rows, model has ${model.pieces.length}")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "unigram-tokenizer", "gen" -> g.toString,
        "nPieces" -> model.pieces.length.toString,
        "maxPieceLen" -> model.maxPieceLen.toString))
      ModelStore.pruneGens(spark, path, g)
    }

  def load(spark: SparkSession, path: String): Model = {
    val kv = ModelStore.readMeta(spark, path, "UnigramTokenizer")
    ModelStore.checkKind(kv, path, "unigram-tokenizer", "1")
    val g = kv("gen").toLong
    val rows = spark.read.parquet(ModelStore.genDir(path, g, "pieces"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
    require(rows.length.toLong == kv("nPieces").toLong,
      s"pieces table holds ${rows.length} rows, _meta claims " +
        s"${kv("nPieces")} — torn artifact, re-save")
    Model(rows, kv("maxPieceLen").toInt, Seq.empty)
  }
}
