package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned-tokenizer training: byte-pair-encoding merge rules from a
  * corpus (the Sennrich et al. 2016 algorithm — "Neural Machine
  * Translation of Rare Words with Subword Units", the tokenizer-training
  * step every LLM data pipeline runs downstream of curation).
  *
  * The scale shape is the point. BPE training NEVER needs the corpus
  * after one pass: it operates on WORD COUNTS (Zipf-small — the
  * vocabulary), so the corpus is touched exactly once (a word-count
  * aggregation, map-side combinable), and every merge round after that
  * is vocabulary-sized work: one keyed aggregation over adjacent symbol
  * pairs (weighted by word count), a driver-side argmax of ONE row, and
  * a narrow per-word re-tokenization of the words containing the merged
  * pair — the same keyed-job-per-round convergence shape as
  * [[DedupClusters.connectedComponents]], with lineage truncated per
  * round. Nothing is ever corpus-buffered and no state exceeds the
  * vocabulary.
  *
  * Determinism: ties on pair count break by the pair's lexicographic
  * (left, right) order, so the learned merge sequence is a pure function
  * of the word counts — layout- and cluster-independent (spec'd against
  * a single-node reference implementation and across repartitioning).
  *
  * Reference behavior (tokenize.py-free repo: this follows the published
  * algorithm): within a word, each adjacent symbol position counts once
  * (overlaps included — "aaa" contributes (a,a) twice at count 1), and a
  * merge applies greedily left-to-right ("aaa" + merge (a,a) → [aa, a]).
  * Words are whitespace tokens; no end-of-word marker is appended (a
  * caller wanting one can suffix it in `textCol` first).
  */
object TokenizerTrain {

  /** (word, cnt, syms) — the vocabulary-sized training state: distinct
    * whitespace words with occurrence counts, split into single-char
    * symbols. The ONLY corpus-sized computation in this object. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        filter(split(col("word"), ""), x => x =!= ""))

  /** One greedy left-to-right merge of adjacent (a, b) → a+b inside a
    * symbol array: fold the array, merging when the accumulator's last
    * element is `a` (not itself produced by this merge — the fold
    * consumes `a` on merging, so overlaps resolve left-to-right exactly
    * like the reference algorithm) and the next symbol is `b`. */
  private def mergeExpr(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  // the size guard matters twice over: sequence(0, -1) on a one-symbol
  // word would DESCEND, and ANSI mode makes an out-of-range getItem an
  // error, not a null
  private def hasPair(syms: Column, a: String, b: String): Column =
    size(syms) >= 2 && exists(sequence(lit(0), size(syms) - 2),
      i => syms.getItem(i) === lit(a) && syms.getItem(i + 1) === lit(b))

  /** Learn `numMerges` BPE merge rules from `docs(textCol)`. Returns the
    * merges IN ORDER. Stops early when no adjacent pair occurs at least
    * `minCount` times (default 2 — merging a singleton pair buys
    * nothing). */
  def learnMerges(docs: DataFrame, numMerges: Int,
      textCol: String = "text", minCount: Long = 2L,
      anchor: Anchor = Anchor.Local): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges must be >= 0")
    var words = anchor(wordCounts(docs, textCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      // adjacent pairs of the CURRENT symbolization: one narrow fan-out
      // (bounded by total symbols in the vocabulary) into one keyed sum
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), col("syms"),
          explode(sequence(lit(0), size(col("syms")) - 2)).as("i"))
        .select(col("cnt"), col("syms").getItem(col("i")).as("a"),
          col("syms").getItem(col("i") + 1).as("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        // re-tokenize ONLY words containing the pair; the rest pass
        // through untouched — no join, a per-row conditional projection
        words = anchor(words
          .withColumn("syms",
            when(hasPair(col("syms"), a, b), mergeExpr(col("syms"), a, b))
              .otherwise(col("syms"))))
      }
    }
    merges.toSeq
  }

  /** [[learnMerges]] with the merge loop on the DRIVER — the right
    * engine split for production merge counts. The corpus cost is
    * identical (the ONE word-count pass); the difference is where the
    * vocabulary-sized rounds run. A real tokenizer learns 30k–100k
    * merges, and a Spark job per merge is 30k–100k scheduler
    * round-trips over a table that is KBs–MBs after Zipf — so this
    * variant collects the word counts once (driver-bounded: `maxVocab`
    * guards the collect exactly like PercentileOps caps group state,
    * failing loudly rather than pulling an unbounded set) and runs the
    * rounds in memory with an indexed pair table (only words containing
    * the merged pair are touched per round — the Sennrich reference
    * structure). Bit-identical output to [[learnMerges]] by
    * construction (same counts, same tie-break; spec'd equal on the
    * real corpus). Use [[learnMerges]] only when the vocabulary
    * genuinely exceeds driver memory. */
  def learnMergesLocal(docs: DataFrame, numMerges: Int,
      textCol: String = "text", minCount: Long = 2L,
      maxVocab: Int = 10000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges must be >= 0")
    val rows = wordCounts(docs, textCol).select("word", "cnt")
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab — raise the cap if the " +
        "driver really has the memory, or use learnMerges (distributed rounds)")
    val words: Array[Vector[String]] =
      rows.map(_.getString(0).map(_.toString).toVector)
    val cnts: Array[Long] = rows.map(_.getLong(1))

    // pair -> total count and pair -> indices of words containing it;
    // maintained incrementally, so each round touches only the words
    // holding the merged pair
    val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val where = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = pc(p) + sign * cnts(i)
        if (n == 0L) pc.remove(p) else pc(p) = n
        if (sign > 0)
          where.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += i
        j += 1
      }
      if (sign < 0) {
        // remove stale membership lazily: cheaper to re-add below than
        // to diff pair sets per word
        var k = 0
        while (k < s.length - 1) {
          where.get((s(k), s(k + 1))).foreach(_ -= i)
          k += 1
        }
      }
    }
    words.indices.foreach(addWord(_, 1L))

    def mergeGreedy(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges && pc.nonEmpty) {
      // argmax with the SAME tie-break as the distributed round:
      // count desc, then (left, right) lexicographic
      val (best, n) = pc.min(Ordering.by[((String, String), Long),
        (Long, String, String)] { case ((a, b), c) => (-c, a, b) })
      if (n < minCount) done = true
      else {
        merges += best
        val touched = where.getOrElse(best, Set.empty[Int]).toArray
        touched.foreach { i =>
          addWord(i, -1L)
          words(i) = mergeGreedy(words(i), best._1, best._2)
          addWord(i, 1L)
        }
      }
    }
    merges.toSeq
  }

  /** Apply learned merges, in order, to a vocabulary: (word, syms) for
    * every distinct word. Corpus tokenization is then a broadcast join
    * of this Zipf-small table onto the corpus's exploded words — the
    * vocabulary is the unit of work, never the corpus.
    *
    * Plan-depth bound: the fold checkpoints the (vocabulary-sized)
    * table every 8 merges AND after the final merge, so no caller ever
    * sees a residual projection chain. Each merge level's `syms`
    * expression references the previous level's ~6 times (size ×2 +
    * getItem ×2 in hasPair, the fold input, the otherwise branch), so
    * an optimizer rule that substitutes through the chain — collapse /
    * pruning / pushdown feeding a downstream filter, join, or explode
    * on a syms-derived column — builds a tree that grows ~6× PER
    * LEVEL: at 6 residual levels that is a ~10⁵-copy tree, observed as
    * a 187 MiB task binary, minutes of optimizer time, and a 600 s
    * interpreted-eval task on a table that otherwise aggregates in
    * milliseconds. The terminal checkpoint caps residual depth at ZERO
    * for every downstream plan; the every-8 checkpoint bounds the
    * fold's own intermediate depth (a 30k-projection plan would
    * overflow the analyzer long before pushdown mattered). */
  def tokenizeWords(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", anchor: Anchor = Anchor.Local): DataFrame =
    merges.zipWithIndex.foldLeft(wordCounts(docs, textCol)) {
      case (w, ((a, b), i)) =>
        val next = w.withColumn("syms",
          when(hasPair(col("syms"), a, b), mergeExpr(col("syms"), a, b))
            .otherwise(col("syms")))
        if ((i + 1) % 8 == 0 || (i + 1) == merges.length) anchor(next)
        else next
    }.select(col("word"), col("cnt"), col("syms").as("tokens"))

  /** Corpus tokenization: every document as its flat BPE token stream
    * (`idCol`, tokens array<string>, n_tokens). The merge application
    * runs ONCE per distinct word ([[tokenizeWords]] — vocabulary-sized,
    * numMerges conditional projections over the Zipf-small table), then
    * broadcast-joins onto the corpus's position-exploded words and
    * re-assembles per document. Scale shape: the only corpus-sized
    * shuffle is the keyed re-assembly groupBy on `idCol` (unavoidable —
    * the output is a per-document row); the join side is the broadcast
    * vocabulary, and word order is restored from the exploded position,
    * not from any layout assumption.
    *
    * `broadcastWords`: the distinct-WORD table grows with the corpus by
    * Heaps' law and can exceed broadcast limits at extreme scale —
    * `false` drops the forced hint and lets the size-based planner
    * choose (a shuffle join keyed by word once the table outgrows the
    * threshold; one extra corpus shuffle), bit-identical results
    * (spec'd). */
  def tokenizeCorpus(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      broadcastWords: Boolean = true): DataFrame = {
    val vocab = tokenizeWords(docs, merges, textCol)
      .select(col("word"), col("tokens"))
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(if (broadcastWords) broadcast(vocab) else vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("tokens"))))
        .getField("tokens")).as("tokens"))
      .select(col(idCol), col("tokens"), size(col("tokens")).cast("long").as("n_tokens"))
  }
}
