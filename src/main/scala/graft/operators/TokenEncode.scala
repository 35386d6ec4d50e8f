package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-ID encoding and fixed-length sequence packing — the step
  * between [[TokenizerTrain]] (learned merges) and the tensors a
  * trainer actually consumes. A training pipeline does not feed string
  * tokens to a model: it maps tokens to dense integer ids against a
  * frozen vocabulary, concatenates documents with an end-of-document
  * separator, and slices the resulting global token stream into
  * context-length rows. (The reference stops at string features —
  * main.py:37-340 serves feature vectors — so this family, like the
  * rest of the tokenizer group, is the LLM-pipeline extension the
  * engine adds on top; the algorithmics follow the published BPE
  * pipeline, Sennrich et al. 2016.)
  *
  * Scale shape, per operator:
  *  - [[buildVocab]]: vocabulary-sized end to end — the one corpus pass
  *    is [[TokenizerTrain.wordCounts]] inside `tokenizeWords`; id
  *    assignment is a [[RankOps.twoPhaseRowNumber]] over the Zipf-small
  *    token table (no single-partition window).
  *  - [[encodeCorpus]]: the id mapping happens at the VOCABULARY level
  *    (per distinct word, not per occurrence), then reaches the corpus
  *    through the same broadcast join + per-document re-assembly as
  *    [[TokenizerTrain.tokenizeCorpus]] — encoding adds ZERO
  *    corpus-sized shuffles over plain tokenization.
  *  - [[packSequences]]: one [[RankOps.exclusivePrefixSum]] gives every
  *    document its global token offset; each document then emits only
  *    the fragments of the sequences it overlaps (a per-row explode of
  *    at most len/seqLen + 1 rows) and one keyed groupBy re-assembles
  *    each sequence from its fragments. Per-sequence state is seqLen
  *    ids — never a document, never the corpus — so a 100 TB token
  *    stream packs with the same per-task memory as a laptop run.
  *
  * Determinism: vocab ids are a pure function of the corpus word counts
  * (count-desc, token-lexicographic — layout-independent by the
  * twoPhaseRowNumber contract), and the packed stream is a pure
  * function of (encoded docs, seqLen, eodId) — document order is the
  * id-column sort, fragment order the global offset. Spec'd against a
  * single-node reference and across repartitioning.
  */
object TokenEncode {

  /** Default special ids: 0 = unknown token, 1 = end-of-document. */
  val UnkToken = "<unk>"
  val EodToken = "<eod>"

  /** Frozen vocabulary from a training corpus: (token, id, cnt), with
    * `specials` occupying ids 0..k-1 (cnt 0) and every BPE token of the
    * merged corpus following densely, ordered by corpus count
    * descending then token lexicographic. Fails loudly if a corpus
    * token collides with a special (the ambiguity would make decode
    * lossy) — escape such text upstream instead. */
  def buildVocab(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text",
      specials: Seq[String] = Seq(UnkToken, EodToken),
      numPartitions: Int = 32): DataFrame = {
    require(specials.distinct.length == specials.length,
      s"duplicate special tokens in $specials")
    // vocabulary-sized; the eager checkpoint runs the token
    // aggregation exactly once (the collision probe and the rank phase
    // would otherwise each re-run it) — and tokenizeWords itself
    // terminally checkpoints, so the aggregation never plans against
    // the merge fold (the tokenizeWords plan-depth note)
    val toks = TokenizerTrain.tokenizeWords(docs, merges, textCol)
      .select(explode(col("tokens")).as("token"), col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(true)
    if (specials.nonEmpty) {
      val clash = toks.filter(col("token").isin(specials: _*))
        .select(col("token")).limit(1).collect()
      require(clash.isEmpty,
        s"corpus token '${clash.headOption.map(_.getString(0)).getOrElse("")}' " +
          "collides with a special token — escape it upstream")
    }
    val ranked = RankOps.twoPhaseRowNumber(toks, "_vr", numPartitions,
        col("cnt").desc, col("token"))
      .select(col("token"),
        (col("_vr").cast("long") - 1L + specials.length).as("id"), col("cnt"))
    val specialRows = specials.zipWithIndex.map { case (t, i) => (t, i.toLong, 0L) }
    if (specialRows.isEmpty) ranked
    else ranked.sparkSession.createDataFrame(specialRows)
      .toDF("token", "id", "cnt").unionByName(ranked)
  }

  /** The vocabulary-sized id mapping: every distinct word of `docs` as
    * its id sequence under `merges` + `vocab` — (word, ids array<long>).
    * Tokens absent from the vocabulary (possible when encoding a corpus
    * the vocab wasn't built on) map to `unkId`. This is where ALL
    * token→id work happens; the corpus only ever sees the finished
    * word→ids table through a broadcast join. */
  def encodeWords(docs: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, textCol: String = "text",
      unkId: Long = 0L): DataFrame =
    // tokenizeWords terminally checkpoints, so the vocab join's
    // null-filter on the exploded token meets a flat plan, never the
    // merge fold (the tokenizeWords plan-depth note)
    TokenizerTrain.tokenizeWords(docs, merges, textCol)
      .select(col("word"), posexplode(col("tokens")).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .groupBy(col("word"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("id")))),
        s => coalesce(s.getField("id"), lit(unkId))).as("ids"))

  /** Corpus encoding: every document as its flat id stream
    * (`idCol`, ids array<long>, n_tokens). Same plan shape as
    * [[TokenizerTrain.tokenizeCorpus]] — broadcast the word→ids
    * vocabulary onto position-exploded words, re-assemble per document;
    * the only corpus-sized shuffle is the unavoidable per-document
    * groupBy. Documents with no words (empty/whitespace text) do not
    * appear, exactly like tokenizeCorpus.
    *
    * `broadcastWords`: the TOKEN vocabulary is bounded by numMerges +
    * alphabet (always broadcastable — its hint stays), but the WORD
    * table grows with the corpus by Heaps' law and can exceed broadcast
    * limits at 100 TB. `false` drops the forced hint on the word join
    * and lets the size-based planner choose — broadcast while it fits,
    * shuffle join keyed by word once it doesn't (one extra corpus
    * shuffle, the honest price); results are bit-identical (spec'd). */
  def encodeCorpus(docs: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      unkId: Long = 0L, broadcastWords: Boolean = true): DataFrame = {
    val words = encodeWords(docs, merges, vocab, textCol, unkId)
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(if (broadcastWords) broadcast(words) else words, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("ids"))))
        .getField("ids")).as("ids"))
      .select(col(idCol), col("ids"), size(col("ids")).cast("long").as("n_tokens"))
  }

  /** Pack encoded documents into fixed-length training sequences:
    * concatenate every document's ids (in ascending `idCol` order),
    * append `eodId` after each document, slice the global stream into
    * rows of exactly `seqLen` ids — (seq_id, ids, n_tokens). Every
    * sequence has n_tokens == seqLen except possibly the last
    * (`dropIncomplete = true` drops that tail, the usual trainer
    * choice). Documents SPLIT across sequence boundaries — this is the
    * token-exact pretraining pack, where [[TrainingExport.writeShards]]
    * keeps chunks whole and shards approximate.
    *
    * Scale: one exclusive prefix sum (keyed, driver state = one long
    * per partition), a per-document explode of only the overlapped
    * sequences, one groupBy(seq_id) whose per-group state is seqLen
    * ids. No single-partition stage (spec-audited).
    *
    * `idCol` MUST be unique: the prefix sum orders by it, and tied keys
    * would receive overlapping offsets — overlapping, corrupt sequences,
    * not merely a nondeterministic order. Duplicates are a realistic
    * hazard (mixtureRepeat epochs share doc_id by design), so the
    * default fail-closed probe (one keyed aggregation, ~the cost of the
    * pack's own groupBy) rejects them loudly; a caller that guarantees
    * uniqueness upstream opts out via `requireUniqueIds = false` —
    * after mixtureRepeat, epoch-qualify first (`doc_id·N + epoch`, the
    * E18 composition convention). */
  def packSequences(encoded: DataFrame, seqLen: Int, eodId: Long = 1L,
      idCol: String = "doc_id", numPartitions: Int = 32,
      dropIncomplete: Boolean = false,
      requireUniqueIds: Boolean = true): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    if (requireUniqueIds) {
      val dup = encoded.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select(col(idCol)).limit(3).collect()
      require(dup.isEmpty,
        s"duplicate $idCol values (e.g. ${dup.map(_.get(0)).mkString(", ")}) — " +
          "tied prefix-sum keys would pack overlapping sequences; make the id " +
          "unique (epoch-qualify mixtureRepeat output) or pass " +
          "requireUniqueIds = false if uniqueness is guaranteed upstream")
    }
    // the per-document slice arithmetic below is int-indexed (slice
    // bounds), so one document may hold at most ~2^31 tokens — raise
    // inside the row rather than silently wrapping the cast (the global
    // stream's 2^53 bound is separate: it is the prefix-sum's domain).
    // A document that big should have been chunked (E16) long before
    // packing; no realistic corpus hits this, hence a row-level guard,
    // not an extra probe pass.
    val withEod = encoded
      .select(col(idCol), concat(col("ids"), array(lit(eodId))).as("_ids"))
      .withColumn("_len", size(col("_ids")).cast("long"))
      .withColumn("_len",
        when(col("_len") < lit(Int.MaxValue.toLong), col("_len"))
          .otherwise(raise_error(concat(lit("document "),
            col(idCol).cast("string"),
            lit(" exceeds 2^31 tokens — the per-document slice index is " +
              "int-bounded; chunk the document (ChunkOps.chunkPlan) first")))))
    val offs = RankOps.exclusivePrefixSum(withEod, "_len", "_off",
      numPartitions, col(idCol))
    val L = lit(seqLen.toLong)
    // sequences this document overlaps: [_off, _off + _len) in token
    // space → [first, last] in sequence space (integer div — FP
    // division would round past 2^53 tokens); slice bounds are the
    // intersection of the sequence's token range with the document's
    val frags = offs
      .select(col("_ids"), col("_off"),
        explode(sequence(expr(s"_off div ${seqLen}L"),
          expr(s"(_off + _len - 1) div ${seqLen}L"))).as("seq_id"),
        col("_len"))
      .withColumn("_from", greatest(col("seq_id") * L, col("_off")))
      .withColumn("_until", least((col("seq_id") + 1L) * L, col("_off") + col("_len")))
      .select(col("seq_id"), col("_off"),
        slice(col("_ids"), (col("_from") - col("_off") + 1L).cast("int"),
          (col("_until") - col("_from")).cast("int")).as("_frag"))
    val seqs = frags
      .groupBy(col("seq_id"))
      .agg(flatten(array_sort(collect_list(struct(col("_off"), col("_frag"))))
        .getField("_frag")).as("ids"))
      .select(col("seq_id"), col("ids"), size(col("ids")).cast("long").as("n_tokens"))
    if (dropIncomplete) seqs.filter(col("n_tokens") === seqLen) else seqs
  }

  /** Tokenizer coverage of a corpus under a frozen vocabulary: ONE row
    * (n_tokens, n_unk, oov_rate, distinct_oov_tokens) measuring how
    * much of `docs` the vocab actually expresses — the held-out
    * evaluation a pipeline runs BEFORE committing a learned tokenizer
    * to a 100 TB encode (an unk-heavy vocab silently destroys training
    * text; this is the gauge).
    *
    * Scale shape: the corpus is touched exactly once — the same
    * map-side-combinable word count as training — and every unk
    * decision happens per distinct (word, token) at the vocabulary
    * level, weighted back by word count. Occurrence-exact without ever
    * exploding the corpus's token stream. */
  def coverageStats(docs: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, textCol: String = "text"): DataFrame =
    TokenizerTrain.tokenizeWords(docs, merges, textCol)
      .select(col("cnt"), explode(col("tokens")).as("token"))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("id").isNull, col("cnt"))), lit(0L)).as("n_unk"),
        count_distinct(when(col("id").isNull, col("token")))
          .as("distinct_oov_tokens"))
      // an all-empty corpus reports 0 tokens with a null (undefined)
      // rate, not a null row
      .select(col("n_tokens"), col("n_unk"),
        when(col("n_tokens") > 0,
          col("n_unk").cast("double") / col("n_tokens")).as("oov_rate"),
        col("distinct_oov_tokens"))

  /** Decode ids back to tokens through the vocabulary — the parity
    * check's inverse mapping, and the debugging tool a pipeline wants
    * anyway. Ids absent from `vocab` decode to null (the caller chose
    * the unk id; decoding cannot invent what encode discarded). */
  def decode(encoded: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    encoded
      .select(col(idCol), posexplode(col("ids")).as(Seq("pos", "id")))
      .join(broadcast(vocab.select(col("id"), col("token"))), Seq("id"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        s => s.getField("token")).as("tokens"))
}
