package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boundary-respecting sequence packing — the padded counterpart of
  * [[TokenEncode.packSequences]]. The token-exact pack splits documents
  * across sequence boundaries (the GPT pretraining layout); fine-tuning
  * and contamination-sensitive recipes instead require every sequence
  * to hold only WHOLE documents, padded to length, with per-document
  * span metadata so attention never crosses a document boundary
  * (Krell et al. 2021, "Efficient Sequence Packing Without
  * Cross-contamination"; the T5/BERT-family layout). Bin packing is
  * inherently sequential — each placement depends on the running fill —
  * so the distributed form bounds the sequential scope instead of
  * faking global state: documents are ranked in corpus order and cut
  * into consecutive GROUPS of `groupSize`; within a group, next-fit
  * packs docs in order inside ONE aggregate fold (state: the group's
  * bin list — ≤ groupSize longs); sequences never span groups. The
  * price is at most one extra underfull sequence per group versus a
  * single-node next-fit over the whole corpus — a 1/groupSize-order
  * waste bound, paid for embarrassing parallelism (spec asserts
  * group-local parity with the single-node fold, so the approximation
  * is exactly the group seam, nothing else).
  *
  * Scale shape: one range shuffle for the rank ([[RankOps
  * .twoPhaseRowNumber]]), one KEYED fold over (groupSize-doc) groups
  * carrying only (rank, len) — never token arrays — one keyed prefix
  * over per-group bin counts for global sequence ids, then one
  * corpus-sized join + one groupBy(seq_id) whose state is a single
  * sequence's tokens (≤ seqLen ids). No single-partition stage.
  *
  * Determinism: assignment is a pure function of (ids in `idCol`
  * order, seqLen, groupSize) — layout-independent (spec'd).
  */
object PackWhole {

  /** Pack encoded documents into fixed-length sequences WITHOUT
    * splitting any document: each document's payload (its ids plus one
    * trailing `eodId`) lands in exactly one sequence; sequences are
    * padded to `seqLen` with `padId`. Output: (seq_id, ids[seqLen],
    * n_tokens = real ids before padding, n_docs, doc_lens — the
    * per-document payload lengths in packing order, the attention-mask
    * spans trainers need). A document whose payload exceeds `seqLen`
    * fails loudly — chunk it first ([[ChunkOps]]); silently truncating
    * training text is the one thing a pack must never do. `idCol` must
    * be unique (the [[TokenEncode.packSequences]] probe, same hazard:
    * mixtureRepeat epochs share doc_id — epoch-qualify first). */
  /** Packing strategies. `nextfit` fills bins in corpus order — the
    * streaming-friendly baseline whose sequences are contiguous runs of
    * ranks (consecutive-doc locality). `bestfit` is best-fit-DECREASING
    * within each group: docs sorted by (len desc, rank), each placed in
    * the FULLEST bin that still fits, else a new bin — the classic BFD
    * bound (≤ 11/9·OPT + 2/3 bins) and the direction of Krell et al.'s
    * sorted histogram packing; on heterogeneous lengths it recovers
    * most of next-fit's padding waste (the spec MEASURES fewer
    * sequences / higher fill on the real corpus). Both are pure
    * functions of (ids in rank order, lengths, seqLen, groupSize). */
  val Strategies: Set[String] = Set("nextfit", "bestfit")

  def packSequencesWhole(encoded: DataFrame, seqLen: Int,
      eodId: Long = 1L, padId: Long = 0L, idCol: String = "doc_id",
      groupSize: Int = 512, numPartitions: Int = 32,
      requireUniqueIds: Boolean = true,
      strategy: String = "nextfit"): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    require(groupSize > 0, s"groupSize $groupSize must be positive")
    require(Strategies.contains(strategy),
      s"strategy '$strategy' not in $Strategies")
    if (requireUniqueIds) {
      val dup = encoded.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select(col(idCol)).limit(3).collect()
      require(dup.isEmpty,
        s"duplicate $idCol values (e.g. ${dup.map(_.get(0)).mkString(", ")}) — " +
          "epoch-qualify mixtureRepeat output or pass requireUniqueIds = false")
    }
    val L = lit(seqLen.toLong)
    // payload length; the oversize guard rides the row (same class as
    // packSequences' 2^31 guard: no extra probe pass, named failure)
    val lens = encoded
      .select(col(idCol), (size(col("ids")).cast("long") + 1L).as("_len"))
      .withColumn("_len",
        when(col("_len") <= L, col("_len"))
          .otherwise(raise_error(concat(lit("document "),
            col(idCol).cast("string"), lit(" payload ("),
            col("_len").cast("string"),
            lit(s" ids with eod) exceeds seqLen=$seqLen — a whole-document " +
              "pack cannot hold it; chunk first (ChunkOps.chunkPlan)")))))
    val ranked = RankOps.twoPhaseRowNumber(lens, "_r", numPartitions,
        col(idCol))
      .select(col(idCol), col("_len"),
        expr(s"CAST(_r - 1 AS BIGINT) div $groupSize").as("_g"),
        (col("_r") - 1).cast("long").as("_rank"))

    // the per-group fold: one aggregate expression over the group's
    // docs in STRATEGY order; state never holds token arrays
    val groups = strategy match {
      case "nextfit" =>
        // corpus order; state = the bin-per-doc list + the running fill
        val sorted = array_sort(collect_list(struct(col("_rank"), col(idCol),
          col("_len"))))
        val folded = aggregate(
          col("_docs"),
          struct(array().cast("array<bigint>").as("bins"),
            lit(Long.MaxValue / 2).as("filled")),
          (acc, d) => {
            // try_element_at: element_at(-1) THROWS on the empty start array
            val lastBin = coalesce(try_element_at(acc.getField("bins"), lit(-1)),
              lit(-1L))
            val fits = acc.getField("filled") + d.getField("_len") <= L
            struct(
              concat(acc.getField("bins"),
                array(when(fits, lastBin).otherwise(lastBin + 1L))).as("bins"),
              when(fits, acc.getField("filled") + d.getField("_len"))
                .otherwise(d.getField("_len")).as("filled"))
          },
          acc => acc.getField("bins"))
        ranked.groupBy(col("_g"))
          .agg(sorted.as("_docs"))
          .withColumn("_bins", folded)
          .withColumn("_nbins", element_at(col("_bins"), -1) + 1L)
      case "bestfit" =>
        // (len desc, rank) order; state = every bin's fill (≤ groupSize
        // longs) + the bin-per-doc list. Each step: the FULLEST bin
        // that still fits (array_max over the fitting fills;
        // array_position's first-occurrence rule breaks fill ties to
        // the LOWEST bin id — deterministic), else open bin #size.
        // O(groupSize) per step, same class as next-fit's array concat
        val sorted = array_sort(collect_list(struct((-col("_len")).as("_nl"),
          col("_rank"), col(idCol), col("_len"))))
        val folded = aggregate(
          col("_docs"),
          struct(array().cast("array<bigint>").as("fills"),
            array().cast("array<bigint>").as("bins")),
          (acc, d) => {
            val len = d.getField("_len")
            val fills = acc.getField("fills")
            val bestFill = array_max(filter(fills, f => f + len <= L))
            val pos = array_position(fills, bestFill) // null iff no fit
            val newFills = when(bestFill.isNotNull,
                transform(fills, (f, i) =>
                  when(i === (pos - 1L).cast("int"), f + len).otherwise(f)))
              .otherwise(concat(fills, array(len)))
            val binId = when(bestFill.isNotNull, pos - 1L)
              .otherwise(size(fills).cast("long"))
            struct(newFills.as("fills"),
              concat(acc.getField("bins"), array(binId)).as("bins"))
          },
          acc => struct(acc.getField("bins").as("bins"),
            size(acc.getField("fills")).cast("long").as("nbins")))
        ranked.groupBy(col("_g"))
          .agg(sorted.as("_docs"))
          .withColumn("_fb", folded)
          .withColumn("_bins", col("_fb").getField("bins"))
          .withColumn("_nbins", col("_fb").getField("nbins"))
          .drop("_fb")
    }

    // global sequence ids: prefix the per-group bin counts (groups are
    // corpus/groupSize rows — keyed, distributed)
    val offs = RankOps.exclusivePrefixSum(
      groups.select(col("_g"), col("_docs"), col("_bins"), col("_nbins")),
      "_nbins", "_goff", numPartitions, col("_g"))
    val assign = offs
      .select(col("_goff"),
        explode(arrays_zip(col("_docs"), col("_bins"))).as("_z"))
      .select(col("_z").getField("_docs").getField(idCol).as(idCol),
        col("_z").getField("_docs").getField("_rank").as("_rank"),
        (col("_goff") + col("_z").getField("_bins")).as("seq_id"))

    // assemble: join payloads back by id, one groupBy(seq_id) whose
    // state is ≤ seqLen ids; pad to exactly seqLen
    val payloads = encoded.select(col(idCol),
      concat(col("ids"), array(lit(eodId))).as("_ids"))
    assign.join(payloads, Seq(idCol))
      .groupBy(col("seq_id"))
      .agg(flatten(array_sort(collect_list(struct(col("_rank"), col("_ids"))))
          .getField("_ids")).as("_raw"),
        count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("_rank"),
          size(col("_ids")).cast("long").as("l"))))
          .getField("l").as("doc_lens"))
      .select(col("seq_id"),
        concat(col("_raw"), array_repeat(lit(padId),
          (L - size(col("_raw"))).cast("int"))).as("ids"),
        size(col("_raw")).cast("long").as("n_tokens"),
        col("n_docs"), col("doc_lens"))
  }
}
