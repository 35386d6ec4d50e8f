package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (SURVEY §2 E10): flag training
  * documents sharing word n-grams with an evaluation/benchmark set —
  * the standard decontamination step before LLM training.
  *
  * Scale shape: both sides shingle-explode, the overlap is ONE
  * equi-join on the shingle hash (8-byte key, not the string), and
  * aggregation is per (doc, benchmark-doc) then per doc — all keyed,
  * all map-side combinable. The benchmark side is orders of magnitude
  * smaller than the corpus, so its exploded shingles broadcast; the
  * corpus streams. Dedup-vs-benchmark is thus O(corpus shingles), never
  * pairwise.
  */
object Contamination {

  private[graft] def shingleHashes(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))

  /** Documents with ≥ `minOverlap` distinct 3-grams shared with the
    * benchmark set: (doc_id, n_contaminated, n_shingles, worst_bench_id,
    * worst_overlap).
    *
    * The benchmark index is deduplicated BY TEXT before shingling:
    * identical benchmark texts have identical shingle sets, so each
    * distinct text is indexed once under its max bench_id with its copy
    * count. Per-(doc, text) overlap then weights Σ-contamination by the
    * copy count, and the (overlap, bench_id) argmax is unchanged —
    * within a text group every copy ties on overlap so the max id wins,
    * which is exactly the group representative. Provably identical
    * output for ANY input; on a duplicated benchmark (the 50× stress:
    * 95 %-dup corpus ⇒ 95 %-dup benchmark) it cuts the shingle-join
    * fan-out by the duplication factor (188 s → ~8 s measured).
    *
    * `broadcastBench = false` drops the broadcast hint (the
    * E22/E23 `broadcastModel` convention) for "benchmark" sides that
    * are themselves corpus-scale — a held-out SPLIT of the training
    * corpus (Splits.holdoutLeaks) is a constant fraction of it, not a
    * benchmark-sized table; the size-based planner shuffles instead,
    * identical output (spec'd). */
  def contamination(docs: DataFrame, bench: DataFrame,
      minOverlap: Int = 3, broadcastBench: Boolean = true): DataFrame = {
    val benchGroups = bench.groupBy(col("text"))
      .agg(max(col("bench_id")).as("bench_id"), count(lit(1)).as("n_copies"))
    val benchSh = shingleHashes(benchGroups, "bench_id")
      .join(benchGroups.select("bench_id", "n_copies"), Seq("bench_id"))
    val corpusSh = shingleHashes(docs, "doc_id")
    val sizes = corpusSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val perPair = corpusSh
      .join(if (broadcastBench) broadcast(benchSh) else benchSh, Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"), max(col("n_copies")).as("n_copies"))
    // worst benchmark match via a struct-valued MAX: both engines order
    // structs lexicographically by field, so max((overlap, bench_id)) is
    // the argmax with a deterministic bench_id tie-break — and unlike the
    // earlier packed overlap*1e7+bench_id key, it cannot corrupt when
    // bench_id >= 1e7 (the stress generator's id-shift produces exactly
    // such ids)
    perPair
      .groupBy(col("doc_id"))
      .agg(sum(col("overlap") * col("n_copies")).as("n_contaminated"),
        max(struct(col("overlap"), col("bench_id"))).as("_wk"))
      .select(col("doc_id"), col("n_contaminated"),
        col("_wk.bench_id").as("worst_bench_id"),
        col("_wk.overlap").as("worst_overlap"))
      .join(sizes, Seq("doc_id"))
      .filter(col("worst_overlap") >= minOverlap)
      .select("doc_id", "n_shingles", "n_contaminated", "worst_bench_id", "worst_overlap")
      .orderBy(col("doc_id"))
  }

  /** SPAN-level decontamination — excise the colliding region instead
    * of dropping the document (the GPT-3 recipe exactly: Brown et al.
    * 2020 Appendix C remove a window around each 13-gram collision
    * with the benchmark and keep the rest of the document; dropping
    * whole documents over one quoted benchmark sentence throws away
    * good tokens, which is the whole reason the published stacks
    * excise). [[contamination]] is the DETECTION/reporting side
    * (whole-doc overlap counts); this is the REMOVAL side.
    *
    * Rule: every length-`window` word span of a corpus document whose
    * fingerprint appears among the benchmark's length-`window` spans
    * excises, widened by `buffer` words on EACH side (GPT-3's
    * 200-character margin, token-denominated), overlaps merged into
    * one continuous cut. The span machinery is [[SpanDup]]'s verbatim
    * — same spanFrame (flagged windows mean the same thing as C8's),
    * same mergedIvs/keptWords rebuild folds (buffered starts may go
    * negative; intervals clamp AFTER the fixed-width merge), same
    * collision class (xxhash64 can over-excise at ≈2⁻⁶⁴, never miss a
    * true collision). Untouched documents return their text VERBATIM.
    *
    * Honest limits, documented not hidden: (1) benchmark items shorter
    * than `window` words produce no spans and are invisible here —
    * [[contamination]]'s 3-gram whole-doc overlap is the companion
    * that catches them; (2) an excision splices previously-distant
    * words, so a PATHOLOGICAL corpus can mint a new colliding window
    * across the seam — one more pass converges (the spec pins the
    * honest one-pass contract on a constructed seam).
    *
    * Scale shape: the benchmark's distinct span fingerprints broadcast
    * (`broadcastBench = false` for corpus-scale holdouts, the
    * [[contamination]] convention); the corpus pays its span explode +
    * one equi-join on the 8-byte fp; only documents carrying a flagged
    * window join the rebuild (build side bounded by actual
    * contamination); the rebuild is SpanDup's two per-document folds,
    * cursor state only. Stream-transparent against a frozen benchmark
    * (stream-static join, no state).
    *
    * Output: every input document as (idCol, textCol cleaned,
    * n_tokens, removed_tokens, n_flagged_windows) — kept + removed ≡
    * original token count (conservation, spec'd). */
  def spanDecontaminate(docs: DataFrame, bench: DataFrame,
      window: Int = 13, buffer: Int = 20, idCol: String = "doc_id",
      textCol: String = "text", rolling: Boolean = true,
      broadcastBench: Boolean = true): DataFrame = {
    require(window >= 1, s"window $window must be >= 1")
    require(buffer >= 0, s"buffer $buffer must be >= 0")
    val benchFps = SpanDup.spanFrame(bench, window, "bench_id", textCol,
      rolling).select(col("fp")).distinct()
    val spans = SpanDup.spanFrame(docs, window, idCol, textCol, rolling)
    val removeStarts = spans
      .join(if (broadcastBench) broadcast(benchFps) else benchFps, Seq("fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nflag"),
        // buffered starts, possibly negative — the fixed-width merge
        // needs the un-clamped arithmetic; clamp after
        array_sort(collect_list(col("p") - lit(buffer.toLong))).as("_starts"))
    val W = lit(window.toLong + 2L * buffer)
    docs.select(col(idCol), col(textCol), SpanDup.wordsOf(textCol).as("_ws"))
      .join(removeStarts, Seq(idCol), "left")
      .withColumn("_ivs", when(col("_starts").isNotNull,
        transform(SpanDup.mergedIvs(col("_starts"), W),
          iv => struct(greatest(iv.getField("f"), lit(0L)).as("f"),
            least(iv.getField("u"), size(col("_ws")).cast("long")).as("u")))))
      .withColumn("_kept", when(col("_ivs").isNotNull,
        SpanDup.keptWords(col("_ws"), col("_ivs"))))
      .select(col(idCol),
        when(col("_kept").isNotNull, concat_ws(" ", col("_kept")))
          .otherwise(col(textCol)).as(textCol),
        when(col("_kept").isNotNull, size(col("_kept")))
          .otherwise(size(col("_ws"))).cast("long").as("n_tokens"),
        when(col("_kept").isNotNull, size(col("_ws")) - size(col("_kept")))
          .otherwise(lit(0)).cast("long").as("removed_tokens"),
        coalesce(col("_nflag"), lit(0L)).as("n_flagged_windows"))
  }

  /** Hyperplane count per LSH table sized for ~32 expected corpus
    * vectors per bucket — ceil(log2(n/32)) clamped to [4, 20]. Bucket
    * capacity (2^planes) must track corpus size: too few planes and
    * the candidate join degenerates quadratically inside fat cells
    * (measured, §6); too many and recall needs more tables. At the
    * clamp ceiling (20 planes, ~10⁶ buckets/table) per-cell occupancy
    * grows again — for 10⁹+ corpora raise the table budget with it.
    * This is the OCCUPANCY side of the sizing only; recall is governed
    * by [[requiredTables]], and [[embedContamination]]'s auto path
    * shrinks this count when the recall arithmetic demands it. */
  def defaultPlanesPerTable(n: Long): Int = {
    val p = math.ceil(math.log(math.max(1.0, n / 32.0)) / math.log(2.0)).toInt
    math.max(4, math.min(20, p))
  }

  /** Probability a single random hyperplane agrees on a pair at cosine
    * `cos`: p = 1 − arccos(cos)/π (Charikar 2002, SimHash). The whole
    * recall budget of a (planes, tables) sketch follows from this one
    * number: per-table collision p^planes, miss over T independent
    * tables (1 − p^planes)^T. */
  def planeAgreement(cos: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, cos))) / math.Pi

  /** Tables needed so a pair AT the threshold cosine is missed with
    * probability ≤ `maxMiss`: smallest T with (1 − p^planes)^T ≤
    * maxMiss, p = [[planeAgreement]](threshold). Pairs above the
    * threshold collide strictly more often, so this bounds the miss of
    * every reportable pair. Grows fast as planes rise at fixed
    * threshold — p^planes is the per-table hit rate, and recall must be
    * bought back table by table — which is why the auto path trades
    * planes DOWN (fatter buckets, more join work) rather than silently
    * eroding recall: a decontamination miss is an invisible eval leak,
    * a fat bucket is only time. */
  def requiredTables(threshold: Double, planes: Int,
      maxMiss: Double = 1e-6): Int = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold out of (0, 1]")
    require(maxMiss > 0.0 && maxMiss < 1.0, s"maxMiss $maxMiss out of (0, 1)")
    val hit = math.pow(planeAgreement(threshold), planes)
    if (hit >= 1.0) 1
    else math.max(1, math.ceil(math.log(maxMiss) / math.log1p(-hit)).toInt)
  }

  /** Joint (planes, tables) sizing: start planes at the occupancy
    * target ([[defaultPlanesPerTable]]) and shrink toward the floor of
    * 4 until the table count that holds `maxMiss` recall at `threshold`
    * fits `maxTables`; fail LOUDLY (with the arithmetic and the
    * remedies) if even 4 planes cannot — low thresholds genuinely need
    * a bigger table budget, and silently under-recalling a
    * decontamination check is the one failure mode this operator must
    * not have. */
  private[graft] def autoSketchSize(n: Long, threshold: Double,
      maxMiss: Double, maxTables: Int): (Int, Int) = {
    var planes = defaultPlanesPerTable(n)
    while (planes > 4 && requiredTables(threshold, planes, maxMiss) > maxTables)
      planes -= 1
    val t = requiredTables(threshold, planes, maxMiss)
    require(t <= maxTables,
      s"recall infeasible: threshold $threshold at the 4-plane floor still " +
        s"needs $t tables for miss <= $maxMiss (budget $maxTables). " +
        "Raise maxAutoTables, relax maxMiss, or pass tables/planesPerTable " +
        "explicitly if the recall erosion is acceptable.")
    (planes, t)
  }

  /** SEMANTIC benchmark contamination — the embedding-space companion
    * to the n-gram overlap above: flag corpus documents whose embedding
    * cosine to SOME benchmark item reaches `threshold`. N-gram overlap
    * only sees near-verbatim leakage; paraphrased or translated
    * benchmark items evade it, which is exactly what embedding
    * similarity catches (the semantic-decontamination check of recent
    * eval-hygiene recipes — the same signal SemDeDup/D5 near-dup uses,
    * pointed at an eval set).
    *
    * Scale shape (the lshNearDupPairs discipline, cross-frame): both
    * sides sketch into (id, table, bucket) cells
    * ([[AnnSearch.sketchCells]] — bytes, never embeddings); candidates
    * are ONE equi-join on the cell key with the benchmark side
    * BROADCAST (an eval set is KBs-MBs); exact cosine verifies only
    * the deduped candidates, so false positives are impossible and the
    * sketch controls recall alone (the lshNearDupPairs recall
    * arithmetic applies unchanged). Output: (idCol, n_bench_hits,
    * worst_bench_id, worst_cos), one row per contaminated document —
    * the argmax bench item via the struct-MAX convention.
    *
    * Sizing (both knobs default to 0 = auto, and the two constraints
    * pull in opposite directions): bucket capacity must GROW with the
    * corpus or the cell join degenerates — at 100k vectors a fixed 4
    * planes (16 buckets/table) yields ~300M candidate pairs and a
    * 291 s run where 16 planes measure 21 s with identical output
    * (§6-measured) — but per-table recall is p^planes with p =
    * [[planeAgreement]](threshold), so every added plane must be paid
    * for in tables: at threshold 0.8 (p ≈ 0.795), 15 planes collide
    * per-table at only ~3% and 24 tables would recover barely half of
    * threshold-boundary pairs. The auto path therefore sizes planes
    * from the corpus ([[defaultPlanesPerTable]]) but SHRINKS them until
    * [[requiredTables]] (threshold, planes, `maxMiss`) fits
    * `maxAutoTables`, then uses exactly that table count — recall wins
    * over occupancy, and an infeasible combination (threshold too low
    * for the budget even at 4 planes) fails loudly with the remedy
    * rather than silently leaking eval items. Explicit `tables` /
    * `planesPerTable` (> 0) bypass the corresponding auto rule
    * unchecked, for corpora whose cosine distribution the caller knows
    * better. */
  def embedContamination(corpus: DataFrame, bench: DataFrame,
      threshold: Double, dims: Int, idCol: String = "doc_id",
      benchIdCol: String = "bench_id", tables: Int = 0,
      planesPerTable: Int = 0, maxMiss: Double = 1e-6,
      maxAutoTables: Int = 64): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold out of (0, 1]")
    val tableBudget = if (tables > 0) tables else maxAutoTables
    val planes =
      if (planesPerTable > 0) planesPerTable
      else autoSketchSize(corpus.count(), threshold, maxMiss, tableBudget)._1
    val nTables =
      if (tables > 0) tables
      else {
        val t = requiredTables(threshold, planes, maxMiss)
        require(t <= tableBudget,
          s"recall infeasible: the explicit $planes planes need $t tables " +
            s"for miss <= $maxMiss at threshold $threshold (budget " +
            s"$maxAutoTables). Raise maxAutoTables or pass tables " +
            "explicitly if the recall erosion is acceptable.")
        t
      }
    val cCells = AnnSearch.sketchCells(
      corpus.select(col(idCol), col("embedding")), idCol, dims, nTables,
      planes)
    val bCells = AnnSearch.sketchCells(
      bench.select(col(benchIdCol), col("embedding")), benchIdCol, dims,
      nTables, planes)
    val cand = cCells
      .join(broadcast(bCells), Seq("table_idx", "bucket"))
      .select(col(idCol), col(benchIdCol)).distinct()
    val ce = corpus.select(col(idCol), col("embedding").as("_ec"),
      org.apache.spark.sql.graft.VecDot.vecNorm(col("embedding")).as("_nc"))
    val be = bench.select(col(benchIdCol), col("embedding").as("_eb"),
      org.apache.spark.sql.graft.VecDot.vecNorm(col("embedding")).as("_nb"))
    cand.join(ce, Seq(idCol)).join(broadcast(be), Seq(benchIdCol))
      .withColumn("cos", org.apache.spark.sql.graft.VecDot.cosine(
        col("_ec"), col("_nc"), col("_eb"), col("_nb")))
      .filter(col("cos") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bench_hits"),
        max(struct(col("cos"), col(benchIdCol))).as("_wk"))
      .select(col(idCol), col("n_bench_hits"),
        col("_wk").getField(benchIdCol).as("worst_bench_id"),
        col("_wk").getField("cos").as("worst_cos"))
  }

  /** E10 query: benchmark set = every 50th doc (deterministic,
    * oracle-expressible); contaminated = ≥3 shared 3-grams with some
    * benchmark doc. Self-hits (a benchmark doc matching itself) are
    * excluded on both engines by keying the join on doc_id != bench_id. */
  def textContamination(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, d)
    val bench = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    contamination(corpus, bench)
  }

  val textContaminationSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))) AS shingle
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
      |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 50 = 0),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
      |pp AS (SELECT c.doc_id, b.bench_id, COUNT(*) AS overlap
      |       FROM corpus c JOIN bench b ON c.shingle = b.shingle
      |       GROUP BY c.doc_id, b.bench_id),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(overlap) AS BIGINT) AS n_contaminated,
      |         MAX(struct_pack(overlap := overlap, bench_id := bench_id)) AS wk
      |  FROM pp GROUP BY doc_id)
      |SELECT a.doc_id, s.n_shingles, a.n_contaminated,
      |       wk.bench_id AS worst_bench_id, wk.overlap AS worst_overlap
      |FROM agg a JOIN sizes s ON a.doc_id = s.doc_id
      |WHERE wk.overlap >= 3
      |ORDER BY a.doc_id""".stripMargin

  /** Gated query for [[spanDecontaminate]]: the benchmark is derived
    * deterministically from the corpus itself (13-word slices of every
    * doc_id ≡ 11 mod 100 — the url_gate derive-the-input precedent),
    * window 13 (the GPT-3 gram size) with a 5-token buffer. DuckDB
    * re-derives everything independently — string 13-grams (pinning
    * the fingerprint path against ground truth, the gopher_rep
    * argument), the buffered fixed-width interval merge by
    * gaps-and-islands, clamping AFTER the merge, and the kept-text
    * rebuild as an anti-join + ordered string_agg. */
  def spanClean(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, d).select(col("doc_id"), col("text"))
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 11)
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(split(col("text"), " "), 5, 13)).as("text"))
      .filter(size(split(col("text"), " ")) === 13)
    spanDecontaminate(docs, bench, window = 13, buffer = 5)
      .withColumnRenamed("text", "text_clean")
      .orderBy(col("doc_id"))
  }

  val spanCleanSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
      |           FROM documents),
      |bg AS (SELECT DISTINCT array_to_string(w[5:17], ' ') AS gram
      |       FROM t WHERE doc_id % 100 = 11 AND len(w) >= 17),
      |gx AS (SELECT doc_id, w,
      |         unnest(generate_series(1, len(w) - 12)) AS i FROM t),
      |f AS (SELECT gx.doc_id, gx.i - 1 - 5 AS s0 FROM gx
      |      JOIN bg ON array_to_string(gx.w[gx.i:gx.i+12], ' ') = bg.gram),
      |nf AS (SELECT doc_id, COUNT(*) AS n_flagged FROM f GROUP BY doc_id),
      |br AS (SELECT doc_id, s0,
      |  CASE WHEN s0 > COALESCE(MAX(s0 + 23) OVER
      |    (PARTITION BY doc_id ORDER BY s0
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s0)
      |  THEN 1 ELSE 0 END AS brk FROM f),
      |i2 AS (SELECT doc_id, s0, SUM(brk) OVER
      |  (PARTITION BY doc_id ORDER BY s0) AS isl FROM br),
      |v AS (SELECT doc_id, MIN(s0) AS s_raw, MAX(s0) + 23 AS e_raw
      |      FROM i2 GROUP BY doc_id, isl),
      |vc AS (SELECT v.doc_id, GREATEST(s_raw, 0) AS s,
      |         LEAST(e_raw, len(t.w)) AS e FROM v JOIN t USING (doc_id)),
      |r AS (SELECT doc_id, SUM(e - s) AS removed FROM vc GROUP BY doc_id),
      |p0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
      |       FROM t),
      |kx AS (SELECT p0.doc_id, p0.i, p0.w[p0.i] AS wd FROM p0
      |       WHERE NOT EXISTS (SELECT 1 FROM vc
      |         WHERE vc.doc_id = p0.doc_id
      |           AND p0.i - 1 >= vc.s AND p0.i - 1 < vc.e)),
      |k AS (SELECT doc_id, COUNT(*) AS kept_n,
      |        string_agg(wd, ' ' ORDER BY i) AS kept
      |      FROM kx GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CASE WHEN r.removed IS NULL THEN t.text
      |       ELSE COALESCE(k.kept, '') END AS text_clean,
      |  CAST(CASE WHEN r.removed IS NULL THEN len(t.w)
      |       ELSE COALESCE(k.kept_n, 0) END AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens,
      |  CAST(COALESCE(nf.n_flagged, 0) AS BIGINT) AS n_flagged_windows
      |FROM t LEFT JOIN r USING (doc_id) LEFT JOIN k USING (doc_id)
      |  LEFT JOIN nf USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_contamination" -> textContamination _,
    "span_clean" -> spanClean _)

  val oracles: Map[String, String] = Map(
    "text_contamination" -> textContaminationSql,
    "span_clean" -> spanCleanSql)
}
