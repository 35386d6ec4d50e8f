package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G27: record linkage / entity resolution — fuzzy deduplication of
  * STRUCTURED records (customer rosters, vendor feeds, user accounts),
  * the record-shaped sibling of the document dedup family: documents
  * dedup on content similarity (C1-C9), records dedup on FIELD
  * similarity under a blocking scheme — the classic Fellegi-Sunter
  * pipeline shape (block → compare → score → decide → cluster) with a
  * deterministic weighted score standing in for the probabilistic
  * match weights (pinnable, oracle-checkable; learning the weights is
  * E24's job if a labeled set exists).
  *
  * The three stages compose the engine's existing discipline:
  *
  *   - [[candidatePairs]]: records sharing a blocking key become
  *     candidate pairs (one self-join per blocking key, id_a < id_b).
  *     Blocking is what makes linkage subquadratic — the all-pairs
  *     explosion is confined to blocks, and a block bigger than
  *     `maxBlockSize` FAILS LOUDLY (the NgramDedup df-cap discipline:
  *     a degenerate key like an empty zip code would otherwise
  *     silently reintroduce O(n²)). Multiple blocking keys union
  *     (a pair is a candidate if ANY key agrees — the standard
  *     multi-pass blocking recall trick), deduped.
  *   - [[scorePairs]]: per-field similarity on candidates only, all
  *     row-local: strings score 1 − levenshtein/max(length) (exact
  *     integer edit distance, both engines agree on it — the A17
  *     precedent), `exact` fields score 1/0 null-safely, weights are
  *     caller-frozen and must sum to 1. NULL fields score 0 toward
  *     the match (fail-closed: a missing field never supports a
  *     merge).
  *   - [[link]]: pairs at/above the threshold feed the C6 connected
  *     components (DedupClusters — one keyed join+agg per round,
  *     checkpointed lineage), every record returns labeled
  *     (entity_id, keep) with the min-id representative keeping (the
  *     repo keeper convention).
  *
  * Scale: the corpus pays one narrow projection per blocking key +
  * the blocked self-join (bounded by maxBlockSize² per block);
  * scoring touches candidates only; CC is edge-bounded. Nothing
  * all-pairs, nothing driver-sized.
  */
object RecordLinkage {

  /** How one field contributes to the match score. */
  sealed trait FieldSim {
    def colName: String; def weight: Double
    /** Similarity in [0,1] for one candidate pair; NULL-safe (a null
      * on either side contributes 0 — fail closed). */
    private[operators] def sim(a: Column, b: Column): Column
  }
  /** Normalized edit similarity: 1 − levenshtein/max(len). */
  final case class Fuzzy(colName: String, weight: Double) extends FieldSim {
    private[operators] def sim(a: Column, b: Column): Column =
      when(a.isNull || b.isNull, 0.0).otherwise(
        lit(1.0) - levenshtein(a, b) /
          greatest(length(a), length(b)).cast("double"))
  }
  /** Null-safe exact match: 1 when equal (both non-null), else 0. */
  final case class Exact(colName: String, weight: Double) extends FieldSim {
    private[operators] def sim(a: Column, b: Column): Column =
      when(a.isNull || b.isNull, 0.0)
        .otherwise(when(a === b, 1.0).otherwise(0.0))
  }

  /** Candidate pairs under one or more blocking keys: (id_a, id_b)
    * with id_a < id_b, deduped across keys. Every blocking key value
    * with more than `maxBlockSize` records fails loudly. */
  def candidatePairs(records: DataFrame, id: String,
      blockingKeys: Seq[Column], maxBlockSize: Int = 1000): DataFrame = {
    require(blockingKeys.nonEmpty, "at least one blocking key")
    require(maxBlockSize > 1, s"maxBlockSize $maxBlockSize")
    val npart = math.max(1,
      records.sparkSession.sparkContext.defaultParallelism)
    val perKey = blockingKeys.zipWithIndex.map { case (k, i) =>
      val keyed = records.select(col(id).as("_id"), k.as("_blk"))
        .filter(col("_blk").isNotNull)
      // ONE groupBy collapses each block to an id-array cell (the
      // dedupNgramJaccard doc-list device — r18 optimization: this
      // replaces a window-count guard + a two-sided self-join, whose
      // three _blk-keyed exchanges AQE coalesced to a SINGLE task at
      // the gate's 25-block key — the whole 5.4M-pair generation ran
      // sequentially, 3.4 cpu-s in one task, guide §2.5's "AQE counts
      // bytes, not downstream compute"). The raise_error rides the
      // array column itself — Catalyst cannot prune the guard.
      val cells = keyed.groupBy(col("_blk"))
        .agg(collect_list(col("_id")).as("_ids"))
        .select(when(size(col("_ids")) > maxBlockSize,
          raise_error(concat(lit(s"blocking key #$i value "),
            col("_blk").cast("string"),
            lit(s" exceeds maxBlockSize $maxBlockSize — refine the key"))))
          .otherwise(col("_ids")).as("_ids"))
        .filter(size(col("_ids")) > 1)
      // explicit numPartitions: an AQE-coalesced read of the tiny cell
      // frame would serialize the quadratic explode; pinning the count
      // keeps pair GENERATION spread across the cores the blocks can
      // reach (≤ one task per block — the block cap bounds each task's
      // quadratic at maxBlockSize²)
      cells.repartition(npart, col("_ids"))
        .select(explode(col("_ids")).as("id_a"), col("_ids"))
        .select(col("id_a"), explode(col("_ids")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
    }
    // the distinct dedupes pairs ACROSS keys only: within one key every
    // record carries exactly one block value, so a pair cannot repeat.
    // Single-key blocking therefore skips it (r18): the r17 measurement
    // that made it unconditional ("skipping saved the shuffle and
    // DOUBLED the operator — ~25 hot tasks ran every levenshtein")
    // predates the cell rewrite above — generation is now explicitly
    // repartitioned to full width and the scoring joins rebalance by
    // pair id through their own exchanges, so the extra pair-wide
    // shuffle+dedupe was pure overhead on the single-key path.
    if (perKey.size == 1) perKey.head
    else perKey.reduce(_ unionByName _).distinct()
  }

  /** Weighted field-similarity score for each candidate pair:
    * (id_a, id_b, score). Weights must sum to 1 (±1e-9). */
  def scorePairs(records: DataFrame, pairs: DataFrame, id: String,
      fields: Seq[FieldSim]): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    require(math.abs(fields.map(_.weight).sum - 1.0) < 1e-9,
      s"weights must sum to 1: ${fields.map(_.weight)}")
    require(fields.forall(_.weight > 0), "weights must be positive")
    val cols = col(id).as("_id") +: fields.map(f => col(f.colName))
    val a = records.select(cols: _*).as("ra")
    val b = records.select(cols: _*).as("rb")
    val score = fields.map(f =>
      f.sim(col(s"ra.${f.colName}"), col(s"rb.${f.colName}")) * f.weight)
      .reduce(_ + _)
    // shuffle_hash, build = the record roster: the pair frame is the
    // blocked quadratic — its row-count ESTIMATE under-reports through
    // the Generate/distinct chain, and an estimate-driven broadcast
    // would collect millions of pairs to the driver and serialize the
    // similarity kernel onto the roster's few partitions (measured:
    // 0.6 s → 15 s at sf0.1). Build-per-partition of the roster is the
    // scale-safe side, and hash beats sort-merge here because the
    // streamed pair side never pays a sort.
    pairs
      .join(a.hint("shuffle_hash"), col("id_a") === col("ra._id"))
      .join(b.hint("shuffle_hash"), col("id_b") === col("rb._id"))
      .select(col("id_a"), col("id_b"), score.as("score"))
  }

  /** [[scorePairs]] + threshold filter with the threshold PUSHED INTO
    * the edit-distance kernel (optimization guide §1.2 "per-task
    * work": the full O(len²) Levenshtein DP was the single hottest
    * stage of the linkage gate — 77.7 of ~105 cpu-s at sf0.1).
    *
    * For a Fuzzy field f with weight w, every OTHER field contributes
    * at most 1−w to the score, so `score ≥ t` forces
    * `sim_f ≥ 1 − (1−t)/w`, i.e. `lev_f ≤ maxlen·(1−t)/w`. Passing
    * that bound (+1 slack, see below) as the banded-levenshtein
    * threshold makes the kernel O(len·band) and lets it bail the DP
    * row-wise the moment the band is exceeded; `-1` (= band exceeded)
    * PROVES `score < t`, so the pair is dropped with zero further
    * work. Surviving pairs see the exact distance, so their score is
    * the bit-identical IEEE sum [[scorePairs]] produces and the
    * emitted (pairs, scores) set is EXACTLY `scorePairs.filter(score
    * ≥ t)` — spec-pinned, and the oracle gate re-certifies it.
    *
    * Band slack: the bound is evaluated in IEEE doubles while the
    * derivation above is real arithmetic; `floor(x + 1e-9) + 1` can
    * only ENLARGE the band (a slightly-too-wide band costs a few DP
    * cells; a too-narrow one would drop a boundary pair), and the +1
    * puts every pruned pair a full 1/maxlen of similarity below the
    * threshold — six orders of magnitude past double rounding error
    * for any realistic string. A field whose bound reaches maxlen
    * (ratio ≥ 1: small weight or low threshold) keeps the plain
    * kernel — banding cannot prune it. */
  private[operators] def scorePairsThresholded(records: DataFrame,
      pairs: DataFrame, id: String, fields: Seq[FieldSim],
      threshold: Double): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    require(math.abs(fields.map(_.weight).sum - 1.0) < 1e-9,
      s"weights must sum to 1: ${fields.map(_.weight)}")
    require(fields.forall(_.weight > 0), "weights must be positive")
    val cols = col(id).as("_id") +: fields.map(f => col(f.colName))
    val a = records.select(cols: _*).as("ra")
    val b = records.select(cols: _*).as("rb")
    // shuffle_hash on the roster sides — same rationale as scorePairs
    val joined = pairs
      .join(a.hint("shuffle_hash"), col("id_a") === col("ra._id"))
      .join(b.hint("shuffle_hash"), col("id_b") === col("rb._id"))
    // which Fuzzy fields CAN prune (bound below maxlen)
    val prunable = fields.zipWithIndex.collect {
      case (f: Fuzzy, i) if (1.0 - threshold) / f.weight < 1.0 => i -> f
    }.toMap
    // ONE projection carries the pair ids, every field under an
    // unambiguous alias, and one banded distance per prunable field —
    // computed once and shared by the prune predicate and the score
    // expression (never re-derived under a different parent: the r3
    // lesson that codegen CSE does not merge across operator nodes)
    val proj = joined.select(
      Seq(col("id_a"), col("id_b")) ++
        fields.zipWithIndex.flatMap { case (f, i) => Seq(
          col(s"ra.${f.colName}").as(s"_a$i"),
          col(s"rb.${f.colName}").as(s"_b$i")) } ++
        prunable.toSeq.sortBy(_._1).map { case (i, f) =>
          val fa = col(s"ra.${f.colName}"); val fb = col(s"rb.${f.colName}")
          val band = (floor(greatest(length(fa), length(fb)).cast("double") *
            lit((1.0 - threshold) / f.weight) + lit(1e-9)) + 1).cast("int")
          call_function("levenshtein", fa, fb, band).as(s"_d$i")
        }: _*)
    // band exceeded (−1) on any field proves score < threshold; NULL
    // distances (null field) pass through to the when()-guard below,
    // which scores them 0 exactly like Fuzzy.sim
    val pruned = prunable.keys.foldLeft(proj) { (df, i) =>
      df.filter(col(s"_d$i").isNull || col(s"_d$i") =!= -1)
    }
    // the score expression MUST be the literal scorePairs chain with
    // the already-computed distance substituted for the plain kernel:
    // same when-guard, same division, same weight products, same sum
    // order — IEEE-bit-identical on every surviving pair
    val score = fields.zipWithIndex.map { case (f, i) =>
      val fa = col(s"_a$i"); val fb = col(s"_b$i")
      val sim =
        if (prunable.contains(i))
          when(fa.isNull || fb.isNull, 0.0).otherwise(
            lit(1.0) - col(s"_d$i") /
              greatest(length(fa), length(fb)).cast("double"))
        else f.sim(fa, fb)
      sim * f.weight
    }.reduce(_ + _)
    pruned.select(col("id_a"), col("id_b"), score.as("score"))
      .filter(col("score") >= threshold)
  }

  /** SORTED-NEIGHBORHOOD candidate pairs — the standard recall rescue
    * when no clean blocking key exists (a typo'd zip code silently
    * exiles a true duplicate from its exact block; a SORT mostly keeps
    * near-identical records adjacent). Records are globally ordered by
    * `sortKey` and every two records within `window` positions become a
    * candidate pair: O(n·window) pairs by construction — the window IS
    * the block cap, so no degenerate-key failure mode exists (ties
    * beyond the window are the scheme's documented recall limit; run a
    * second pass with a different sort key, exactly like multi-pass
    * blocking).
    *
    * Scale: one range-partitioned sort (the repo's no-single-partition-
    * window rule — ranks come from the classic zipWithIndex two-pass,
    * never a global `Window.orderBy`), then each record lands in TWO
    * rank buckets of width `window` so every within-window pair shares
    * ≥ 1 bucket; the bucket self-join is bounded by 2·window rows per
    * bucket. */
  def sortedNeighborhoodPairs(records: DataFrame, id: String,
      sortKey: Column, window: Int): DataFrame = {
    require(window >= 2 && window <= 100000,
      s"window $window must be in [2, 100000] — pairs are O(n*window)")
    val spark = records.sparkSession
    val keyed = records.select(col(id).as("_id"), sortKey.as("_sk"))
      .filter(col("_sk").isNotNull)
    val npart = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = keyed.repartitionByRange(npart, col("_sk"), col("_id"))
      .sortWithinPartitions("_sk", "_id")
    val ranked = spark.createDataFrame(
      sorted.select("_id").rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_id",
          keyed.schema("_id").dataType),
        org.apache.spark.sql.types.StructField("_rank",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = window.toLong
    val e = ranked.select(col("_id"), col("_rank"),
      explode(array((col("_rank") / w).cast("long"),
        (col("_rank") / w).cast("long") + 1L)).as("_bkt"))
    e.as("a").join(e.as("b"),
        col("a._bkt") === col("b._bkt") &&
          col("a._rank") < col("b._rank") &&
          col("b._rank") - col("a._rank") < w)
      .select(least(col("a._id"), col("b._id")).as("id_a"),
        greatest(col("a._id"), col("b._id")).as("id_b"))
      .distinct()
  }

  /** Q-GRAM candidate pairs — fuzzy blocking on a single dirty field:
    * two records become candidates when they share ANY character
    * q-gram of `field` (lowercased), so a one-character typo (which
    * breaks at most q grams) still leaves the duplicate discoverable
    * through every other gram. The opposite trade from exact blocking:
    * near-perfect recall on typo'd keys, more candidates to score.
    *
    * Frequent grams are the degenerate blocks here ("er " appears in
    * half the roster). `dfCap` drops grams shared by more than that
    * many records from BLOCKING only (the NgramDedup df-capped-blocking
    * discipline: verification stays exact in scorePairs, so dropping a
    * frequent gram can only cost candidate recall for pairs whose
    * EVERY shared gram is frequent — not the typo'd-duplicate shape).
    * The df cap IS this scheme's block cap — every surviving block is
    * ≤ dfCap records by construction, so unlike exact blocking there is
    * no degenerate-key crash mode to guard loudly.
    *
    * SIZE q WITH THE CORPUS (the embedContamination planes rule, same
    * arithmetic): the gram space is alphabet^q buckets, and candidate
    * volume is Σ df²/2 over surviving grams — when corpus growth pushes
    * typical dfs toward the cap, pairs grow quadratically in df. 50×
    * measured: q=6 over an 8.25M-record roster produced 820M candidates
    * (256 s); q=8 keeps dfs near 1 and candidates near the true-pair
    * count. A one-character typo breaks at most q grams, so raising q
    * on fields longer than ~2q costs no planted-duplicate recall. */
  def qgramPairs(records: DataFrame, id: String, field: String,
      q: Int = 3, dfCap: Int = 500): DataFrame = {
    require(q >= 2 && q <= 8, s"q $q must be in [2, 8]")
    require(dfCap >= 2, s"dfCap $dfCap must be >= 2")
    val npart = math.max(1,
      records.sparkSession.sparkContext.defaultParallelism)
    // id-keyed repartition after the read: gram explosion is the heavy
    // row-local phase and a single-row-group input would run it in one
    // task (the shingles note in Dedup, r18)
    val grams = records
      .select(col(id).as("_id"), lower(col(field)).as("_s"))
      .filter(col("_s").isNotNull && length(col("_s")) >= q)
      .repartition(npart, col("_id"))
      .select(col("_id"), explode(array_distinct(expr(
        s"transform(sequence(1, length(_s) - ${q - 1}), " +
          s"i -> substring(_s, i, $q))"))).as("_blk"))
    // one gram-keyed aggregation replaces the window count AND the
    // two-sided self-join (the candidatePairs cell device, r18): the
    // cell's array size IS the gram's document frequency, so the
    // df-cap becomes a size filter, and pairs explode from the
    // surviving cells (every cell ≤ dfCap ids by construction). The
    // explicit repartition keeps pair generation at full width.
    val cells = grams.groupBy(col("_blk"))
      .agg(collect_list(col("_id")).as("_ids"))
      .filter(size(col("_ids")).between(2, dfCap))
    cells.repartition(npart, col("_ids"))
      .select(explode(col("_ids")).as("id_a"), col("_ids"))
      .select(col("id_a"), explode(col("_ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Score → threshold → connected components over caller-supplied
    * candidate pairs — the composition point for every blocking
    * scheme ([[candidatePairs]], [[sortedNeighborhoodPairs]],
    * [[qgramPairs]], or their union for multi-pass blocking). Every
    * record returns (id, entity_id, keep) under the min-id keeper
    * convention. */
  def linkWithPairs(records: DataFrame, id: String, candidates: DataFrame,
      fields: Seq[FieldSim], threshold: Double,
      anchor: Anchor = Anchor.Local): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold")
    // anchored: connectedComponents consumes the scored pairs through a
    // union of both edge directions, and without the anchor each branch
    // re-runs the ENTIRE block+score pipeline (r18 profile: the scoring
    // stage billed ~2× its isolated cost). The anchored frame is the
    // thresholded edge set — tiny relative to the candidate volume.
    val pairs = anchor(
      scorePairsThresholded(records, candidates, id, fields, threshold))
    val comps = DedupClusters
      .connectedComponents(pairs, "id_a", "id_b", anchor = anchor)
      .select(col("id").as("_cid"), col("comp"))
    records.select(col(id))
      .join(comps, col(id) === col("_cid"), "left")
      .select(col(id), coalesce(col("comp"), col(id)).as("entity_id"))
      .withColumn("keep", col(id) === col("entity_id"))
  }

  /** The full pipeline: block → score → threshold → connected
    * components. Every record returns (id, entity_id, keep): linked
    * records share the min-member entity_id, the min-id member keeps
    * (the repo keeper convention); singletons are their own entity. */
  def link(records: DataFrame, id: String, blockingKeys: Seq[Column],
      fields: Seq[FieldSim], threshold: Double,
      maxBlockSize: Int = 1000, anchor: Anchor = Anchor.Local): DataFrame =
    linkWithPairs(records, id,
      candidatePairs(records, id, blockingKeys, maxBlockSize), fields,
      threshold, anchor)

  /** The two frames a delta linkage produces. */
  final case class DeltaLink(assignments: DataFrame, mergeCandidates: DataFrame)

  /** O(delta) linkage against FROZEN entities — the repo's frozen-index
    * convention (C9 boilerplate index, C10 bloom membership) applied to
    * linkage: `entities` is a previously-linked roster (record fields +
    * `entity_id`), `delta` is the new arrivals. Delta records link INTO
    * existing entities (the frozen label wins even when a delta id is
    * smaller — labels never move under a delta, by contract) or form
    * new entities among themselves (min delta id); every candidate pair
    * touches ≥ 1 delta record, so old-old pairs never re-verify (the
    * G17 economics). A delta record bridging TWO frozen entities does
    * NOT relabel them — the bridge surfaces in `mergeCandidates`
    * ((entity_id, merged_into) rows) and the delta members take the
    * smallest bridged entity; the periodic full [[link]] is the rebuild
    * that actually merges (exactly the frozen-index stream semantics:
    * within-delta-only evidence never mutates the frozen side).
    * `assignments`: (id, entity_id, is_new_entity, bridged). */
  def linkAgainst(entities: DataFrame, delta: DataFrame, id: String,
      blockingKeys: Seq[Column], fields: Seq[FieldSim], threshold: Double,
      maxBlockSize: Int = 1000): DeltaLink = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold")
    // the union keeps ALL record columns (blocking keys are arbitrary
    // caller expressions over them); delta rides with a null entity_id
    val newR = delta.withColumn("entity_id", lit(null).cast("long"))
    val union = newR.unionByName(
      entities.select(newR.columns.map(col): _*))
    // candidate pairs restricted to those touching >= 1 delta record:
    // block the DELTA side only, join against the union's blocked
    // projection (the union side is a read-only pruned scan — the
    // IncrementalDedup "what still scans" note)
    val perKeyPairs = blockingKeys.zipWithIndex.map { case (k, i) =>
      val uKeyed = union.select(col(id).as("_uid"), k.as("_blk"),
          col("entity_id").as("_uent"))
        .filter(col("_blk").isNotNull)
      // the cap guards only blocks a DELTA record touches: an oversized
      // frozen-only block produces zero pairs here (no delta side), and
      // failing the whole refresh for it would make the delta form
      // unusable exactly on the rosters that most need periodic rebuilds
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_blk"))
      val guarded = uKeyed
        .withColumn("_n", count(lit(1)).over(w))
        .withColumn("_nd", count(when(col("_uent").isNull, 1)).over(w))
        .select(col("_uid"), col("_uent"),
          when(col("_n") > maxBlockSize && col("_nd") > 0,
            raise_error(concat(lit(s"blocking key #$i value "),
              col("_blk").cast("string"),
              lit(s" exceeds maxBlockSize $maxBlockSize — refine the key"))))
            .otherwise(col("_blk")).as("_blk"))
      val dSide = guarded.filter(col("_uent").isNull)
        .select(col("_uid").as("_did"), col("_blk"))
      dSide.join(guarded, Seq("_blk"))
        .filter(col("_did") =!= col("_uid"))
        .select(least(col("_did"), col("_uid")).as("id_a"),
          greatest(col("_did"), col("_uid")).as("id_b"))
    }
    // delta-delta pairs surface TWICE per key here (once from each
    // side's delta row), so unlike candidatePairs the single-key path
    // still needs the dedup
    val pairs = perKeyPairs.reduce(_ unionByName _).distinct()
    val matched = scorePairsThresholded(union, pairs, id, fields, threshold)
      .select("id_a", "id_b")

    // component edges: matched pairs, with OLD records standing in for
    // their (frozen) entity label — components then span delta ids and
    // frozen entity ids in the one shared id space
    val ent = union.filter(col("entity_id").isNotNull)
      .select(col(id).as("_rid"), col("entity_id").as("_ent"))
    def toEntity(c: String) = coalesce(col("_ent"), col(c))
    val edges = matched
      .join(ent.withColumnRenamed("_rid", "id_a"), Seq("id_a"), "left")
      .select(toEntity("id_a").as("e_a"), col("id_b"))
      .join(ent.withColumnRenamed("_rid", "id_b"), Seq("id_b"), "left")
      .select(col("e_a"), toEntity("id_b").as("e_b"))
      .filter(col("e_a") =!= col("e_b"))
    val comps = DedupClusters.connectedComponents(edges, "e_a", "e_b")
      .select(col("id").as("_node"), col("comp"))
    // per component: the frozen-entity members decide the label
    val entityNodes = comps.join(
        ent.select(col("_ent").as("_node")).distinct(), Seq("_node"))
    val compEnt = entityNodes.groupBy("comp")
      .agg(min(col("_node")).as("_min_ent"),
        count(lit(1)).as("_n_ent"))
    val assignments = delta.select(col(id))
      .join(comps, col(id) === col("_node"), "left")
      .join(compEnt, Seq("comp"), "left")
      .select(col(id),
        coalesce(col("_min_ent"), col("comp"), col(id)).as("entity_id"),
        (col("_min_ent").isNull).as("is_new_entity"),
        coalesce(col("_n_ent") > 1, lit(false)).as("bridged"))
    val mergeCandidates = entityNodes.join(compEnt, Seq("comp"))
      .filter(col("_n_ent") > 1 && col("_node") =!= col("_min_ent"))
      .select(col("_node").as("entity_id"), col("_min_ent").as("merged_into"))
    DeltaLink(assignments, mergeCandidates)
  }

  // ---- survivorship (golden records) ---------------------------------------

  /** How one field survives into the golden record. Every rule is a
    * single COMBINABLE aggregate (map-side partial at any cluster
    * size); NULLs never survive (a rule returns null only when the
    * field is null across the whole entity); ties break to the
    * LARGEST candidate under the field's natural order — the one
    * deterministic rule a bare max-struct gives every type for free
    * (a smallest-on-tie rule would need per-type negation tricks or a
    * window; pinned and oracle-checked instead). */
  sealed trait Survive { def colName: String }
  /** Longest non-null string — the completeness heuristic (a fuller
    * address/name beats a truncated one). */
  final case class Longest(colName: String) extends Survive
  /** Most frequent non-null value — majority vote across the entity's
    * records. */
  final case class Mode(colName: String) extends Survive
  /** Maximum non-null value. */
  final case class MaxOf(colName: String) extends Survive
  /** Minimum non-null value. */
  final case class MinOf(colName: String) extends Survive
  /** Value carried by the entity's record with the greatest
    * `orderCol` (recency wins — the freshest feed is the truth). */
  final case class LatestBy(colName: String, orderCol: String) extends Survive

  /** Survivorship: collapse linked records into one golden record per
    * entity — the step after [[link]] that MDM pipelines actually ship
    * downstream (linkage labels records; survivorship decides which
    * field values the merged entity keeps). `assignments` is any
    * (id → entity_id) frame ([[link]]/[[linkAgainst]] output, or a
    * precomputed roster). Output: (entity_id, n_members, <one column
    * per rule, keeping the field's name>), one row per entity.
    *
    * Scale: one keyed join (id → entity label) + one combinable
    * aggregate for ALL non-Mode rules together; each [[Mode]] field
    * adds its own (entity, value) count + max-struct pass joined back
    * on entity_id — the count table is entity×distinct-value sized,
    * and the joins are all on the same key, so AQE reuses the
    * entity-keyed exchange. Nothing windows, nothing collects. */
  def goldenRecords(records: DataFrame, id: String,
      assignments: DataFrame, rules: Seq[Survive]): DataFrame = {
    require(rules.nonEmpty, "at least one survivorship rule")
    val names = rules.map(_.colName)
    require(names.distinct.size == names.size,
      s"one rule per field: $names")
    val labeled = records.join(
      assignments.select(col(id).as("_aid"), col("entity_id")),
      col(id) === col("_aid"))
    val (modes, simple) = rules.partition(_.isInstanceOf[Mode])
    val simpleAggs = simple.map {
      case Longest(c) =>
        max(when(col(c).isNotNull, struct(length(col(c)).as("l"),
          col(c).as("v")))).getField("v").as(c)
      case MaxOf(c) => max(col(c)).as(c)
      case MinOf(c) => min(col(c)).as(c)
      case LatestBy(c, o) =>
        max(when(col(c).isNotNull && col(o).isNotNull,
          struct(col(o).as("o"), col(c).as("v")))).getField("v").as(c)
      case r => throw new IllegalArgumentException(r.toString)
    }
    val base = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"), simpleAggs: _*)
    modes.collect { case m: Mode => m.colName }.foldLeft(base) { (acc, c) =>
      val counted = labeled.filter(col(c).isNotNull)
        .groupBy(col("entity_id"), col(c)).agg(count(lit(1)).as("_n"))
        .groupBy(col("entity_id"))
        .agg(max(struct(col("_n"), col(c).as("v"))).getField("v").as(c))
      acc.join(counted, Seq("entity_id"), "left")
    }
  }

  /** Gated entry (`golden_records`): survivorship semantics against
    * DuckDB's window re-derivation, on a pre-labeled roster (nation as
    * the entity stand-in — the gate isolates the NEW aggregation
    * semantics; the composition with [[link]]'s labels is spec'd on
    * the planted-dupes fixture, where re-running the whole linkage
    * would only re-pay the record_link gate's 7 s). Longest name,
    * modal segment, max balance, member count — every tie broken to
    * the largest value, both engines. */
  def goldenRecordsGate(spark: SparkSession, d: String): DataFrame = {
    val cust = graft.Tables.load(spark, d, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"),
        col("c_nationkey"))
    val assign = cust.select(col("id"), col("c_nationkey").as("entity_id"))
    goldenRecords(cust.drop("c_nationkey"), "id", assign,
      Seq(Longest("name"), Mode("seg"), MaxOf("bal")))
      .orderBy(col("entity_id"))
  }

  val goldenRecordsSql: String =
    """WITH r AS (
      |  SELECT c_nationkey AS entity_id, c_name AS name,
      |    c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer),
      |base AS (
      |  SELECT entity_id, COUNT(*) AS n_members, MAX(bal) AS bal
      |  FROM r GROUP BY entity_id),
      |ln AS (
      |  SELECT entity_id, name FROM (
      |    SELECT entity_id, name, row_number() OVER (
      |      PARTITION BY entity_id ORDER BY len(name) DESC, name DESC) AS rn
      |    FROM r WHERE name IS NOT NULL) WHERE rn = 1),
      |md AS (
      |  SELECT entity_id, seg FROM (
      |    SELECT entity_id, seg, row_number() OVER (
      |      PARTITION BY entity_id ORDER BY n DESC, seg DESC) AS rn
      |    FROM (SELECT entity_id, seg, COUNT(*) AS n FROM r
      |          WHERE seg IS NOT NULL GROUP BY 1, 2)) WHERE rn = 1)
      |SELECT b.entity_id, b.n_members, ln.name, md.seg, b.bal
      |FROM base b
      |JOIN ln ON ln.entity_id = b.entity_id
      |JOIN md ON md.entity_id = b.entity_id
      |ORDER BY b.entity_id""".stripMargin

  // ---- gated harness entry -------------------------------------------------

  /** Gated entry (`record_link`): the whole pipeline against ground
    * truth on a derived dirty roster — customers get synthetic
    * distinctive names (`cust_<key>_<md5-prefix>`: unrelated names
    * differ across the hash suffix, so edit similarity separates
    * cleanly), every 10th record gains a duplicate with one
    * substituted character and a shifted id; blocking on nation,
    * score = 0.75·name-similarity + 0.25·exact(segment), threshold
    * 0.9 (binary-exact weights; levenshtein and lengths are exact
    * integers, so the score arithmetic is the same IEEE sequence in
    * both engines). DuckDB re-derives blocking, edit similarity, the
    * threshold, and the transitive closure (recursive CTE — the
    * dedup_clusters precedent). */
  def recordLink(spark: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.load(spark, d, "customer")
      .select(col("c_custkey").as("id"),
        concat(lit("cust_"), col("c_custkey"), lit("_"),
          substring(md5(col("c_custkey").cast("string")), 1, 6)).as("name"),
        col("c_nationkey").as("block"), col("c_mktsegment").as("seg"))
    val dupes = base.filter(col("id") % 10 === 0)
      .select((col("id") + 100000L).as("id"),
        concat(lit("kust_"), expr("substring(name, 6)")).as("name"),
        col("block"), col("seg"))
    val records = base.unionByName(dupes)
    link(records, "id", Seq(col("block")),
      Seq(Fuzzy("name", 0.75), Exact("seg", 0.25)), threshold = 0.9)
  }

  val recordLinkSql: String =
    """WITH RECURSIVE base AS (
      |  SELECT c_custkey AS id,
      |    'cust_' || c_custkey || '_' ||
      |      substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6) AS name,
      |    c_nationkey AS block, c_mktsegment AS seg
      |  FROM customer),
      |records AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT id + 100000, 'kust_' || substr(name, 6), block, seg
      |  FROM base WHERE id % 10 = 0),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    0.75 * (1.0 - CAST(levenshtein(a.name, b.name) AS DOUBLE) /
      |      greatest(len(a.name), len(b.name))) +
      |    0.25 * (CASE WHEN a.seg = b.seg THEN 1.0 ELSE 0.0 END) AS score
      |  FROM records a JOIN records b
      |    ON a.block = b.block AND a.id < b.id),
      |edges AS (
      |  SELECT id_a AS s, id_b AS d FROM pairs WHERE score >= 0.9
      |  UNION ALL
      |  SELECT id_b, id_a FROM pairs WHERE score >= 0.9),
      |walk(id, comp) AS (
      |  SELECT DISTINCT s, s FROM edges
      |  UNION
      |  SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id),
      |cc AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
      |SELECT r.id, COALESCE(cc.comp, r.id) AS entity_id,
      |  r.id = COALESCE(cc.comp, r.id) AS keep
      |FROM records r LEFT JOIN cc ON r.id = cc.id""".stripMargin

  /** The gate roster (shared by the blocking gates): base customers
    * with synthetic distinctive names + the shifted-id typo'd dupes —
    * the record_link fixture without the linkage tail. */
  private def gateRoster(spark: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.load(spark, d, "customer")
      .select(col("c_custkey").as("id"),
        concat(lit("cust_"), col("c_custkey"), lit("_"),
          substring(md5(col("c_custkey").cast("string")), 1, 6)).as("name"))
    base.unionByName(base.filter(col("id") % 10 === 0)
      .select((col("id") + 100000L).as("id"),
        concat(lit("kust_"), expr("substring(name, 6)")).as("name")))
  }

  private val gateRosterSql: String =
    """base AS (
      |  SELECT c_custkey AS id,
      |    'cust_' || c_custkey || '_' ||
      |      substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6) AS name
      |  FROM customer),
      |records AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT id + 100000, 'kust_' || substr(name, 6) FROM base
      |  WHERE id % 10 = 0)""".stripMargin

  /** Gated entry (`qgram_pairs`): df-capped 4-gram blocking on the
    * dirty roster — exact counting on both engines (gram extraction,
    * the df cap, the id_a < id_b pair rule are all integer/string
    * exact). */
  def qgramPairsGate(spark: SparkSession, d: String): DataFrame =
    qgramPairs(gateRoster(spark, d), "id", "name", q = 4, dfCap = 50)

  val qgramPairsSql: String =
    s"""WITH $gateRosterSql,
      |g AS (
      |  SELECT id, unnest(list_distinct(list_transform(
      |    range(1, len(lower(name)) - 2), i -> substr(lower(name), i, 4))))
      |    AS gram
      |  FROM records WHERE len(name) >= 4),
      |keep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
      |gk AS (SELECT g.id, g.gram FROM g JOIN keep USING (gram))
      |SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |FROM gk a JOIN gk b ON a.gram = b.gram AND a.id < b.id""".stripMargin

  /** Gated entry (`sorted_pairs`): sorted-neighborhood blocking on the
    * same roster — the global (name, id) order and the window-of-8
    * pair rule are exactly re-derivable via row_number in DuckDB. */
  def sortedPairsGate(spark: SparkSession, d: String): DataFrame =
    sortedNeighborhoodPairs(gateRoster(spark, d), "id", col("name"),
      window = 8)

  val sortedPairsSql: String =
    s"""WITH $gateRosterSql,
      |r AS (
      |  SELECT id, row_number() OVER (ORDER BY name, id) - 1 AS rnk
      |  FROM records),
      |p AS (
      |  SELECT a.id AS x, b.id AS y FROM r a JOIN r b
      |  ON b.rnk > a.rnk AND b.rnk - a.rnk < 8)
      |SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b
      |FROM p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "record_link" -> recordLink _,
    "qgram_pairs" -> qgramPairsGate _,
    "sorted_pairs" -> sortedPairsGate _,
    "golden_records" -> goldenRecordsGate _)

  val oracles: Map[String, String] = Map(
    "record_link" -> recordLinkSql,
    "qgram_pairs" -> qgramPairsSql,
    "sorted_pairs" -> sortedPairsSql,
    "golden_records" -> goldenRecordsSql)
}
