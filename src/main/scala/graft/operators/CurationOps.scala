package graft.operators

import graft.Tables
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation signals beyond the per-doc text statistics (SURVEY §2
  * E14–E15, D6): rare-token density from a corpus frequency table, a
  * weighted deterministic document sample, and per-label embedding norm
  * statistics.
  *
  * Exactness: ratios are one IEEE divide of exact integers; norms use the
  * left-fold dot (VecDot — bit-identical to DuckDB's list_reduce) and only
  * feed MIN/MAX, which are order-independent.
  */
object CurationOps {

  /** E14: rare-token density — fraction of a document's token occurrences
    * whose corpus-wide frequency is ≤ 2 (hapax + dis legomena), the exact
    * integer core of a "remove documents dominated by rare junk" rule.
    * Two combinable aggregations (corpus tf, per-doc rare count) and one
    * keyed join on the token — at 100 TB the tf table is the vocabulary
    * (Zipf-small next to the corpus) and every shuffle key is the token,
    * so hot stopwords pre-reduce map-side before they ever move. */
  def textRareRatio(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    toks.join(tf, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("c") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_toks")).as("rare_ratio"))
      .orderBy(col("doc_id"))
  }

  val textRareRatioSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      | tf AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |  CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS rare_ratio
      |FROM toks JOIN tf USING (tok)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** E15: length-weighted deterministic sample — P(keep) ∝ min(n_chars,
    * 400)/400, realized as an md5-bucket threshold per doc_id (the E9
    * portable-hash convention), so the sample is reproducible across
    * runs, engines and cluster layouts AND longer documents are kept
    * proportionally more often. Zero shuffles before the summary
    * aggregate: the keep decision is a per-row projection. */
  def sampleWeighted(spark: SparkSession, d: String): DataFrame = {
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 400
    Tables.documents(spark, d)
      .filter(u < least(col("n_chars"), lit(400L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("chars_sampled"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"))
  }

  val sampleWeightedSql: String =
    """SELECT lang, COUNT(*) AS n_sampled,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
      |  MIN(doc_id) AS first_doc
      |FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 400
      |      < least(n_chars, 400)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** D6: per-label embedding norm statistics — count, zero-norm count,
    * and the min/max L2 norm per label. Norms are the bit-exact left-fold
    * dot (VecDot, identical to DuckDB list_reduce) and feed only
    * order-independent MIN/MAX/COUNT, so the cross-engine hash holds
    * without any decimal detour. One combinable shuffle on the label. */
  def embNormStats(spark: SparkSession, d: String): DataFrame = {
    Tables.embeddings(spark, d)
      .select(col("label"), VecDot.vecNorm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy(col("label"))
  }

  val embNormStatsSql: String =
    """SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
      |FROM (
      |  SELECT label,
      |    sqrt(list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)
      |GROUP BY label
      |ORDER BY label""".stripMargin

  /** Domain-reweighting sampling with the mixture DECLARED AS DATA —
    * `mixture` is a (source, keep_per_mille) frame, broadcast onto the
    * corpus, and each document keeps deterministically at its source's
    * rate via the E9/E15 md5-bucket convention on `idCol` (reproducible
    * across runs, engines and cluster layouts; composes with E15's
    * length weighting). Sources absent from the mixture keep at
    * `defaultPerMille` — default 0, i.e. an undeclared source
    * contributes nothing, the fail-closed choice for a curation recipe
    * (the alternative, silently keeping everything unlisted, is how an
    * unfiltered crawl sneaks into a training set).
    *
    * Rates ABOVE 1000 oversample (r9): real LLM mixtures repeat small
    * curated sources for several epochs against one pass of crawl, so
    * a rate of 2500‰ means floor(2500/1000) = 2 deterministic copies of
    * every document plus a 500‰ md5-bucket extra. This function stays a
    * per-row projection: it returns `docs` plus `n_copies` (how many
    * times the document appears in the sample) and `keep` =
    * n_copies > 0 (for rates ≤ 1000 exactly the old boolean contract);
    * [[mixtureRepeat]] materializes the copies as rows.
    *
    * The mixture must be UNIQUE on source — a recipe frame carrying two
    * rows for one source would silently duplicate that source's every
    * document through the join, so it fails loudly here instead (one
    * aggregate over the domains-sized recipe, driver-bounded). That
    * probe is an EAGER driver action on every invocation — cheap for a
    * KB recipe, but a caller re-planning in a loop (per micro-batch, or
    * repeated planMixture→sample cycles) pays one small Spark job per
    * call; validate once and reuse the returned frame, or pre-dedup the
    * recipe, if that matters. Scale shape: the mixture is domains, not
    * documents — KBs — so this is a broadcast join plus a per-row
    * projection, zero corpus shuffles. */
  def mixtureSample(docs: DataFrame, mixture: DataFrame,
      idCol: String = "doc_id", defaultPerMille: Long = 0L): DataFrame = {
    val m = mixture.select(col("source"),
      col("keep_per_mille").cast("long").as("keep_per_mille"))
    val dup = m.groupBy(col("source")).count().filter(col("count") > 1)
      .select("source").take(5).map(_.getString(0))
    require(dup.isEmpty,
      s"mixture frame has duplicate rows for source(s) ${dup.mkString(", ")} " +
        "— a recipe must be unique on source (each extra row would " +
        "silently duplicate that source's documents)")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    val rate = coalesce(col("keep_per_mille"), lit(defaultPerMille))
    docs.join(broadcast(m), Seq("source"), "left")
      .withColumn("n_copies",
        floor(rate / 1000) + when(u < rate % 1000, 1L).otherwise(0L))
      .withColumn("keep", col("n_copies") > 0)
      .drop("keep_per_mille")
  }

  /** [[mixtureSample]] with the copies MATERIALIZED: one output row per
    * (document, epoch), `epoch` in [0, n_copies). The explode is a
    * stateless per-row fan-out — no shuffle, and it runs unchanged on a
    * streaming frame exactly like mixtureSample (same stream-static
    * broadcast-join shape). Epoch 0 is the base pass; a doc kept once
    * appears as epoch 0 only, a 2500‰ source's doc as epochs 0,1 and —
    * when its md5 bucket clears the 500‰ remainder — 2. Downstream
    * shard packing sees each epoch as its own row, which is exactly
    * what "repeat the curated corpus 2.5×" means operationally.
    *
    * By default copies SHARE the document id (epoch 0..n−1 rows carry
    * the same `idCol`); a doc-keyed consumer — [[TrainingExport
    * .writeShards]]'s (doc_id, chunk_idx) order, [[TokenEncode
    * .packSequences]]'s unique-id prefix sum — needs a UNIQUE key.
    * `qualifyMaxEpochs` > 0 makes that an operator instead of a
    * documented caller duty: `idCol` is rewritten to
    * `doc_id·qualifyMaxEpochs + epoch` (injective while epoch <
    * qualifyMaxEpochs — enforced PER ROW with raise_error, as is the
    * id-magnitude bound that would otherwise overflow the long
    * silently), so downstream uniqueness holds by construction and the
    * original id/epoch recover as `div`/`mod`. Requires an integral
    * `idCol` (fails loudly on strings — qualify those upstream); pick
    * qualifyMaxEpochs ≥ the recipe's ceil(maxRate/1000), e.g.
    * [[planMixture]]'s maxEpochs + 1 when remainders apply. */
  def mixtureRepeat(docs: DataFrame, mixture: DataFrame,
      idCol: String = "doc_id", defaultPerMille: Long = 0L,
      qualifyMaxEpochs: Int = 0): DataFrame = {
    val base = mixtureSample(docs, mixture, idCol, defaultPerMille)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(expr("sequence(0, n_copies - 1)")))
      .drop("n_copies", "keep")
    if (qualifyMaxEpochs <= 0) base
    else {
      val integral = {
        import org.apache.spark.sql.types._
        Seq(LongType, IntegerType, ShortType, ByteType)
          .contains(docs.schema(idCol).dataType)
      }
      require(integral,
        s"qualifyMaxEpochs needs an integral $idCol to form doc_id·N + " +
          s"epoch (got ${docs.schema(idCol).dataType}) — map string ids " +
          "to longs upstream")
      val m = qualifyMaxEpochs.toLong
      val lim = (Long.MaxValue - (m - 1L)) / m
      base.withColumn(idCol,
        when(col("epoch") >= m, raise_error(concat(
          lit("document "), col(idCol).cast("string"),
          lit(" reaches epoch "), col("epoch").cast("string"),
          lit(s" >= qualifyMaxEpochs=$qualifyMaxEpochs — set it to at " +
            "least the recipe's ceil(max rate / 1000)"))))
          .when(col(idCol).cast("long") < 0L || col(idCol).cast("long") > lim,
            raise_error(concat(lit("document id "), col(idCol).cast("string"),
              lit(s" outside [0, $lim] — qualification by ×$m would " +
                "overflow the long id space"))))
          .otherwise(col(idCol).cast("long") * m + col("epoch").cast("long")))
    }
  }

  /** E18: the gated mixture-sampling query — feeds [[mixtureSample]] a
    * recipe table carrying 100% / 50% / 25% / 12.5% by source index
    * mod 4 (the shape of a "downweight web crawl, keep curated sources"
    * recipe; unparseable names fall in the 12.5% band, matching the
    * recipe this query has always declared). The recipe is derived data
    * here, but the operator takes it as a frame — any (source, rate)
    * table drops in, with no assumption about source-name shape
    * (CurationOpsSpec pins that on a non-`srcN` schema). */
  def sampleMixture(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val srcIdx = substring(col("source"), 4, 10).cast("int") % 4
    val recipe = docs.select(col("source")).distinct()
      .withColumn("keep_per_mille",
        when(srcIdx === 0, 1000L).when(srcIdx === 1, 500L)
          .when(srcIdx === 2, 250L).otherwise(125L))
    mixtureSample(docs, recipe)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("keep"), col("n_chars"))), lit(0L)).as("chars_kept"))
      .orderBy(col("source"))
  }

  val sampleMixtureSql: String =
    """SELECT source, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT) AS chars_kept
      |FROM (
      |  SELECT source, n_chars,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000
      |      < CASE CAST(substr(source, 4) AS INT) % 4
      |          WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 125 END AS keep
      |  FROM documents)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Temperature-based mixture weights — the multilingual/multi-domain
    * α-sampling rule (Arivazhagan et al. 2019 §5, the GPipe/M4
    * temperature; mT5 uses α = 0.3, Xue et al. 2021 §3.2): weight each
    * source by `n_tokens^alpha`. α = 1 is proportional sampling (every
    * token equally likely, big sources dominate); α → 0 approaches
    * uniform-over-sources; the published 0.2-0.7 band upweights
    * low-resource sources without handing them the mixture. Feed the
    * result straight to [[planMixture]] (with `maxEpochs` when the
    * upweighted small sources should repeat rather than redistribute).
    * Domains-sized projection — no collect, no shuffle. */
  def temperatureWeights(stats: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha out of (0, 1] — " +
      "1 is proportional sampling, smaller flattens toward uniform")
    stats.select(col("source"),
      pow(col("n_tokens").cast("double"), lit(alpha)).as("weight"))
  }

  /** Turn target mixture WEIGHTS into feasible keep rates — the planning
    * half of [[mixtureSample]]. Given per-source availability (`stats`:
    * source, n_tokens) and target proportions (`weights`: source,
    * weight — any positive scale, normalized internally), produce the
    * (source, keep_per_mille) table whose expected sample hits
    * `targetTokens` split by weight. By default downsampling only (a
    * rate caps at 1000): when a source is too small for its share, it
    * contributes everything it has and the unmet remainder
    * redistributes over the uncapped sources in weight proportion —
    * classic water-filling, iterated until no new source caps
    * (≤ |sources| rounds). Opting in with `maxEpochs` > 1 lifts the cap
    * to 1000·maxEpochs: a too-small curated source is then REPEATED up
    * to maxEpochs passes before its unmet share redistributes — the
    * standard "N epochs of curated text vs one pass of crawl" recipe —
    * and [[mixtureSample]]/[[mixtureRepeat]] realize the rate as
    * deterministic copies. Sources with no declared weight get NO row —
    * feeding the plan to [[mixtureSample]] then drops them by its
    * fail-closed default.
    *
    * Driver-bounded by construction: the plan is per-DOMAIN, not
    * per-document — `maxSources` (default 100k) guards the collect the
    * same way PercentileOps caps group state, failing loudly rather
    * than ever pulling an unbounded set. Rates are floored to per-mille
    * granularity, so the planned total undershoots by < |sources|/1000
    * of a token-per-mille unit, never overshoots. */
  def planMixture(stats: DataFrame, weights: DataFrame, targetTokens: Long,
      maxSources: Int = 100000, maxEpochs: Int = 1): DataFrame = {
    require(targetTokens > 0, s"targetTokens $targetTokens must be positive")
    require(maxEpochs >= 1, s"maxEpochs $maxEpochs must be >= 1")
    val spark = stats.sparkSession
    import spark.implicits._
    val n = weights.count()
    require(n <= maxSources,
      s"$n mixture sources exceed maxSources=$maxSources — a mixture is " +
        "domains, not documents; raise the cap only if that is really true")
    require(weights.select("source").distinct().count() == n,
      "duplicate source rows in mixture weights — a recipe must be " +
        "unique on source")
    val rows = weights.select(col("source"), col("weight").cast("double"))
      .join(stats.select(col("source"), col("n_tokens").cast("long")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_tokens"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    require(rows.forall(_._2 >= 0), "negative mixture weights")

    // water-filling: capped sources give all they have (times maxEpochs);
    // survivors split the remainder by weight. Each round caps >= 1
    // source or stops. rateCap per-mille == maxEpochs full passes.
    val rateCap = 1000L * maxEpochs
    var remaining = targetTokens.toDouble
    var active = rows.filter(r => r._2 > 0 && r._3 > 0).toSeq
    val capped = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var done = false
    while (!done && active.nonEmpty && remaining > 0) {
      val wSum = active.map(_._2).sum
      val over = active.filter { case (_, w, avail) =>
        remaining * w / wSum >= avail.toDouble * maxEpochs }
      if (over.isEmpty) done = true
      else {
        capped ++= over.map { case (s, _, avail) => (s, rateCap) }
        remaining -= over.map(_._3.toDouble * maxEpochs).sum
        val overSet = over.map(_._1).toSet
        active = active.filterNot(r => overSet.contains(r._1))
      }
    }
    val planned = capped.toSeq ++ {
      val wSum = active.map(_._2).sum
      active.map { case (s, w, avail) =>
        val rate = if (remaining <= 0 || wSum <= 0) 0L
          else math.min(rateCap, (1000.0 * remaining * w / wSum / avail).toLong)
        (s, rate)
      }
    }
    planned.toDF("source", "keep_per_mille")
  }

  /** Fixed-SIZE deterministic sample: exactly min(k, |group|) documents
    * per group, chosen by md5 priority on the id — the "give me 10k
    * docs per domain for eval" op, where [[mixtureSample]] is rate-based
    * and so yields a size only in expectation. The priority is the same
    * portable hash convention as E9/E15/E18, so the selected set is
    * stable across runs, engines and layouts, and GROWS STABLY: adding
    * documents to a group only swaps members whose priority beats an
    * incumbent's. Scale shape: one window partitioned by the group key
    * (domains — many, bounded fan-in per group since only rank ≤ k
    * survives); no global sort, no single partition anywhere. */
  def sampleFixedK(docs: DataFrame, k: Int, idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** E19: the gated fixed-k query — 3 docs per source by hash priority. */
  def sampleFixedKQuery(spark: SparkSession, d: String): DataFrame =
    sampleFixedK(Tables.documents(spark, d), k = 3)
      .select(col("source"), col("doc_id"), col("rnk").cast("long").as("rnk"))
      .orderBy(col("source"), col("rnk"))

  val sampleFixedKSql: String =
    """SELECT source, doc_id, rnk FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM documents)
      |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin

  /** E20: per-source vocabulary statistics — token occurrences, distinct
    * vocabulary, type-token ratio. The classic corpus-composition
    * diagnostic (a source whose TTR collapses is boilerplate; one whose
    * vocabulary explodes is noise/junk). Exact counts: the distinct is
    * a keyed (source, token) pre-aggregation, so hot tokens collapse
    * map-side before the shuffle and the second stage counts vocabulary
    * rows — the same two-level shape as lang_source_agg. At 100 TB the
    * exact distinct is the vocabulary (Zipf-small); if even that is too
    * hot, SketchOps' HLL path is the documented approximate twin. */
  def vocabStats(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_toks"),
        count_distinct(col("tok")).as("n_vocab"))
      .select(col("source"), col("n_toks"), col("n_vocab"),
        (col("n_vocab").cast("double") / col("n_toks")).as("ttr"))
      .orderBy(col("source"))
  }

  val vocabStatsSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_toks,
      |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab,
      |  CAST(COUNT(DISTINCT tok) AS DOUBLE)/COUNT(*) AS ttr
      |FROM toks GROUP BY source ORDER BY source""".stripMargin

  /** Greedy token-budget selection — "fill a T-token training budget
    * with the best-quality documents": order by (score DESC, id ASC —
    * pinned tie rule) and keep the maximal prefix whose token total
    * fits `budgetTokens`. The greedy-by-score rule is the published
    * budget-selection convention (quality-classifier thresholding with
    * a budget is exactly this, stated as a selection instead of a
    * threshold search); the prefix sum is distributed
    * ([[RankOps.exclusivePrefixSum]]: range repartition + per-partition
    * offsets — never a single-partition window). Every row returns
    * with its pre-selection running total `cum_before` and `keep` —
    * fail-visible, the caller filters. A doc that would straddle the
    * budget boundary is EXCLUDED (keep = cum_before + tokens ≤ budget):
    * the budget is a ceiling, not a target to overshoot. */
  def selectByBudget(docs: DataFrame, budgetTokens: Long, scoreCol: String,
      tokCol: String, idCol: String = "doc_id",
      numPartitions: Int = 32): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens")
    RankOps.exclusivePrefixSum(docs, tokCol, "cum_before", numPartitions,
        col(scoreCol).desc, col(idCol))
      .withColumn("keep",
        col("cum_before") + col(tokCol) <= budgetTokens)
  }

  /** Gated entry (`budget_select`): the greedy rule against ground
    * truth — deterministic integer score ((doc_id·37) mod 1000),
    * whitespace token counts, a fixed budget; DuckDB re-derives the
    * ordered running total with a window. */
  def budgetSelect(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        ((col("doc_id") * 37) % 1000).as("score"),
        size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
          .cast("long").as("n_tok"))
    selectByBudget(docs, budgetTokens = 20000L, "score", "n_tok")
      .select("doc_id", "score", "n_tok", "cum_before", "keep")
  }

  val budgetSelectSql: String =
    """WITH t AS (
      |  SELECT doc_id, (doc_id * 37) % 1000 AS score,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, score, n_tok,
      |    CAST(COALESCE(sum(n_tok) OVER (ORDER BY score DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM t)
      |SELECT doc_id, score, n_tok, cum_before,
      |  cum_before + n_tok <= 20000 AS keep
      |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rare_ratio" -> textRareRatio _,
    "sample_weighted" -> sampleWeighted _,
    "sample_mixture" -> sampleMixture _,
    "sample_fixed_k" -> sampleFixedKQuery _,
    "vocab_stats" -> vocabStats _,
    "budget_select" -> budgetSelect _,
    "emb_norm_stats" -> embNormStats _)

  val oracles: Map[String, String] = Map(
    "text_rare_ratio" -> textRareRatioSql,
    "sample_weighted" -> sampleWeightedSql,
    "sample_mixture" -> sampleMixtureSql,
    "sample_fixed_k" -> sampleFixedKSql,
    "vocab_stats" -> vocabStatsSql,
    "budget_select" -> budgetSelectSql,
    "emb_norm_stats" -> embNormStatsSql)
}
