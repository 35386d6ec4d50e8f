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
    * unfiltered crawl sneaks into a training set). Returns `docs` plus
    * a `keep` boolean; filter or aggregate downstream. Scale shape: the
    * mixture is domains, not documents — KBs — so this is a broadcast
    * join plus a per-row projection, zero shuffles. */
  def mixtureSample(docs: DataFrame, mixture: DataFrame,
      idCol: String = "doc_id", defaultPerMille: Long = 0L): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    docs.join(broadcast(mixture.select(col("source"),
        col("keep_per_mille").cast("long").as("keep_per_mille"))),
      Seq("source"), "left")
      .withColumn("keep", u < coalesce(col("keep_per_mille"), lit(defaultPerMille)))
      .drop("keep_per_mille")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rare_ratio" -> textRareRatio _,
    "sample_weighted" -> sampleWeighted _,
    "sample_mixture" -> sampleMixture _,
    "emb_norm_stats" -> embNormStats _)

  val oracles: Map[String, String] = Map(
    "text_rare_ratio" -> textRareRatioSql,
    "sample_weighted" -> sampleWeightedSql,
    "sample_mixture" -> sampleMixtureSql,
    "emb_norm_stats" -> embNormStatsSql)
}
