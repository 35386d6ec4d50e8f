package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline hygiene operators (SURVEY §2 E6–E9): redaction, repetition
  * detection, length-percentile ranking, and deterministic stratified
  * sampling — the data-curation steps between raw ingest and training.
  * All are single-pass projections or one keyed window; the sample is
  * hash-derived so it is reproducible across runs and engines (no RNG).
  */
object PipelineOps {

  /** E6: PII-style redaction — digits and emails masked, with a
    * before/after audit hash. The redacted string is materialized in its
    * own projection: referenced twice (hash + length), the double-regex
    * chain would otherwise be evaluated once per reference — codegen
    * subexpression elimination does not reach across the two regex
    * calls nested inside different parent expressions. */
  def textRedact(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text"),
        regexp_replace(
          regexp_replace(col("text"), "[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
          "[0-9]+", "<NUM>").as("redacted"))
      .select(col("doc_id"), md5(col("text")).as("orig_hash"),
        md5(col("redacted")).as("redacted_hash"),
        (length(col("text")) - length(col("redacted"))).as("chars_redacted"))
      .orderBy(col("doc_id"))
  }

  val textRedactSql: String =
    """SELECT doc_id, md5(text) AS orig_hash,
      | md5(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'), '[0-9]+', '<NUM>', 'g')) AS redacted_hash,
      | length(text) - length(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'), '[0-9]+', '<NUM>', 'g')) AS chars_redacted
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** E7: repetition detection — count of adjacent duplicate tokens, a
    * standard low-quality-text signal. */
  def textRepetition(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        expr("""size(filter(zip_with(slice(toks, 1, size(toks) - 1),
               |              slice(toks, 2, size(toks) - 1), (a, b) -> a = b),
               |       x -> x))""".stripMargin).as("n_adjacent_repeats"))
      .withColumn("repeat_ratio",
        col("n_adjacent_repeats") / (col("n_tokens") - 1))
      .orderBy(col("doc_id"))
  }

  val textRepetitionSql: String =
    """SELECT doc_id, n_tokens, n_adjacent_repeats,
      | n_adjacent_repeats / (n_tokens - 1) AS repeat_ratio
      |FROM (
      |  SELECT doc_id, len(t) AS n_tokens,
      |    len(list_filter(list_zip(t[1:-2], t[2:-1]), s -> s[1] = s[2])) AS n_adjacent_repeats
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** E8: corpus-relative length rank. percent_rank(v) is pure count
    * arithmetic — (# rows shorter) / (n-1) — so it's computed via
    * RankOps' banded counting instead of an empty-partitionBy window
    * (which would drag the whole corpus through one task at scale).
    * Same doubles bit-for-bit: identical integer operands, one double
    * division in both engines. */
  def textLengthRank(spark: SparkSession, d: String): DataFrame = {
    RankOps.percentRankByCounts(
        Tables.documents(spark, d).select(col("doc_id"), col("n_chars")),
        "n_chars", "len_pct_rank")
      .select("doc_id", "n_chars", "len_pct_rank")
      .orderBy(col("doc_id"))
  }

  val textLengthRankSql: String =
    """SELECT doc_id, n_chars,
      | percent_rank() OVER (ORDER BY n_chars) AS len_pct_rank
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** E9: deterministic stratified 10% sample — hash-bucketed, so the
    * sample is stable across runs, engines and cluster layouts (a seeded
    * RNG sample is none of those). */
  def sampleStratified(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .filter((conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 10) === 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"))
  }

  val sampleStratifiedSql: String =
    """SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
      |FROM documents
      |WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10 = 0
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_redact" -> textRedact _,
    "text_repetition" -> textRepetition _,
    "text_length_rank" -> textLengthRank _,
    "sample_stratified" -> sampleStratified _)

  val oracles: Map[String, String] = Map(
    "text_redact" -> textRedactSql,
    "text_repetition" -> textRepetitionSql,
    "text_length_rank" -> textLengthRankSql,
    "sample_stratified" -> sampleStratifiedSql)
}
