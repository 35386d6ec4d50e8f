package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY §2 E1–E5): token/char
  * statistics, stopword-profile language ID, quality scoring, normalization
  * fingerprinting, and BPE-ish token counting.
  *
  * Everything is a single narrow projection over the scan — no shuffle at
  * all except the fingerprint's canonical-id window (partitioned by the
  * fingerprint hash, which is uniformly distributed). All expressions are
  * Spark builtins (codegen'd); no UDFs.
  */
object TextOps {
  private val stopArr = "x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in'"

  /** E1: per-document surface statistics. The token array is projected
    * ONCE and every stat reads it (G3 convention): aliases referenced
    * more than once are non-cheap, so CollapseProject keeps the barrier
    * and the row is tokenized a single time instead of once per stat. */
  def textStats(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("alpha_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(col("toks"))).as("avg_token_len"),
        expr(s"size(filter(toks, $stopArr))").as("n_stopwords"))
      .orderBy(col("doc_id"))
  }

  val textStatsSql: String =
    """SELECT doc_id,
      | length(text) AS n_chars,
      | len(toks) AS n_tokens,
      | len(list_distinct(toks)) AS n_distinct_tokens,
      | CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
      | CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(toks) AS avg_token_len,
      | len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in')) AS n_stopwords
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** E2: stopword-profile language identification (deterministic n-gram
    * heuristic; compared against the generator's `lang` label). */
  def textLangid(spark: SparkSession, d: String): DataFrame = {
    // tokenize ONCE, score all four profiles from the materialized array
    // (embedding split() in each score re-tokenized the row 4×)
    def score(words: Seq[String]) =
      expr(s"size(filter(toks, x -> ${words.map(w => s"x = '$w'").mkString(" OR ")}))")
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("lang").as("actual"),
        score(Seq("the", "a")).as("s_en"),
        score(Seq("el", "la", "los")).as("s_es"),
        score(Seq("le", "les", "des")).as("s_fr"),
        score(Seq("der", "die", "das")).as("s_de"))
      .withColumn("predicted",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de"), "es")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de"))
      .withColumn("is_match", col("predicted") === col("actual"))
      .orderBy(col("doc_id"))
  }

  val textLangidSql: String =
    """SELECT doc_id, actual, s_en, s_es, s_fr, s_de,
      |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
      |       WHEN s_fr >= s_de THEN 'fr'
      |       ELSE 'de' END AS predicted,
      |  (CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
      |       WHEN s_fr >= s_de THEN 'fr'
      |       ELSE 'de' END) = actual AS is_match
      |FROM (
      |  SELECT doc_id, lang AS actual,
      |   len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS s_en,
      |   len(list_filter(toks, x -> x = 'el' OR x = 'la' OR x = 'los')) AS s_es,
      |   len(list_filter(toks, x -> x = 'le' OR x = 'les' OR x = 'des')) AS s_fr,
      |   len(list_filter(toks, x -> x = 'der' OR x = 'die' OR x = 'das')) AS s_de
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** E3: composite quality score + keep/drop decision (single tokenize,
    * same materialized-array convention as [[textStats]]). */
  def textQuality(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        expr(s"size(filter(toks, $stopArr))").as("stop_cnt"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("alpha_chars"),
        length(col("text")).as("n_chars"))
      .select(col("doc_id"), col("n_tokens"),
        (lit(0.4) * least(lit(1.0), col("n_tokens") / lit(100.0)) +
          lit(0.3) * (col("stop_cnt") / col("n_tokens")) +
          lit(0.3) * (col("alpha_chars") / col("n_chars"))).as("quality"))
      .withColumn("keep", col("quality") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String =
    """SELECT doc_id, n_tokens,
      | 0.4 * least(1.0, n_tokens / 100.0) + 0.3 * (stop_cnt / n_tokens) + 0.3 * (alpha_chars / n_chars) AS quality,
      | (0.4 * least(1.0, n_tokens / 100.0) + 0.3 * (stop_cnt / n_tokens) + 0.3 * (alpha_chars / n_chars)) >= 0.5 AS keep
      |FROM (
      |  SELECT doc_id,
      |   len(string_split(text, ' ')) AS n_tokens,
      |   len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in')) AS stop_cnt,
      |   length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars,
      |   length(text) AS n_chars
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** E4: normalization fingerprint (sorted distinct tokens → md5) with a
    * canonical representative per fingerprint cluster. */
  def textFingerprint(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .orderBy(col("doc_id"))
  }

  val textFingerprintSql: String =
    """SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id
      |FROM (SELECT doc_id,
      |        md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** E5: token counting — regex word tokens plus a BPE-ish upper bound
    * (ceil(len/4) subword pieces per whitespace token). */
  def textTokenCount(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).as("n_word_tokens"),
        expr("aggregate(transform(split(text, ' '), x -> CAST(ceil(length(x)/4.0) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("n_bpeish_tokens"))
      .orderBy(col("doc_id"))
  }

  val textTokenCountSql: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_word_tokens,
      | CAST(list_sum(list_transform(string_split(text, ' '), x -> CAST(ceil(length(x)/4.0) AS BIGINT))) AS BIGINT) AS n_bpeish_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> textStats _,
    "text_langid" -> textLangid _,
    "text_quality" -> textQuality _,
    "text_fingerprint" -> textFingerprint _,
    "text_token_count" -> textTokenCount _)

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_fingerprint" -> textFingerprintSql,
    "text_token_count" -> textTokenCountSql)
}
