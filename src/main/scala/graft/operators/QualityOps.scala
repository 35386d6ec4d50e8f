package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality operators for LLM training-data curation (SURVEY §2
  * E11–E13): Gopher-style rule filtering, corpus n-gram frequency, and a
  * Zipf/vocabulary summary. All pure codegen'd builtins over a single
  * materialized token array (the G3 tokenize-once convention — the array
  * is projected once and every statistic reads it), no UDFs.
  *
  * Exactness: every ratio is one IEEE divide of two exact integers, so
  * both engines compute the identical double; flags compare those exact
  * ratios against literal thresholds.
  */
object QualityOps {

  /** E11: Gopher-style quality rules (cf. Rae et al. 2021, "Scaling
    * Language Models: Gopher" §A1.1 data pipeline): word-count bounds,
    * mean-word-length band, type-token ratio, and stopword presence.
    * One projection materializes `toks`; counts derive from it; the four
    * flags and the composite `pass` are plain integer/double compares.
    * Thresholds are tuned to this synthetic corpus so each rule fails a
    * real slice (word count 10-99, mwl 3.7-5.3, ttr 0.28-1.0 here). */
  def qualityGopher(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
      .transform(qualityFlags)
      .orderBy(col("doc_id"))

  /** The rule core, shared verbatim by the batch query above and the
    * streaming gate (StreamingQualityGate): one expression tree, so
    * batch/online parity is structural, not re-implemented. Row-local —
    * no aggregation, no state — hence directly streamable. Input needs
    * (doc_id, text). */
  def qualityFlags(docs: DataFrame): DataFrame = {
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_word_chars"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        size(filter(col("toks"), t => t === "the" || t === "a")).cast("long").as("n_stop"))
      .select(
        col("doc_id"), col("n_words"),
        (col("n_word_chars").cast("double") / col("n_words")).as("mean_word_len"),
        (col("n_distinct").cast("double") / col("n_words")).as("ttr"),
        (col("n_stop").cast("double") / col("n_words")).as("stop_ratio"))
      .withColumn("flag_words", col("n_words") >= 25 && col("n_words") <= 90)
      .withColumn("flag_mwl", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 4.6)
      .withColumn("flag_ttr", col("ttr") >= 0.35)
      .withColumn("flag_stop", col("stop_ratio") >= 0.01)
      .withColumn("pass",
        col("flag_words") && col("flag_mwl") && col("flag_ttr") && col("flag_stop"))
  }

  val qualityGopherSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      tok -> tok IN ('the', 'a'))) AS BIGINT) AS n_stop
      |  FROM documents),
      | r AS (
      |  SELECT doc_id, n_words,
      |    CAST(n_word_chars AS DOUBLE)/n_words AS mean_word_len,
      |    CAST(n_distinct AS DOUBLE)/n_words AS ttr,
      |    CAST(n_stop AS DOUBLE)/n_words AS stop_ratio
      |  FROM t)
      |SELECT doc_id, n_words, mean_word_len, ttr, stop_ratio,
      |  (n_words >= 25 AND n_words <= 90) AS flag_words,
      |  (mean_word_len >= 3.0 AND mean_word_len <= 4.6) AS flag_mwl,
      |  (ttr >= 0.35) AS flag_ttr,
      |  (stop_ratio >= 0.01) AS flag_stop,
      |  (n_words >= 25 AND n_words <= 90
      |    AND mean_word_len >= 3.0 AND mean_word_len <= 4.6
      |    AND ttr >= 0.35 AND stop_ratio >= 0.01) AS pass
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** E12: corpus-wide 3-gram frequency top-k. Unlike the dedup shingles
    * (distinct per doc), this keeps every occurrence: explode → count is
    * map-side combinable, so at 100 TB each executor pre-reduces its
    * gram counts before one shuffle on the gram key; the final top-k is
    * a TakeOrdered over the reduced counts, never a global sort of the
    * corpus. Tie-break on the gram string keeps the cut deterministic. */
  def textNgramTopk(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("text"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(20)
  }

  val textNgramTopkSql: String =
    """SELECT gram, COUNT(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
      |         || ' ' || string_split(text, ' ')[i+2])) AS gram
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3)
      |GROUP BY gram
      |ORDER BY n DESC, gram
      |LIMIT 20""".stripMargin

  /** E13: corpus vocabulary / Zipf summary — one row: total tokens,
    * distinct tokens, hapax legomena, and the most frequent token
    * (min-token tie-break). The term-frequency table is the only
    * corpus-sized intermediate (one combinable shuffle); the summary and
    * the argmax are a scalar agg plus a 1-row TakeOrdered over it. */
  def textZipf(spark: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val stats = tf.agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val top = tf.orderBy(col("c").desc, col("tok"))
      .limit(1)
      .select(col("tok").as("top_token"), col("c").as("top_count"))
    stats.crossJoin(broadcast(top))
  }

  val textZipfSql: String =
    """WITH tf AS (
      |  SELECT tok, COUNT(*) AS c
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok)
      |SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_distinct,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  MIN(CASE WHEN c = (SELECT MAX(c) FROM tf) THEN tok END) AS top_token,
      |  CAST(MAX(c) AS BIGINT) AS top_count
      |FROM tf""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_gopher" -> qualityGopher _,
    "text_ngram_topk" -> textNgramTopk _,
    "text_zipf" -> textZipf _)

  val oracles: Map[String, String] = Map(
    "quality_gopher" -> qualityGopherSql,
    "text_ngram_topk" -> textNgramTopkSql,
    "text_zipf" -> textZipfSql)
}
