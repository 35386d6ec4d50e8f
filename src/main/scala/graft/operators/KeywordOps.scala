package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E40: per-document keyword extraction — the top-k terms of each
  * document ranked by (tf DESC, df ASC, term ASC): the highest-count
  * terms first, corpus-RARER term wins ties (the exact-integer kernel
  * of tf-idf — idf is monotone-decreasing in df, so for EQUAL tf the
  * df order IS the tf·idf order; skipping the log keeps every
  * comparison integer arithmetic, bit-identical cross-engine, where a
  * float idf would gate on ln() ulps). The dense cousin D11
  * (TfidfVectors) produces hashed float vectors for retrieval; this
  * produces the human-readable per-doc keyword list for corpus
  * exploration and dataset cards (E33 consumes per-source rollups;
  * this is the per-document view).
  *
  * Scale: one explode + (doc, term) combinable count, a term-keyed df
  * aggregate joined back on term (vocab-sized build side — skewed hot
  * terms are exactly the HIGH-df terms, which sort last and are
  * usually stopword-filtered upstream by E3/E11), and a window
  * partitioned BY DOCUMENT (never a global sort; Catalyst's
  * WindowGroupLimit pushes the rank<=k limit into the sort). Output
  * is k·|docs| rows.
  */
object KeywordOps {

  /** Top-k terms per document. `df` must hold (idCol, textCol); terms
    * are whitespace tokens (the corpus's vocab_stats convention —
    * swap in a real analyzer upstream if the text is raw). Empty
    * tokens (double spaces) are dropped; a document of only
    * whitespace yields no rows. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k $k")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // anchored (r19): tf feeds BOTH the df aggregate and the ranked
    // join — un-anchored, Catalyst duplicates the whole tokenize +
    // count subtree and the corpus is exploded and aggregated twice
    // (plan-verified: two identical Scan→Generate→HashAggregate
    // chains). One materialization of the (doc, term, tf) rollup
    // instead (guide §2.4).
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfCounts = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfCounts, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** Gated entry (`doc_top_terms`): top-3 keywords over the documents
    * table — every ranking comparison is exact integers, so DuckDB
    * re-derives the identical list including every tie break. */
  def topTermsGate(spark: SparkSession, d: String): DataFrame =
    topTerms(Tables.documentsSpread(spark, d), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank"))

  val topTermsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE len(term) > 0 GROUP BY 1, 2),
      |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
      |    CAST(row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, dfc.df ASC, tf.term ASC) AS INT) AS rank
      |  FROM tf JOIN dfc ON tf.term = dfc.term)
      |SELECT doc_id, rank, term, tf, df FROM ranked
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_top_terms" -> topTermsGate _)

  val oracles: Map[String, String] = Map(
    "doc_top_terms" -> topTermsSql)
}
