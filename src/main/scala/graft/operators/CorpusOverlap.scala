package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C11: corpus-overlap measurement — "how much of dataset A is inside
  * dataset B" (the question every dataset card answers before mixing
  * sources or claiming a clean eval split; same machinery as the
  * C4/Pile overlap studies). Two tiers, the NgramDedup split:
  *
  *  - EXACT (gated): distinct word-3-gram shingle sets per corpus;
  *    for every corpus pair the intersection size rides a
  *    shingle-keyed aggregation — the per-shingle corpus list is
  *    bounded by the CORPUS count (tiny), never by rows, so pair
  *    expansion is safe at any data size; both directional
  *    containments and Jaccard come from integer counts (cross-engine
  *    exact; the divisions are single IEEE ops).
  *
  *  - SKETCH (scale path, spec-bounded): per-corpus bottom-k of the
  *    shingle hash space plus the exact distinct count. Bottom-k is a
  *    uniform sample of the corpus's distinct-shingle set, so the
  *    merged-bottom-k Jaccard estimator applies; containment converts
  *    via C(a in b) = J·(|A|+|B|) / (|A|·(1+J)). The sketch frame is
  *    one row per corpus (k longs) — pair math never touches the
  *    corpus again.
  *
  * Scale: the only corpus-sized exchanges are the distinct
  * (corpus, shingle-hash) projection (map-side-combinable) and, for
  * the sketch, ONE per-corpus window for the bottom-k — partitioned by
  * corpus, acceptable because corpora are few by definition; the
  * distinct has already collapsed the data to unique hashes.
  */
object CorpusOverlap {

  /** Distinct (corpus, shingle-hash) pairs — word 3-grams, the Dedup
    * shingle convention (token array materialized once). */
  def corpusShingles(docs: DataFrame, corpusCol: String, textCol: String)
      : DataFrame =
    // text-hash spread after the read (r18, scan-width-gated r19 —
    // see Tables.spreadByKey): shingling is the heavy row-local phase
    // and a single-row-group input runs it in one task otherwise (the
    // Dedup.shingles note); corpus alone is too coarse a key — corpora
    // are few by definition
    graft.Tables.spreadByKey(
        docs.select(col(corpusCol).as("corpus"), col(textCol).as("_t")),
        "corpus", "_t")
      .select(col("corpus"), split(col("_t"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("corpus"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
        .as("shingle"))
      .select(col("corpus"), xxhash64(col("shingle")).as("h"))
      .distinct()

  /** Exact pairwise overlap: for each corpus pair a < b, distinct
    * shingle counts, intersection size, both containments, Jaccard. */
  def exactOverlap(docs: DataFrame, corpusCol: String, textCol: String)
      : DataFrame = {
    // checkpointed: the distinct-shingle frame feeds both the sizes and
    // the intersection cells — without it the corpus re-shingles twice
    val sh = corpusShingles(docs, corpusCol, textCol).localCheckpoint()
    val sz = sh.groupBy(col("corpus")).agg(count(lit(1)).as("n"))
    val cells = sh.groupBy(col("h"))
      .agg(collect_set(col("corpus")).as("cs"))
      .filter(size(col("cs")) > 1)
    val pairs = cells
      .select(explode(col("cs")).as("src_a"), col("cs"))
      .select(col("src_a"), explode(col("cs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("common"))
    pairs
      .join(sz.select(col("corpus").as("src_a"), col("n").as("n_a")), Seq("src_a"))
      .join(sz.select(col("corpus").as("src_b"), col("n").as("n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("common"),
        (col("common").cast("double") / col("n_a")).as("containment_a_in_b"),
        (col("common").cast("double") / col("n_b")).as("containment_b_in_a"),
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
  }

  /** Per-corpus sketch: exact distinct-shingle count + bottom-k of the
    * hash space (sorted ascending). One row per corpus. */
  def overlapSketch(docs: DataFrame, corpusCol: String, textCol: String,
                    k: Int = 1024): DataFrame = {
    require(k > 0, "k must be positive")
    // checkpointed: bottom-k and the distinct count share one pass
    val sh = corpusShingles(docs, corpusCol, textCol).localCheckpoint()
    val w = Window.partitionBy(col("corpus")).orderBy(col("h"))
    sh.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
      .groupBy(col("corpus"))
      .agg(sort_array(collect_list(col("h"))).as("bottomk"))
      .join(sh.groupBy(col("corpus")).agg(count(lit(1)).as("n_distinct")),
        Seq("corpus"))
  }

  /** Pairwise estimates off the sketch frame (corpus-count-sized):
    * merged-bottom-k Jaccard, converted to directional containment via
    * the exact distinct counts riding the sketch. */
  def estimateOverlap(sketches: DataFrame, k: Int = 1024): DataFrame = {
    val a = sketches.select(col("corpus").as("src_a"),
      col("bottomk").as("bk_a"), col("n_distinct").as("n_a"))
    val b = sketches.select(col("corpus").as("src_b"),
      col("bottomk").as("bk_b"), col("n_distinct").as("n_b"))
    val merged = array_sort(array_union(col("bk_a"), col("bk_b")))
    val kk = least(lit(k), size(merged))
    val mergedK = slice(merged, lit(1), kk)
    val inBoth = size(array_intersect(
      array_intersect(mergedK, col("bk_a")), col("bk_b")))
    val j = inBoth.cast("double") / kk.cast("double")
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        j.as("jaccard_est"),
        least(lit(1.0), j * (col("n_a") + col("n_b")).cast("double") /
          (col("n_a").cast("double") * (j + lit(1.0))))
          .as("containment_a_in_b_est"),
        least(lit(1.0), j * (col("n_a") + col("n_b")).cast("double") /
          (col("n_b").cast("double") * (j + lit(1.0))))
          .as("containment_b_in_a_est"))
  }

  // ---------------------------------------------------------------- gate

  /** Gate `corpus_overlap`: exact pairwise overlap of the documents
    * table's `source` corpora. */
  def overlapGate(spark: SparkSession, d: String): DataFrame =
    exactOverlap(Tables.documents(spark, d), "source", "text")
      .orderBy(col("src_a"), col("src_b"))

  val overlapSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT source AS corpus,
      |    unnest(list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))) AS shingle
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |sz AS (SELECT corpus, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY corpus),
      |p AS (
      |  SELECT a.corpus AS src_a, b.corpus AS src_b,
      |    CAST(COUNT(*) AS BIGINT) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.corpus < b.corpus
      |  GROUP BY a.corpus, b.corpus)
      |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, common,
      |  CAST(common AS DOUBLE) / sa.n AS containment_a_in_b,
      |  CAST(common AS DOUBLE) / sb.n AS containment_b_in_a,
      |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
      |FROM p JOIN sz sa ON sa.corpus = src_a JOIN sz sb ON sb.corpus = src_b
      |ORDER BY src_a, src_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_overlap" -> overlapGate _)

  val oracles: Map[String, String] = Map(
    "corpus_overlap" -> overlapSql)
}
