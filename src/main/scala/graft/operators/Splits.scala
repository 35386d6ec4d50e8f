package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus SPLITS + leakage-safe holdout — the step every
  * training run needs between curation and packing: carve train /
  * validation / test slices that are (a) reproducible on any engine,
  * layout or corpus ordering, (b) stable as the corpus grows (a
  * document's slice never depends on other documents), and (c) free of
  * internal leakage — near-copies of held-out documents removed from
  * the TRAIN side, the published decontamination direction (GPT-3
  * removes train-side overlap and keeps the eval set fixed, Brown et
  * al. 2020 Appendix C; the reference repo serves precomputed features
  * — main.py:37-340 — so like the rest of the curation stack this is
  * engine-added).
  *
  * Assignment is the E9/E15/E18 md5-bucket convention on (id, seed):
  * bucket = first 8 hex chars of md5("id:seed") mod 1000, split by
  * cumulative per-mille ranges in recipe order. A per-row projection —
  * zero shuffles, stream-transparent (the mixtureSample argument;
  * spec'd stateless on a real stream), and cross-engine reproducible
  * (DuckDB computes the identical bucket, the E9 oracle precedent).
  * The leak-checked composition ([[assignSplitClean]]) joins the
  * corpus against itself and therefore streams via `foreachBatch`
  * (the StreamingModelGate convention), not as a bare stream
  * transform.
  *
  * Leak detection composes E10 verbatim: the train slice plays the
  * corpus, the held-out slices play the "benchmark" — but a holdout is
  * a constant FRACTION of the corpus, not a benchmark-sized table, so
  * [[holdoutLeaks]] drops the broadcast hint by default
  * (`Contamination.contamination(broadcastBench = false)`: the
  * size-based planner shuffles both shingle streams — one equi-join on
  * 8-byte hashes, never pairwise).
  */
object Splits {

  /** Label every document with its split: the input columns plus
    * `split`. `splits` is the recipe as (name, perMille) in priority
    * order; per-milles must be positive and sum to exactly 1000 —
    * anything else would silently orphan or double-assign bucket
    * ranges, so it fails loudly (the mixture-recipe convention).
    * Same (id, seed, recipe) → same split, forever: growing the
    * corpus never reshuffles existing documents across the boundary
    * (each row's bucket is a pure function of its own id), which is
    * what makes the holdout TRUSTWORTHY across refreshes — a doc that
    * was eval yesterday cannot silently become train today. */
  def assignSplit(docs: DataFrame, splits: Seq[(String, Int)],
      idCol: String = "doc_id", seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "empty split recipe")
    require(splits.forall(_._2 > 0),
      s"non-positive per-mille in $splits — every split must own buckets")
    require(splits.map(_._2).sum == 1000,
      s"per-milles ${splits.map(_._2)} sum to ${splits.map(_._2).sum}, " +
        "not 1000 — buckets would be orphaned or double-assigned")
    require(splits.map(_._1).distinct.length == splits.length,
      s"duplicate split names in ${splits.map(_._1)}")
    val bucket = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":"), lit(seed.toString))), 1, 8), 16, 10).cast("long") % 1000
    // cumulative ranges in recipe order: [0, p1), [p1, p1+p2), ...;
    // they partition [0, 1000), so a first-match chain on the upper
    // bound assigns every bucket exactly once
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val splitCol = splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), elseCol) =>
        when(bucket < hi, lit(name)).otherwise(elseCol)
    }
    docs.withColumn("split", splitCol)
  }

  /** Train-side documents whose text leaks the holdout: every doc in
    * `trainSplit` sharing ≥ `minOverlap` distinct word 3-grams with ANY
    * document of any OTHER split, as (idCol, n_shingles, n_contaminated,
    * worst_holdout_id, worst_overlap) — E10's output with the holdout
    * doc id in the benchmark seat. Input is an [[assignSplit]]-labeled
    * frame. The holdout side joins un-broadcast by default (it is a
    * fraction of the corpus, not a benchmark; `broadcastHoldout = true`
    * restores the hint for small corpora). */
  def holdoutLeaks(labeled: DataFrame, trainSplit: String = "train",
      minOverlap: Int = 3, idCol: String = "doc_id",
      textCol: String = "text", broadcastHoldout: Boolean = false): DataFrame = {
    require(labeled.columns.contains("split"),
      "frame has no 'split' column — label it with assignSplit first")
    val t = labeled.filter(col("split") === trainSplit)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val h = labeled.filter(col("split") =!= trainSplit)
      .select(col(idCol).as("bench_id"), col(textCol).as("text"))
    Contamination.contamination(t, h, minOverlap,
        broadcastBench = broadcastHoldout)
      .withColumnRenamed("worst_bench_id", "worst_holdout_id")
      .withColumnRenamed("doc_id", idCol)
  }

  /** [[assignSplit]] + leak labeling in one call: every input row comes
    * back (the C4Filters convention) with `split` and `leaks_holdout` —
    * true exactly on train-side docs [[holdoutLeaks]] flags; held-out
    * rows are never flagged (the eval set stays FIXED; only train
    * shrinks — the published direction). Training consumption filters
    * `split = trainSplit AND NOT leaks_holdout`. */
  def assignSplitClean(docs: DataFrame, splits: Seq[(String, Int)],
      trainSplit: String = "train", minOverlap: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      seed: Long = 0L, broadcastHoldout: Boolean = false): DataFrame = {
    require(splits.exists(_._1 == trainSplit),
      s"trainSplit '$trainSplit' not in recipe ${splits.map(_._1)}")
    val labeled = assignSplit(docs, splits, idCol, seed)
    val leaks = holdoutLeaks(labeled, trainSplit, minOverlap, idCol,
        textCol, broadcastHoldout)
      .select(col(idCol), lit(true).as("leaks_holdout"))
    labeled.join(leaks, Seq(idCol), "left")
      .withColumn("leaks_holdout", coalesce(col("leaks_holdout"), lit(false)))
  }

  /** Gated harness entry: the canonical 800/100/100‰ recipe at seed 0
    * over the documents table — per-document split labels, hash-exact
    * against DuckDB recomputing the identical md5 bucket (the E9/E15
    * oracle precedent; cross-engine reproducibility is the whole point
    * of the convention, so it is exactly what the gate should pin). */
  def splitAssign(spark: SparkSession, d: String): DataFrame =
    assignSplit(Tables.documents(spark, d).select(col("doc_id")),
      Seq("train" -> 800, "valid" -> 100, "test" -> 100))

  val splitAssignSql: String =
    """SELECT doc_id,
      |  CASE WHEN b < 800 THEN 'train'
      |       WHEN b < 900 THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
      |             AS BIGINT) % 1000 AS b
      |      FROM documents) t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_assign" -> splitAssign _)

  val oracles: Map[String, String] = Map(
    "split_assign" -> splitAssignSql)
}
