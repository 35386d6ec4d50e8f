package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** E30: CCNet-style per-group quantile bucketing (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data" §4.3): documents bucket into head/middle/tail BY LANGUAGE by
  * their LM perplexity's position among the language's own quantiles —
  * the published shape for "keep the best third of each language"
  * (a global cut would keep only the languages the LM likes). Composes
  * directly over E23: `NgramLm.score` → [[assignBuckets]] on
  * (lang, ppl).
  *
  * Scale shape: NO per-group window — language distribution in a crawl
  * is exactly the skew that pins one task (one language can be half
  * the corpus, and `Window.partitionBy(lang)` puts it in one
  * partition). Instead the cuts come from
  * [[PercentileOps.percentileDisc]] — the count-banded EXACT iterative
  * selection (driver state capped at groups × buckets × bands counts,
  * 3-4 passes at any scale, each pass a pushed-down range filter) —
  * and assignment is one broadcast join of the (group, cuts) table
  * plus a row-local comparison fold. Two corpus scans total, zero
  * shuffles of the corpus.
  *
  * Tie rule, pinned: cut_b = percentile_disc((b+1)/nBuckets) (the
  * smallest value whose cumulative distribution reaches p), and a row
  * lands in the smallest bucket whose cut it does not EXCEED — a value
  * equal to a cut goes LOW (bucket b, not b+1). Deterministic and
  * engine-independent: both sides are exact order statistics, no
  * interpolation. Rows with null/NaN values (e.g. the fail-closed
  * cleans-to-empty docs upstream) get a NULL bucket — callers route
  * them explicitly instead of silently inheriting a tier.
  */
object PerplexityBuckets {

  /** Assign every row a `bucket` (0-based int, 0 = lowest values = the
    * CCNet "head" when the value is perplexity) and, when `names` is
    * given (length nBuckets), a `bucket_name`. Input needs
    * (groupCol, valueCol); all input columns pass through. */
  def assignBuckets(scored: DataFrame, groupCol: String = "lang",
      valueCol: String = "ppl", nBuckets: Int = 3,
      names: Seq[String] = Seq.empty,
      maxGroups: Int = 4096): DataFrame = {
    require(nBuckets >= 2, s"nBuckets $nBuckets must be >= 2")
    require(names.isEmpty || names.length == nBuckets,
      s"names has ${names.length} entries for $nBuckets buckets")
    val spark = scored.sparkSession
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = PercentileOps.percentileDisc(
      scored, groupCol, valueCol, ps, maxGroups = maxGroups)
    // (group, ascending cut array) — groups × (nBuckets−1) doubles of
    // driver state, broadcast to the corpus
    val cutRows = cuts.toSeq.groupBy(_._1._1).map { case (g, m) =>
      Row(g, m.sortBy(_._1._2).map(_._2).toArray.toSeq)
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_g",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_cuts",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    val cutsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cutRows, 1), schema)
    val v = col(valueCol).cast("double")
    scored
      .join(broadcast(cutsDf), col(groupCol).cast("string") === col("_g"), "left")
      .withColumn("bucket",
        when(v.isNull || isnan(v) || col("_cuts").isNull, lit(null))
          .otherwise(size(filter(col("_cuts"), c => v > c))))
      .withColumn("bucket",
        when(col("bucket").isNotNull, col("bucket").cast("int")))
      .drop("_g", "_cuts")
      .transform { df =>
        if (names.isEmpty) df
        else df.withColumn("bucket_name",
          when(col("bucket").isNotNull,
            element_at(typedLit(names), col("bucket") + 1)))
      }
  }

  /** The CCNet composition in one call: train-or-given LM scores →
    * per-language head/middle/tail. `scored` must carry (lang, ppl) —
    * typically `NgramLm.score(docs, model)` joined back to `lang`. */
  def headMiddleTail(scored: DataFrame, groupCol: String = "lang",
      valueCol: String = "ppl", maxGroups: Int = 4096): DataFrame =
    assignBuckets(scored, groupCol, valueCol, nBuckets = 3,
      names = Seq("head", "middle", "tail"), maxGroups = maxGroups)

  /** Gated harness entry: per-language quartile bucketing against an
    * independent engine. The score is derived deterministically from
    * doc_id ((id·37) mod 101 — integer-valued, so many docs per
    * language SHARE a value and the goes-low tie rule actually
    * decides rows), and nBuckets = 4 so every quantile fraction
    * (0.25/0.5/0.75) is an exact binary double: p·n and k/n
    * comparisons are exact in both engines and no float-boundary
    * ambiguity can leak into the cut selection. DuckDB's
    * `quantile_disc` implements the same smallest-value-whose-
    * cume-dist-reaches-p convention as [[PercentileOps.percentileDisc]]
    * (probed: p=0.9 over {1,2,3} → 3, p=2/3 over {1..5} → 4 — the
    * floor-index convention would answer 2 and 3), so cuts, the
    * v-equal-to-cut-goes-low assignment, and the name mapping are all
    * independently recomputed. */
  def perpBuckets(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val scored = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        ((col("doc_id") * 37) % 101).cast("double").as("ppl"))
    assignBuckets(scored, groupCol = "lang", valueCol = "ppl",
      nBuckets = 4, names = Seq("q1", "q2", "q3", "q4"))
  }

  val perpBucketsSql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang, CAST((doc_id * 37) % 101 AS DOUBLE) AS ppl
      |  FROM documents),
      |cuts AS (
      |  SELECT lang,
      |    quantile_disc(ppl, 0.25) AS c1,
      |    quantile_disc(ppl, 0.5)  AS c2,
      |    quantile_disc(ppl, 0.75) AS c3
      |  FROM scored GROUP BY lang)
      |SELECT s.doc_id, s.lang, s.ppl,
      |  CAST((CASE WHEN s.ppl > c.c1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.ppl > c.c2 THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.ppl > c.c3 THEN 1 ELSE 0 END) AS INT) AS bucket,
      |  CASE (CASE WHEN s.ppl > c.c1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.ppl > c.c2 THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.ppl > c.c3 THEN 1 ELSE 0 END)
      |    WHEN 0 THEN 'q1' WHEN 1 THEN 'q2'
      |    WHEN 2 THEN 'q3' ELSE 'q4' END AS bucket_name
      |FROM scored s JOIN cuts c USING (lang)""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("perp_buckets" -> perpBuckets _)

  val oracles: Map[String, String] = Map(
    "perp_buckets" -> perpBucketsSql)
}
