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
}
