package graft

import graft.operators._
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ FeatureOps.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      ExtendedQueries.queries ++ TemporalOps.queries ++ CrossModal.queries ++
      PipelineOps.queries ++ DedupClusters.queries ++ Contamination.queries ++
      ShapeQueries.queries ++ ShapeQueries2.queries ++ ShapeQueries3.queries ++
      ShapeQueries4.queries ++ SupplyMart.queries ++
      graft.registry.Incremental.queries ++
      QualityOps.queries ++ CurationOps.queries ++ IntervalJoin.queries ++
      ChunkOps.queries ++ Splits.queries ++ UrlFilters.queries ++
      GopherRepetition.queries ++ C4Filters.queries ++ TextNorm.queries ++
      PerplexityBuckets.queries ++ Bm25.queries ++ TextRepair.queries ++
      ClusterOps.queries ++ DriftMonitor.queries ++ SnapshotDiff.queries ++
      RobustStats.queries ++ SkewOps.queries ++ RecordLinkage.queries ++
      graft.sources.FileStatsIndex.queries ++ PercentileOps.queries ++
      Merge.queries ++ CohortOps.queries ++ TableProfile.queries ++
      AsOfJoin.queries ++ Privacy.queries ++ BasketOps.queries ++
      KeywordOps.queries ++ CorrelationOps.queries ++ Scd2.queries ++
      RegressionOps.queries ++ IntegrityOps.queries ++ CorpusOverlap.queries ++
      TimeSeriesOps.queries ++ GraphOps.queries ++ TargetEncode.queries ++
      FunnelOps.queries ++ ModelEval.queries ++ CorpusReport.queries

  /** Bench-only timing split for COMPOSITE gate keys (r15 directive 3):
    * a key here is timed over `benchOverride` (the plan the gate
    * certifies) after its `benchSetup` ran untimed once per bench run
    * (the structural cost the production path amortizes — logged
    * beside the line under the BENCH_SETUP prefix, never hidden). The
    * correctness gate keeps running the composite `queries` entry, so
    * determinism is untouched; BenchLineSpec pins the two maps' keys
    * equal and a subset of `queries`. */
  val benchSetup: Map[String, (SparkSession, String) => Unit] = Map(
    "supply_mart_q9" -> ((s, d) => SupplyMart.q9ScratchBuild(s, d)))

  val benchOverride: Map[String, (SparkSession, String) => DataFrame] = Map(
    "supply_mart_q9" -> ((s, d) => SupplyMart.q9FromPrebuilt(s, d)))

  /** Queries deliberately WITHOUT an oracle entry — the driver records
    * its weaker rows-only check for these. Membership requires a
    * documented reason at the operator: currently only the approximate
    * sketches, whose merge order is engine-internal and therefore not
    * cross-engine reproducible (the exact forms stay oracle-gated).
    * BenchLineSpec asserts queries ∖ oracleSql == this set exactly. */
  val rowsOnlyQueries: Set[String] = Set("agg_percentiles_approx")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ FeatureOps.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      ExtendedQueries.oracles ++ TemporalOps.oracles ++ CrossModal.oracles ++
      PipelineOps.oracles ++ DedupClusters.oracles ++ Contamination.oracles ++
      ShapeQueries.oracles ++ ShapeQueries2.oracles ++ ShapeQueries3.oracles ++
      ShapeQueries4.oracles ++ SupplyMart.oracles ++
      graft.registry.Incremental.oracles ++
      QualityOps.oracles ++ CurationOps.oracles ++ IntervalJoin.oracles ++
      ChunkOps.oracles ++ Splits.oracles ++ UrlFilters.oracles ++
      GopherRepetition.oracles ++ C4Filters.oracles ++ TextNorm.oracles ++
      PerplexityBuckets.oracles ++ Bm25.oracles ++ TextRepair.oracles ++
      ClusterOps.oracles ++ DriftMonitor.oracles ++ SnapshotDiff.oracles ++
      RobustStats.oracles ++ SkewOps.oracles ++ RecordLinkage.oracles ++
      graft.sources.FileStatsIndex.oracles ++ PercentileOps.oracles ++
      Merge.oracles ++ CohortOps.oracles ++ TableProfile.oracles ++
      AsOfJoin.oracles ++ Privacy.oracles ++ BasketOps.oracles ++
      KeywordOps.oracles ++ CorrelationOps.oracles ++ Scd2.oracles ++
      RegressionOps.oracles ++ IntegrityOps.oracles ++ CorpusOverlap.oracles ++
      TimeSeriesOps.oracles ++ GraphOps.oracles ++ TargetEncode.oracles ++
      FunnelOps.oracles ++ ModelEval.oracles ++ CorpusReport.oracles
}
