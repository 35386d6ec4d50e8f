package graft.registry

import graft.operators.SupplyMart
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-artifact → feature-store bridge — the loop closure between
  * the incremental tier (G14's day-partitioned snapshot, G41's supply
  * mart) and the feature-store core (registry metadata, typed routing,
  * versioned materialization, point-in-time serving): the maintained
  * artifacts register as raw tables and their finalized projections
  * become ordinary versioned features, consumable by
  * [[graft.TrainingSet.assemble]] and the online publish like any
  * closure-defined feature.
  *
  * Two disciplines, enforced here rather than left to each caller:
  *
  *  - **features read the PARTIALS, finalize in the compute**: the
  *    registered table is the snapshot's mergeable integer-cent truth,
  *    and the ONE IEEE division happens at the end of the feature's
  *    aggregation — so the feature value is bit-identical to deriving
  *    it straight from the raw log (MartFeaturesSpec pins the
  *    hash-equality), instead of summing per-day doubles whose
  *    addition order no engine guarantees;
  *  - **point-in-time at the feature door**: the compute takes an
  *    explicit as-of bound on the snapshot's partition column, and the
  *    bound is recorded in the version's metadata — a training set
  *    assembled against version v sees exactly the history v declared,
  *    reproducibly, however often the artifact refreshes afterwards
  *    (the version row set is immutable once computed; refreshes feed
  *    FUTURE versions).
  *
  * At 100 TB both computes are one partition-pruned scan of the
  * snapshot (day/bucket partitioned, orders of magnitude smaller than
  * the fact log) plus one entity-keyed shuffle — never a raw-log scan.
  */
object MartFeatures {

  /** Register the G14 snapshot (partials at `snapshotPath`) as a raw
    * table and compute a per-user spend feature over days at/before
    * `asOfDay` (inclusive, `yyyy-MM-dd`). Returns the computed version.
    *
    * This is the DEFINE-plus-first-version entry point, deliberately:
    * the table registration's "already exists" outcome is ignored
    * (same path, same frame — idempotent), but a feature definition is
    * immutable and carries this call's `asOfDay` inside its compute
    * closure, so calling again with a DIFFERENT bound must refuse
    * rather than silently record the new bound in metadata while
    * computing with the old one. Later versions at other bounds ride
    * `fs.backfill(feature, version, df => df.filter(col("day") <=
    * bound))` — the slice is explicit per version (spec'd). */
  def registerSnapshotSpend(fs: FeatureStore, spark: SparkSession,
      snapshotPath: String, feature: String, version: String,
      asOfDay: String): Either[List[String], FeatureVersion] = {
    val table = s"snapshot_$feature"
    fs.registerTable(
      TableDef(table, Seq("user_id", "day", "value_cents"),
        description = Some(s"G14 incremental snapshot partials at $snapshotPath")),
      spark.read.parquet(snapshotPath)): Unit
    fs.defineFeature(FeatureDef(feature, table, "numeric",
      df => df.filter(col("day") <= asOfDay)
        .groupBy(col("user_id").cast("string").as("entity_id"))
        .agg((sum(col("value_cents")).cast("double") / 100.0).as("value")),
      description = Some(s"user spend over snapshot days <= $asOfDay")))
      match {
        case Left(errs) => return Left(errs.map(e =>
          if (!e.contains("already exists")) e
          else e + " — a defined artifact feature is immutable (its " +
            "as-of bound lives in the compute); add versions via " +
            "fs.backfill(feature, version, day-slice) instead"))
        case Right(_)   =>
      }
    fs.computeVersion(feature, version, metadata = Map(
      "source" -> "incremental_snapshot",
      "snapshot_path" -> snapshotPath,
      "as_of_day" -> asOfDay))
  }

  /** Register the supply mart as a raw table and compute a
    * per-supplier total-supplied-value feature. Same finalize-last
    * discipline: SUM the integer cents, divide once. */
  def registerMartSupplierValue(fs: FeatureStore, spark: SparkSession,
      martPath: String, feature: String, version: String)
      : Either[List[String], FeatureVersion] = {
    val table = s"mart_$feature"
    fs.registerTable(
      TableDef(table, Seq("l_partkey", "l_suppkey", "value_c"),
        description = Some(s"G41 supply mart at $martPath")),
      SupplyMart.read(spark, martPath)): Unit
    fs.defineFeature(FeatureDef(feature, table, "numeric",
      df => df.groupBy(col("l_suppkey").cast("string").as("entity_id"))
        .agg((sum(col("value_c")).cast("double") / 100.0).as("value")),
      description = Some("total supplied extendedprice per supplier")))
      match {
        case Left(errs) => return Left(errs.map(e =>
          if (!e.contains("already exists")) e
          else e + " — a defined artifact feature is immutable; add " +
            "versions via fs.backfill"))
        case Right(_)   =>
      }
    fs.computeVersion(feature, version, metadata = Map(
      "source" -> "supply_mart", "mart_path" -> martPath))
  }
}
