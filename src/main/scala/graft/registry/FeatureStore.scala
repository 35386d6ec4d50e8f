package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** The feature store façade: register raw tables, define features, compute
  * versioned materializations, and serve feature vectors — the Spark
  * re-expression of the reference FastAPI service (reference main.py).
  *
  * Storage layout (scale design): one long-format parquet dataset
  * `(entity_id, feature_name, version, value, computed_at)` written with
  * `partitionBy(feature_name, version)` so version pins prune to a single
  * directory and latest-version resolution scans only the needed feature
  * partitions. At cluster scale the store would additionally be bucketed
  * by `entity_id` to make the serving join shuffle-free; locally the
  * partition pruning is the part that matters and is visible in
  * `.explain` as PartitionFilters.
  */
final class FeatureStore(spark: SparkSession, storePath: String,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val tables = TrieMap.empty[String, (TableDef, DataFrame)]
  private val features = TrieMap.empty[String, FeatureDef]
  private val versions = TrieMap.empty[(String, String), FeatureVersion]

  /** reference main.py:38 POST /raw-tables */
  def registerTable(defn: TableDef, data: DataFrame): Either[List[String], TableDef] =
    SchemaValidator.validate(data.schema, defn).map { _ =>
      if (tables.putIfAbsent(defn.name, (defn, data)).isDefined)
        return Left(List(s"Raw table '${defn.name}' already exists"))
      defn
    }

  def listTables: Seq[TableDef] = tables.values.map(_._1).toSeq.sortBy(_.name)

  /** reference main.py:82 POST /features */
  def defineFeature(defn: FeatureDef): Either[List[String], FeatureDef] = {
    if (!tables.contains(defn.table)) Left(List(s"Raw table '${defn.table}' not found"))
    else if (features.putIfAbsent(defn.name, defn).isDefined)
      Left(List(s"Feature '${defn.name}' already exists"))
    else Right(defn)
  }

  def listFeatures: Seq[FeatureDef] = features.values.toSeq.sortBy(_.name)

  /** reference main.py:117 POST /features/{id}/versions — compute and
    * persist one version of one feature. The computation is a declarative
    * plan over the registered table; Spark plans partial aggregation +
    * a single shuffle on the entity key. */
  def computeVersion(feature: String, version: String,
      metadata: Map[String, String] = Map.empty): Either[List[String], FeatureVersion] = {
    val fd = features.getOrElse(feature,
      return Left(List(s"Feature '$feature' not found")))
    if (versions.contains((feature, version)))
      return Left(List(s"Version '$version' already exists for feature $feature"))
    val (_, raw) = tables(fd.table)
    val computed = fd.compute(raw)
    val cols = computed.columns
    if (!cols.contains("entity_id") || cols.length != 2)
      return Left(List("Computation must return (entity_id, value) columns"))
    val valueCol = cols.filter(_ != "entity_id").head
    val now = clock()
    computed
      .select(col("entity_id").cast("string"),
        col(valueCol).cast("double").as("value"),
        lit(feature).as("feature_name"), lit(version).as("version"),
        lit(new java.sql.Timestamp(now)).as("computed_at"))
      .write.mode("append").partitionBy("feature_name", "version")
      .parquet(storePath)
    val fv = FeatureVersion(feature, version, "active", now, metadata)
    versions.put((feature, version), fv)
    invalidateCache()
    Right(fv)
  }

  def listVersions(feature: String): Seq[FeatureVersion] =
    versions.collect { case ((f, _), v) if f == feature => v }.toSeq.sortBy(_.version)

  def deprecate(feature: String, version: String): Unit =
    versions.updateWith((feature, version))(_.map(_.copy(status = "deprecated")))

  private def store: DataFrame = spark.read.parquet(storePath)

  /** Latest ACTIVE version per (entity, feature) — reference main.py:269's
    * per-feature `ORDER BY computed_at DESC LIMIT 1`, done for all
    * entities in one window pass. */
  def latestValues(featureNames: Option[Seq[String]] = None): DataFrame = {
    val active = versions.values.filter(_.status == "active")
      .map(v => (v.feature, v.version)).toSeq
    val activeDf = spark.createDataFrame(active).toDF("feature_name", "version")
    val w = Window.partitionBy(col("entity_id"), col("feature_name"))
      .orderBy(col("computed_at").desc, col("version").desc)
    val filtered = featureNames.fold(store)(ns =>
      store.filter(col("feature_name").isin(ns: _*)))
    filtered
      .join(broadcast(activeDf), Seq("feature_name", "version"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Time-travel resolution: the latest active version AS OF `ts` —
    * reproducible training: re-running with the same timestamp serves
    * exactly the features a historical job saw, regardless of versions
    * computed since. */
  def latestValuesAsOf(ts: Long, featureNames: Option[Seq[String]] = None): DataFrame = {
    val active = versions.values
      .filter(v => v.status == "active" && v.computedAt <= ts)
      .map(v => (v.feature, v.version)).toSeq
    val activeDf = spark.createDataFrame(active).toDF("feature_name", "version")
    val w = Window.partitionBy(col("entity_id"), col("feature_name"))
      .orderBy(col("computed_at").desc, col("version").desc)
    val filtered = featureNames.fold(store)(ns =>
      store.filter(col("feature_name").isin(ns: _*)))
    filtered
      .join(broadcast(activeDf), Seq("feature_name", "version"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Backfill: recompute a feature version over a filtered slice of the
    * raw table (e.g. one day's partition) and append it — the batch
    * catch-up path complementing StreamingMaterializer. */
  def backfill(feature: String, version: String, slice: DataFrame => DataFrame,
      metadata: Map[String, String] = Map.empty): Either[List[String], FeatureVersion] = {
    val fd = features.getOrElse(feature,
      return Left(List(s"Feature '$feature' not found")))
    val orig = fd.compute
    val sliced = fd.copy(compute = df => orig(slice(df)))
    features.put(feature, sliced)
    try computeVersion(feature, version, metadata)
    finally features.put(feature, fd)
  }

  /** reference main.py:237 POST /feature-vectors: wide vector per entity.
    * Pinned version prunes straight to the store partition; latest goes
    * through the window resolution. */
  def featureVectors(featureNames: Option[Seq[String]] = None,
      version: Option[String] = None): DataFrame = {
    val base = version match {
      case Some(v) =>
        val pinned = store.filter(col("version") === v)
        featureNames.fold(pinned)(ns => pinned.filter(col("feature_name").isin(ns: _*)))
      case None => latestValues(featureNames)
    }
    base.groupBy(col("entity_id")).pivot(col("feature_name"))
      .agg(first(col("value")))
  }

  // ---- serving cache (reference cache.py: TTL-memoized vectors) ----
  private val cache = TrieMap.empty[(String, String, String), (Long, Map[String, Any])]
  @volatile private var cacheTtlMs: Long = 3600 * 1000L
  def setCacheTtl(ms: Long): Unit = cacheTtlMs = ms
  def invalidateCache(): Unit = cache.clear()
  var cacheHits = 0L
  var cacheMisses = 0L

  /** Single-entity vector with TTL memoization — the hot serving path. */
  def getVector(entityId: String, featureNames: Option[Seq[String]] = None,
      version: Option[String] = None): Map[String, Any] = {
    val key = (entityId, featureNames.map(_.sorted.mkString(",")).getOrElse(""),
      version.getOrElse(""))
    val now = clock()
    cache.get(key).filter(now - _._1 < cacheTtlMs) match {
      case Some((_, v)) => cacheHits += 1; v
      case None =>
        cacheMisses += 1
        val row = featureVectors(featureNames, version)
          .filter(col("entity_id") === entityId).collect().headOption
        val vec = row.map(r => r.schema.fieldNames.filter(_ != "entity_id")
          .map(f => f -> r.getAs[Any](f)).toMap).getOrElse(Map.empty)
        cache.put(key, (now, vec))
        vec
    }
  }
}
