package graft.registry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Catalog model for the feature store — the Spark-native re-expression of
  * the reference's SQLAlchemy tables (reference models.py:10-81).
  *
  * `raw_tables` → [[TableDef]] (schema kept as declarative metadata, data
  * stays in parquet); `features` → [[FeatureDef]] whose computation logic
  * is a `DataFrame => DataFrame` plan fragment (Catalyst-optimizable
  * Column expressions, never exec'd strings — reference compute.py:39
  * uses `exec`, which can't be distributed or optimized); versions/values
  * live in the parquet-backed [[ValueStore]].
  */
final case class TableDef(
    name: String,
    requiredColumns: Seq[String],
    columnTypes: Map[String, String] = Map.empty,
    description: Option[String] = None)

/** A feature definition: `compute` must yield (entity_id, value) rows.
  * `featureType` mirrors the reference's numeric/categorical/text tags.
  * `logic` carries the SQL text when the feature was defined as DATA
  * (via [[FeatureDef.sql]]) — the registry then exposes the computation
  * the way the reference does (models.py:25-42 stores
  * `computation_logic` as a column), and registration validates it
  * against the registered table's schema before accepting it. */
final case class FeatureDef(
    name: String,
    table: String,
    featureType: String,
    compute: DataFrame => DataFrame,
    description: Option[String] = None,
    logic: Option[String] = None)

object FeatureDef {
  /** The table placeholder in SQL-defined features — the Spark ML
    * SQLTransformer convention: write the statement against `__THIS__`
    * and the registered table is substituted at plan time. */
  val TablePlaceholder = "__THIS__"

  /** Computation logic as DATA — the reference's runtime-registered
    * `computation_logic` string (models.py:25-42, compute.py:10-59),
    * re-expressed safely: where the reference `exec`s Python against a
    * pandas frame (unoptimizable, undistributable), this hands the
    * string to Catalyst — `spark.sql` over a uniquely-named temp view,
    * so the resulting plan predicate-pushes, prunes and codegens like
    * any closure-defined feature, and a malformed or schema-invalid
    * statement is rejected AT REGISTRATION (defineFeature analyzes the
    * plan against the registered table — parse errors, missing
    * columns, wrong output shape all fail the Either before anything
    * is stored).
    *
    * `sqlText` must be a full SELECT over [[TablePlaceholder]]
    * yielding exactly (entity_id, value), e.g.
    * `SELECT o_custkey AS entity_id, sum(o_totalprice) AS value FROM
    * __THIS__ GROUP BY 1`. */
  def sql(name: String, table: String, featureType: String,
      sqlText: String, description: Option[String] = None): FeatureDef =
    FeatureDef(name, table, featureType, df => applySql(df, sqlText),
      description, Some(sqlText))

  /** Run a `__THIS__` statement against a frame: register the frame
    * under a collision-proof temp view name, analyze, drop the view.
    * Analysis resolves the view into the underlying plan eagerly, so
    * the returned frame survives the drop (the SQLTransformer dance). */
  private[graft] def applySql(df: DataFrame, sqlText: String): DataFrame = {
    val spark = df.sparkSession
    val view = "graft_sql_feature_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceTempView(view)
    try spark.sql(sqlText.replace(TablePlaceholder, view))
    finally spark.catalog.dropTempView(view)
  }
}

/** What [[FeatureStore.loadDefs]] restored from the durable definition
  * catalog. `unboundClosureFeatures` are the features whose computation
  * is CODE (a Scala closure) — the catalog round-trips their
  * declaration (name/table/type/description) but cannot round-trip the
  * closure itself; they serve their already-materialized versions but
  * refuse loudly at computeVersion until re-bound via
  * [[FeatureStore.bindFeature]]. */
final case class CatalogLoadReport(
    tables: Seq[String],
    sqlFeatures: Seq[String],
    unboundClosureFeatures: Seq[String])

final case class FeatureVersion(
    feature: String,
    version: String,
    status: String,
    computedAt: Long,
    metadata: Map[String, String] = Map.empty)

/** Schema validation (reference compute.py:92-123): required columns must
  * exist; declared 'numeric'/'string' classes must match the Spark type. */
object SchemaValidator {
  def validate(schema: StructType, table: TableDef): Either[List[String], Unit] = {
    val present = schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = table.requiredColumns.filterNot(present.contains)
      .map(c => s"Missing required column: $c")
    val badTypes = table.columnTypes.toList.sortBy(_._1).flatMap { case (c, want) =>
      present.get(c).flatMap { dt =>
        val ok = want match {
          case "numeric" => dt.isInstanceOf[NumericType]
          case "string"  => dt == StringType
          case "timestamp" => dt == TimestampType || dt == TimestampNTZType
          case "binary"  => dt == BinaryType
          case _         => true
        }
        if (ok) None else Some(s"Column $c expected $want type, got ${dt.simpleString}")
      }
    }
    val errs = missing.toList ++ badTypes
    if (errs.isEmpty) Right(()) else Left(errs)
  }
}
