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
  * `featureType` mirrors the reference's numeric/categorical/text tags. */
final case class FeatureDef(
    name: String,
    table: String,
    featureType: String,
    compute: DataFrame => DataFrame,
    description: Option[String] = None)

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
