package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink adapters beyond parquet. The reference ingests raw data as
  * JSON request bodies (reference main.py:117 `data: List[Dict]`) — here
  * that surface is schema-pinned readers for JSON-lines and CSV plus
  * parquet round-trips, all with explicit schemas so scans never pay
  * inference and projection pushdown stays intact.
  */
object Sources {
  /** JSON-lines with a pinned schema (no sampling pass over 100 TB). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Header CSV with a pinned schema. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Partitioned parquet sink — the value-store layout. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** ORC with a pinned schema — the second columnar format Spark ships
    * a native vectorized reader for (predicate pushdown and column
    * pruning hold exactly as on parquet; the plan-shape spec asserts
    * PushedFilters on the ORC scan). Interop surface for warehouses
    * that standardized on ORC (classic Hive estates). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Partitioned ORC sink — the value-store layout on the ORC format. */
  def writeOrcPartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).orc(path)
}
