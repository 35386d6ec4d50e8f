package graft.registry

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The table-format contract between [[FeatureStore]] and its value
  * store — ONE interface covering every physical operation the store
  * performs, so the format is swappable without touching store logic.
  *
  * This is the seam where Delta Lake (the BASELINE-stated table
  * format) slots in: each method maps 1:1 onto a Delta operation —
  * `append` → an ACID transactional append, `read` → a snapshot read,
  * `dropPartition` → `DELETE WHERE` + `VACUUM`, `optimize` →
  * `OPTIMIZE` (small-file compaction). The r11 dependency probe found
  * NO delta-spark artifact in the zero-egress mirror (recorded in
  * SURVEY §5), so the shipped implementations are parquet-native with
  * the same operation shapes; a `DeltaValueStore` implementing this
  * trait is the drop-in once the dependency exists, and would retire
  * the two documented parquet caveats for free (the S3A create-new
  * lock, and [[ParquetValueStore.optimize]]'s non-transactional swap
  * window).
  *
  * Contract notes shared by all implementations:
  *  - rows are the store's long format (entity_id, value, value_str,
  *    computed_at, feature_name, version), partitioned by
  *    (feature_name, version); each partition is written by EXACTLY ONE
  *    append ([[FeatureStore.computeVersion]] rejects duplicate
  *    versions), so `optimize` compacts within one write's files, never
  *    merges concurrent writers.
  *  - `read` returns a lazy frame whose plan prunes on the partition
  *    columns (PartitionFilters — the scale property the store's
  *    serving paths rely on).
  */
trait ValueStoreFormat {

  /** Append one (feature_name, version) partition's rows. */
  def append(rows: DataFrame): Unit

  /** The whole store as a lazy partition-pruned frame. */
  def read(): DataFrame

  /** Physically remove one partition's data (the purge path). */
  def dropPartition(feature: String, version: String): Unit

  /** Delta-`OPTIMIZE`-shaped small-file compaction of one partition
    * down to `targetFiles`; returns (filesBefore, filesAfter).
    * Implementations must preserve row content exactly (verified
    * before any destructive step) and may no-op when the partition is
    * already compact. */
  def optimize(feature: String, version: String,
      targetFiles: Int = 1): (Int, Int)
}

/** Plain partitioned-parquet value store — the default format.
  *
  * `optimize` rewrites a partition's files through a dot-prefixed temp
  * directory (invisible to parquet discovery), verifies the row count
  * on the files just written, then swaps delete+rename. The swap is
  * the one NON-TRANSACTIONAL window of this format (a reader planning
  * file listing in exactly that window can miss the partition) — run
  * it in maintenance windows; this is precisely what Delta's OPTIMIZE
  * does transactionally, and the caveat travels with the format, not
  * the store. */
final class ParquetValueStore(spark: SparkSession, path: String)
    extends ValueStoreFormat {

  private def hfs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partDir(feature: String, version: String) =
    new Path(s"$path/feature_name=$feature/version=$version")

  override def append(rows: DataFrame): Unit =
    rows.write.mode("append").partitionBy("feature_name", "version")
      .parquet(path)

  override def read(): DataFrame = spark.read.parquet(path)

  override def dropPartition(feature: String, version: String): Unit = {
    val dir = partDir(feature, version)
    if (hfs.exists(dir)) hfs.delete(dir, true)
  }

  private def dataFiles(dir: Path): Seq[Path] =
    hfs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))

  override def optimize(feature: String, version: String,
      targetFiles: Int = 1): (Int, Int) = {
    require(targetFiles >= 1, s"targetFiles $targetFiles must be >= 1")
    val dir = partDir(feature, version)
    require(hfs.exists(dir), s"no partition ($feature, $version) at $path")
    val before = dataFiles(dir)
    if (before.length <= targetFiles) return (before.length, before.length)
    val tmp = new Path(s"$path/.optimize-$feature-$version-tmp")
    if (hfs.exists(tmp)) hfs.delete(tmp, true) // crashed prior attempt
    val part = spark.read.parquet(dir.toString)
    val nBefore = part.count()
    part.repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val nAfter = spark.read.parquet(tmp.toString).count()
    require(nAfter == nBefore,
      s"compaction rewrote $nAfter rows where the partition holds " +
        s"$nBefore — aborting before the swap, original untouched")
    // the non-transactional window: delete + rename (see class doc)
    hfs.delete(dir, true)
    require(hfs.rename(tmp, dir),
      s"rename $tmp -> $dir failed after the delete — partition data is " +
        s"in $tmp; rename it back manually")
    (before.length, dataFiles(dir).length)
  }
}

/** Bucketed-parquet value store — the co-located-serving layout
  * (CLUSTERED BY entity_id). Appends ride `bucketBy.saveAsTable`
  * against a catalog table declared over the store path (re-declared
  * by any fresh session — the files are the truth, the catalog entry
  * only describes them).
  *
  * OPTIMIZED WRITE instead of post-hoc rewrite: `append` repartitions
  * on the bucket column first, so each task holds exactly one bucket
  * and the partition lands as ≤ `buckets` files (Spark's bucket file
  * naming is per (task, bucket); without the repartition an
  * aggregation's 32 output tasks could each write a sliver of every
  * bucket — 32×n files). Since every partition is written exactly
  * once, partitions are born compact: `optimize` verifies and reports
  * rather than rewriting (a rewrite would have to reproduce the exact
  * bucket-file layout to keep serving shuffle-free — all cost, no
  * files saved). This is the same design point as Delta's
  * optimized-write feature. */
final class BucketedParquetValueStore(spark: SparkSession, path: String,
    buckets: Int, table: String) extends ValueStoreFormat {

  private def hfs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Idempotent catalog declaration + partition recovery (see class
    * doc; public because the store declares it before first read AND
    * first write). */
  def ensureTable(): Unit =
    if (!spark.catalog.tableExists(table)) {
      val dir = new Path(path)
      if (!hfs.exists(dir)) hfs.mkdirs(dir)
      spark.sql(
        s"""CREATE TABLE $table
           |  (entity_id STRING, value DOUBLE, value_str STRING, computed_at TIMESTAMP,
           |   feature_name STRING, version STRING)
           |USING parquet
           |PARTITIONED BY (feature_name, version)
           |CLUSTERED BY (entity_id) SORTED BY (entity_id) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
    }

  override def append(rows: DataFrame): Unit = {
    ensureTable()
    rows.repartition(buckets, col("entity_id"))
      .write.mode("append").format("parquet")
      .option("path", path)
      .partitionBy("feature_name", "version")
      .bucketBy(buckets, "entity_id").sortBy("entity_id")
      .saveAsTable(table)
  }

  override def read(): DataFrame = { ensureTable(); spark.table(table) }

  override def dropPartition(feature: String, version: String): Unit = {
    val dir = new Path(s"$path/feature_name=$feature/version=$version")
    if (hfs.exists(dir)) hfs.delete(dir, true)
    if (spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION " +
        s"(feature_name='$feature', version='$version')")
  }

  override def optimize(feature: String, version: String,
      targetFiles: Int = 1): (Int, Int) = {
    val dir = new Path(s"$path/feature_name=$feature/version=$version")
    require(hfs.exists(dir), s"no partition ($feature, $version) at $path")
    val n = hfs.listStatus(dir).count { s =>
      val nm = s.getPath.getName
      nm.endsWith(".parquet") && !nm.startsWith("_") && !nm.startsWith(".")
    }
    // born compact by the optimized write (class doc); nothing to do
    (n, n)
  }
}
