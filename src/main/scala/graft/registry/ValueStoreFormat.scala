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
  * `OPTIMIZE` (small-file compaction), `merge` → `MERGE INTO` (the
  * upsert/CDC-apply verb). The r11 dependency probe found NO
  * delta-spark artifact in the zero-egress mirror (recorded in SURVEY
  * §5), so the shipped implementations are parquet-native with the
  * same operation shapes; a `DeltaValueStore` implementing this trait
  * is the drop-in once the dependency exists.
  *
  * Contract notes shared by all implementations:
  *  - rows are the store's long format (entity_id, value, value_str,
  *    computed_at, feature_name, version), partitioned by
  *    (feature_name, version); each partition is written by EXACTLY ONE
  *    append ([[FeatureStore.computeVersion]] rejects duplicate
  *    versions), so partition rewrites (`optimize`, `merge`) never
  *    merge concurrent writers.
  *  - `read` returns a lazy frame whose plan prunes on the partition
  *    columns (PartitionFilters — the scale property the store's
  *    serving paths rely on).
  *  - one (feature_name, version, entity_id) row per partition —
  *    `merge` is keyed on entity_id under that contract.
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

  /** Delta-`MERGE INTO`-shaped upsert: `updates` rows (the store's
    * long format, possibly spanning several (feature_name, version)
    * partitions) REPLACE existing rows with the same entity_id in
    * their partition and INSERT where the entity is new; untouched
    * rows survive. A partition named by `updates` that does not exist
    * yet is created (insert-only merge). The backfill-correction /
    * late-data verb — the one lakehouse operation an append-only
    * store cannot express. */
  def merge(updates: DataFrame): Unit
}

/** Plain partitioned-parquet value store — the default format, with
  * GENERATION-PINNED partition rewrites.
  *
  * Layout: a partition directory holds its initial append's files
  * (generation 0, plain `part-*` names) or a rewrite's files
  * (`g{N}-*` prefix), plus a one-line `_gen` pointer naming the
  * CURRENT generation (absent → 0). Every rewrite (`optimize`,
  * `merge`) writes the new generation's files ALONGSIDE the old ones,
  * verifies them, and commits by atomically swapping the pointer
  * (file-level atomic replace — BatchedState.atomicReplace, the repo's commit
  * convention), then garbage-collects every generation except the new
  * one and its predecessor. KEEP-TWO retention means a reader that
  * planned against the previous generation keeps reading files that
  * still exist for one full rewrite cycle — the D7/G17 contract,
  * closing the r11 delete+rename race where a reader planning inside
  * the swap window saw a missing partition. A crash before the
  * pointer swap leaves invisible orphan files that the next rewrite's
  * GC removes; there is NO window where the partition is absent or
  * doubled.
  *
  * `read()` resolves each partition's current generation at PLAN time
  * (a driver-side listing — the same file-listing cost parquet
  * discovery pays) and hands Spark the explicit file list with
  * `basePath`, so partition columns and PartitionFilters pruning
  * behave exactly as directory discovery. [[readAsOf]] pins an older
  * retained generation — the time-travel read. */
final class ParquetValueStore(spark: SparkSession, path: String)
    extends ValueStoreFormat {

  private def hconf = spark.sparkContext.hadoopConfiguration
  private def hfs = new Path(path).getFileSystem(hconf)

  private def partDir(feature: String, version: String) =
    new Path(s"$path/feature_name=$feature/version=$version")

  private val GenFile = "_gen"
  private val GenName = "^g(\\d+)-".r

  private def fileGen(name: String): Long =
    GenName.findFirstMatchIn(name).map(_.group(1).toLong).getOrElse(0L)

  /** Current generation of a partition (pointer file; absent → 0).
    * Checksummed pointer read — a torn `_gen` refuses loudly instead
    * of pinning a truncated generation; legacy bare longs parse. */
  def currentGeneration(feature: String, version: String): Long =
    graft.operators.BatchedState
      .readPointer(spark, new Path(partDir(feature, version), GenFile))
      .fold(0L)(_.toLong)

  private def dataFiles(dir: Path): Seq[Path] =
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))

  private def genFiles(dir: Path, gen: Long): Seq[Path] =
    dataFiles(dir).filter(p => fileGen(p.getName) == gen)

  override def append(rows: DataFrame): Unit =
    rows.write.mode("append").partitionBy("feature_name", "version")
      .parquet(path)

  /** All partitions' CURRENT-generation files (see class doc). No
    * partitions yet → fall through to plain discovery so the empty /
    * missing-path behavior matches `spark.read.parquet(path)`. */
  override def read(): DataFrame = {
    val files = listCurrentFiles()
    if (files.isEmpty) spark.read.parquet(path)
    else spark.read.option("basePath", path)
      .parquet(files.map(_.toString): _*)
  }

  private def partitionDirs(): Seq[Path] = {
    val root = new Path(path)
    if (!hfs.exists(root)) Seq.empty
    else for {
      f <- hfs.listStatus(root).toSeq
      if f.isDirectory && f.getPath.getName.startsWith("feature_name=")
      v <- hfs.listStatus(f.getPath).toSeq
      if v.isDirectory && v.getPath.getName.startsWith("version=")
    } yield v.getPath
  }

  private def listCurrentFiles(): Seq[Path] =
    partitionDirs().flatMap { d =>
      val gen = graft.operators.BatchedState
        .readPointer(spark, new Path(d, GenFile)).fold(0L)(_.toLong)
      genFiles(d, gen)
    }

  /** Time-travel read of ONE partition at a pinned generation (must
    * still be retained — keep-two holds the current and previous).
    * Partition columns ride along via basePath, as in [[read]]. */
  def readAsOf(feature: String, version: String, gen: Long): DataFrame = {
    val dir = partDir(feature, version)
    val files = genFiles(dir, gen)
    require(files.nonEmpty,
      s"generation $gen of ($feature, $version) has no files — retained " +
        s"generations hold only the current and previous (keep-two)")
    spark.read.option("basePath", path).parquet(files.map(_.toString): _*)
  }

  override def dropPartition(feature: String, version: String): Unit = {
    val dir = partDir(feature, version)
    if (hfs.exists(dir)) hfs.delete(dir, true)
  }

  /** The shared rewrite protocol (see class doc): compute the new
    * partition content from the current generation's rows, write it
    * beside the data, verify `expect` on the rewrite, commit with the
    * pointer swap, GC all but (new, previous). Returns the new
    * generation's file list. */
  private def rewrite(feature: String, version: String,
      make: DataFrame => DataFrame,
      expect: (DataFrame, DataFrame) => Unit): Seq[Path] = {
    val dir = partDir(feature, version)
    require(hfs.exists(dir), s"no partition ($feature, $version) at $path")
    val curGen = currentGeneration(feature, version)
    val curFiles = genFiles(dir, curGen)
    require(curFiles.nonEmpty,
      s"partition ($feature, $version) generation $curGen has no files")
    val cur = spark.read.parquet(curFiles.map(_.toString): _*)
    val tmp = new Path(s"$path/.rewrite-$feature-$version-tmp")
    if (hfs.exists(tmp)) hfs.delete(tmp, true) // crashed pre-commit attempt
    val out = make(cur)
    out.write.mode("overwrite").parquet(tmp.toString)
    val written = spark.read.parquet(tmp.toString)
    expect(cur, written) // verify BEFORE anything becomes visible
    // next generation: above every existing file's tag, so a crashed
    // attempt's orphans can never collide with the new commit
    val nextGen = (dataFiles(dir).map(p => fileGen(p.getName)) :+ curGen)
      .max + 1L
    hfs.listStatus(tmp).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        require(hfs.rename(s.getPath,
          new Path(dir, s"g$nextGen-${s.getPath.getName}")),
          s"rename ${s.getPath} into $dir failed — commit not reached, " +
            "current generation untouched")
      }
    hfs.delete(tmp, true)
    // COMMIT: atomic pointer swap, checksummed format
    graft.operators.BatchedState.writePointer(spark,
      new Path(dir, GenFile), nextGen.toString)
    // keep-two GC: everything but the new and the just-superseded gen
    dataFiles(dir)
      .filter { p =>
        val g = fileGen(p.getName); g != nextGen && g != curGen }
      .foreach(p => hfs.delete(p, false))
    genFiles(dir, nextGen)
  }

  override def optimize(feature: String, version: String,
      targetFiles: Int = 1): (Int, Int) = {
    require(targetFiles >= 1, s"targetFiles $targetFiles must be >= 1")
    val dir = partDir(feature, version)
    require(hfs.exists(dir), s"no partition ($feature, $version) at $path")
    val before = genFiles(dir, currentGeneration(feature, version))
    if (before.length <= targetFiles) return (before.length, before.length)
    val after = rewrite(feature, version,
      cur => cur.repartition(targetFiles),
      (cur, written) => {
        val (nb, na) = (cur.count(), written.count())
        require(na == nb,
          s"compaction rewrote $na rows where the partition holds $nb — " +
            "aborting before the commit, current generation untouched")
      })
    (before.length, after.length)
  }

  override def merge(updates: DataFrame): Unit = {
    val parts = updates.select("feature_name", "version").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    parts.foreach { case (f, v) =>
      // partition values live in directory names, not files
      val slice = updates
        .filter(col("feature_name") === f && col("version") === v)
        .drop("feature_name", "version")
      if (!hfs.exists(partDir(f, v))) {
        // insert-only merge into a partition that does not exist yet
        append(slice.withColumn("feature_name", lit(f))
          .withColumn("version", lit(v)))
      } else {
        // expected row count: |target| + |updates not matching| —
        // re-derived on the written files before the commit
        rewrite(f, v,
          cur => graft.operators.Merge.upsert(cur, slice, "entity_id"),
          (cur, written) => {
            val inserted = slice.join(cur.select("entity_id"),
              Seq("entity_id"), "left_anti").count()
            val want = cur.count() + inserted
            val got = written.count()
            require(got == want,
              s"merge of ($f, $v) wrote $got rows, expected $want — " +
                "aborting before the commit, current generation untouched")
          })
      }
    }
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
  * optimized-write feature.
  *
  * `merge` must preserve the bucket layout, so it re-APPENDS the
  * merged partition through the bucketed writer: stage the merged
  * rows to a dot-prefixed temp (the durable copy), VERIFY them, ARM a
  * `_publish_armed` sentinel inside the stage, drop the partition,
  * append from the stage, clear the stage (sentinel included). The
  * drop → append gap is this format's non-transactional window;
  * recovery is deterministic BY THE SENTINEL, not by guessing from
  * what is visible: an ARMED stage means the publish phase was
  * entered, so the visible partition is suspect — a crash inside the
  * bucketed append's job commit can leave a PARTIAL partition that
  * looks intact — and the stage (the verified complete copy) is
  * re-published idempotently. An UNARMED stage never reached the
  * destructive phase: beside an intact partition it is pre-drop
  * garbage and is discarded; beside a missing partition (a legacy /
  * external-drop state) it is the only copy of anything and is
  * replayed. Deciding "partial vs intact" from the partition itself
  * (the pre-sentinel rule) would silently keep a partial publish —
  * the Layout.optimizeZOrdered lesson from the r11 ADVICE, applied
  * here before it bit. */
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

  private def stageDir(feature: String, version: String) =
    new Path(s"$path/.merge-$feature-$version-stage")

  private def armedMarker(stage: Path) = new Path(stage, "_publish_armed")

  override def merge(updates: DataFrame): Unit = {
    ensureTable()
    val parts = updates.select("feature_name", "version").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    parts.foreach { case (f, v) =>
      val dir = new Path(s"$path/feature_name=$f/version=$v")
      val stage = stageDir(f, v)
      if (hfs.exists(stage)) {
        if (hfs.exists(armedMarker(stage))) {
          // the publish phase was ENTERED: the visible partition may be
          // a partial job commit that looks intact — the armed stage is
          // the verified complete copy; re-publish it idempotently
          dropPartition(f, v)
          appendStage(f, v)
        } else if (!hfs.exists(dir)) {
          // unarmed stage beside a missing partition (legacy /
          // externally-dropped state): it is the only copy of anything
          appendStage(f, v)
        } else hfs.delete(stage, true) // unarmed + intact: pre-drop garbage
      }
      val slice = updates
        .filter(col("feature_name") === f && col("version") === v)
        .drop("feature_name", "version")
      if (!hfs.exists(dir)) {
        append(slice.withColumn("feature_name", lit(f))
          .withColumn("version", lit(v)))
      } else {
        val cur = spark.table(table)
          .filter(col("feature_name") === f && col("version") === v)
          .drop("feature_name", "version")
        val merged = graft.operators.Merge.upsert(cur, slice, "entity_id")
        merged.write.mode("overwrite").parquet(stage.toString)
        val inserted = slice.join(cur.select("entity_id"),
          Seq("entity_id"), "left_anti").count()
        val want = cur.count() + inserted
        val got = spark.read.parquet(stage.toString).count()
        require(got == want,
          s"merge of ($f, $v) staged $got rows, expected $want — " +
            "aborting before the drop, partition untouched")
        // ARM the sentinel LAST before the destructive phase: from here
        // a crash anywhere re-publishes the stage on the next merge
        hfs.create(armedMarker(stage), true).close()
        // the non-transactional window (class doc): drop then publish
        dropPartition(f, v)
        appendStage(f, v)
      }
    }
  }

  /** Publish a verified stage: bucketed append, then clear it. */
  private def appendStage(f: String, v: String): Unit = {
    val stage = stageDir(f, v)
    append(spark.read.parquet(stage.toString)
      .withColumn("feature_name", lit(f)).withColumn("version", lit(v)))
    hfs.delete(stage, true)
  }
}
