package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** G28: file-level min/max data-skipping index — the Delta-Lake
  * transaction-log stats feature (per-file `minValues`/`maxValues`/
  * `nullCount`, the public protocol's data-skipping mechanism),
  * implemented parquet-native since the zero-egress mirror has no
  * delta-spark artifact (SURVEY §5 probe).
  *
  * Parquet already stores per-row-group min/max in the footer; the
  * reader skips row groups a pushed predicate excludes. But at 100 TB
  * that skipping happens AFTER the scan tasks are scheduled and every
  * footer is opened — 10⁵–10⁶ file opens per query on an object store
  * is the cost data skipping exists to avoid. This index hoists the
  * footer stats into one small table (one row per file × column) built
  * in a single distributed FOOTER-ONLY pass (no data pages read), so
  * query planning prunes the file list BEFORE Spark schedules a scan:
  * `readPruned` hands `spark.read.parquet` only the surviving files.
  * The stats table is the manifest Delta keeps in its log; `refresh`
  * is the incremental form (footer-scan only files the index has not
  * seen — the same O(delta) high-water-mark convention as G14/G17).
  *
  * Pruning is CONSERVATIVE (a superset of the matching files, never a
  * subset): a file is dropped only when the stats PROVE no row can
  * match — every conjunct's [min,max] interval is disjoint from the
  * bound, or the column is entirely null under a non-null-satisfiable
  * range bound (SQL comparison semantics: `x >= lo` is never true for
  * null x). Missing stats, unknown types, or a column absent from the
  * index fail OPEN (file kept). The caller still applies the real
  * predicate after the pruned read; FileStatsIndexSpec pins
  * pruned-read-then-filter ≡ full-read-then-filter on randomized
  * bounds.
  *
  * Tightness — how MUCH gets skipped — is a property of the layout,
  * not the index: on a shuffled layout every file spans the whole
  * value range and nothing prunes; on [[Layout.writeRangeSorted]] the
  * leading sort column prunes to the matching slice; on
  * [[Layout.writeZOrdered]] EVERY z-column's per-file range is narrow,
  * so multi-column and trailing-column predicates prune too (measured
  * in ZOrderSpec). Stats rows: one per (file, top-level column) for
  * INT32/INT64 (incl. date/timestamp physical int64) → `lmin`/`lmax`,
  * FLOAT/DOUBLE → `dmin`/`dmax`, UTF8 BINARY → `smin`/`smax`;
  * other physical types record null-count only and never prune.
  */
object FileStatsIndex {

  /** One conjunct of a pruning predicate: keep files whose [min,max]
    * for `column` can intersect [lo, hi] (either side optional; at
    * least one must be set or the bound is trivially satisfied). */
  sealed trait ColumnBound { def column: String }
  final case class LongBound(column: String, lo: Option[Long],
      hi: Option[Long]) extends ColumnBound
  final case class DoubleBound(column: String, lo: Option[Double],
      hi: Option[Double]) extends ColumnBound
  final case class StringBound(column: String, lo: Option[String],
      hi: Option[String]) extends ColumnBound

  /** Timestamp bound — parquet stores TIMESTAMP as INT64 micros, so a
    * time-range predicate is a [[LongBound]] in epoch microseconds;
    * this spares every caller the unit conversion (and the silent
    * nothing-prunes bug of passing epoch MILLIS). */
  def tsBound(column: String, lo: Option[java.time.Instant],
      hi: Option[java.time.Instant]): LongBound = {
    def micros(i: java.time.Instant): Long =
      math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    LongBound(column, lo.map(micros), hi.map(micros))
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("column", StringType, nullable = false),
    StructField("ptype", StringType, nullable = false),
    StructField("has_stats", BooleanType, nullable = false),
    StructField("lmin", LongType, nullable = true),
    StructField("lmax", LongType, nullable = true),
    StructField("dmin", DoubleType, nullable = true),
    StructField("dmax", DoubleType, nullable = true),
    StructField("smin", StringType, nullable = true),
    StructField("smax", StringType, nullable = true),
    // -1 when the writer did not record a null count.
    StructField("nulls", LongType, nullable = false)))

  /** Data files under `dir` (recursive), skipping hidden path
    * components (`_`/`.` prefixes — `_stats_index`, `_SUCCESS`,
    * in-flight temp files), exactly parquet discovery's rule. */
  def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(p: Path): Boolean = {
      var cur = p
      var ok = true
      while (cur != null && !cur.equals(root)) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) ok = false
        cur = cur.getParent
      }
      ok
    }
    if (!fs.exists(root)) Seq.empty
    else if (fs.getFileStatus(root).isFile) Seq(root.toString)
    else {
      val it = fs.listFiles(root, true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val p = st.getPath
        if (st.isFile && p.getName.endsWith(".parquet") && visible(p))
          out += p.toString
      }
      out.result().sorted
    }
  }

  /** Build the index for `cols` over every data file under `dir` in
    * one distributed footer-only pass. Executors open each footer with
    * a fresh Hadoop `Configuration` (default-FS resolution — local and
    * HDFS paths carry their scheme; object-store credentials ride
    * core-site the same way the scan tasks' do). The result is
    * file-count × cols rows — the manifest scale (KBs per 10⁵ files),
    * never data scale. */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "index at least one column")
    val files = listDataFiles(spark, dir)
    buildForFiles(spark, files, cols)
  }

  private def buildForFiles(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], statsSchema)
    val want = cols.toSet
    val par = math.min(files.size,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    val rows = spark.sparkContext.parallelize(files, par).flatMap { f =>
      val conf = new Configuration()
      val in = HadoopInputFile.fromPath(new Path(f), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val fileRows = blocks.map(_.getRowCount).sum
        // Aggregate across row groups: min of mins, max of maxes, sum
        // of null counts (unknown in ANY block → unknown overall).
        val byCol = blocks.flatMap(_.getColumns.asScala)
          .filter(c => c.getPath.size == 1 && want(c.getPath.toDotString))
          .groupBy(_.getPath.toDotString)
        byCol.map { case (name, chunks) =>
          val pt = chunks.head.getPrimitiveType
          val ptn = pt.getPrimitiveTypeName
          val isUtf8 = pt.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => true
            case _ => false
          }
          val stats = chunks.map(_.getStatistics).filter(_ != null)
          val nulls =
            if (stats.nonEmpty && stats.forall(_.isNumNullsSet))
              stats.map(_.getNumNulls).sum
            else -1L
          val withVals = stats.filter(_.hasNonNullValue)
          val has = withVals.nonEmpty
          var lmin: Any = null; var lmax: Any = null
          var dmin: Any = null; var dmax: Any = null
          var smin: Any = null; var smax: Any = null
          var ptag = "other"
          if (has) ptn match {
            case PrimitiveTypeName.INT32 =>
              ptag = "long"
              val ms = withVals.map(_.genericGetMin
                .asInstanceOf[java.lang.Integer].longValue)
              val xs = withVals.map(_.genericGetMax
                .asInstanceOf[java.lang.Integer].longValue)
              lmin = ms.min; lmax = xs.max
            case PrimitiveTypeName.INT64 =>
              ptag = "long"
              val ms = withVals.map(_.genericGetMin
                .asInstanceOf[java.lang.Long].longValue)
              val xs = withVals.map(_.genericGetMax
                .asInstanceOf[java.lang.Long].longValue)
              lmin = ms.min; lmax = xs.max
            case PrimitiveTypeName.FLOAT =>
              ptag = "double"
              val ms = withVals.map(_.genericGetMin
                .asInstanceOf[java.lang.Float].doubleValue)
              val xs = withVals.map(_.genericGetMax
                .asInstanceOf[java.lang.Float].doubleValue)
              dmin = ms.min; dmax = xs.max
            case PrimitiveTypeName.DOUBLE =>
              ptag = "double"
              val ms = withVals.map(_.genericGetMin
                .asInstanceOf[java.lang.Double].doubleValue)
              val xs = withVals.map(_.genericGetMax
                .asInstanceOf[java.lang.Double].doubleValue)
              dmin = ms.min; dmax = xs.max
            case PrimitiveTypeName.BINARY if isUtf8 =>
              ptag = "string"
              // Cross-row-group aggregation must use parquet's own
              // UNSIGNED LEXICOGRAPHIC binary comparator (the order the
              // footer stats were computed in, and the order Spark's
              // UTF8String comparisons use in rowKeep). Scala's default
              // String ordering is UTF-16 code-unit order, which
              // DIVERGES for supplementary-plane vs [U+E000,U+FFFF]
              // characters — aggregating with it can record an smin/smax
              // inside the true range and prune a matching file,
              // breaking the never-a-subset contract.
              import org.apache.parquet.io.api.Binary
              val cmp = withVals.head.comparator()
                .asInstanceOf[java.util.Comparator[Binary]]
              val byteOrd = Ordering.comparatorToOrdering(cmp)
              val ms = withVals.map(_.genericGetMin.asInstanceOf[Binary])
              val xs = withVals.map(_.genericGetMax.asInstanceOf[Binary])
              smin = ms.min(byteOrd).toStringUsingUTF8
              smax = xs.max(byteOrd).toStringUsingUTF8
            case _ => ptag = "other"
          }
          else ptn match {
            // Typed tag even without values so all-null files can
            // still be DROPPED under a range bound on the column.
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              ptag = "long"
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
              ptag = "double"
            case PrimitiveTypeName.BINARY if isUtf8 => ptag = "string"
            case _ => ptag = "other"
          }
          Row(f, fileRows, name, ptag,
            has, lmin, lmax, dmin, dmax, smin, smax, nulls)
        }.toSeq
      } finally reader.close()
    }
    spark.createDataFrame(rows, statsSchema)
  }

  /** Incremental refresh (the G14 O(delta) convention): footer-scan
    * only files absent from `prior`, drop rows for files that no
    * longer exist, keep everything else untouched. ≡ a fresh `build`
    * on the current directory contents (spec-pinned). */
  def refresh(spark: SparkSession, dir: String, cols: Seq[String],
      prior: DataFrame): DataFrame = {
    import spark.implicits._
    val current = listDataFiles(spark, dir)
    val known = prior.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val added = current.filterNot(known)
    // semi-join, not an isin literal list: a 10^5-file manifest would
    // otherwise inline 10^5 string literals into the plan
    val currentDf = current.toDF("file")
    val kept = prior.join(broadcast(currentDf), Seq("file"), "left_semi")
    kept.unionByName(buildForFiles(spark, added, cols))
  }

  private def ptrPath(dir: String) = new Path(s"$dir/_stats_index_ptr")
  private def genPath(dir: String, g: Long) =
    new Path(s"$dir/_stats_index_g$g")

  /** Persist the index beside the data it describes (underscore
    * prefixes keep every piece invisible to parquet discovery of `dir`
    * itself — the `_SUCCESS` convention).
    *
    * GENERATION + POINTER commit (the ModelStore/IvfIndex convention):
    * the parquet rows go to a fresh `_stats_index_g{N}` directory, then
    * a one-line `_stats_index_ptr` file naming that directory is
    * swapped in via FileContext rename-with-OVERWRITE — atomic on
    * HDFS/local, so there is NO instant where a reader sees a deleted
    * manifest (a directory cannot be atomically replaced while
    * non-empty, which is why the pointer exists). The previous
    * generation is RETAINED (keep-two): a lazy plan from [[loadIndex]]
    * that predates the commit still reads its pinned generation's
    * files; only generations older than the previous are deleted. A
    * crash before the pointer swap leaves an orphan `_g{N}` directory
    * that the next save supersedes and the next-next save garbage-
    * collects — never a window with no live manifest. */
  def saveIndex(stats: DataFrame, dir: String): Unit = {
    val spark = stats.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val hfs = root.getFileSystem(conf)
    val gens: Seq[Long] =
      if (!hfs.exists(root)) Seq.empty
      else hfs.listStatus(root).map(_.getPath.getName)
        .collect { case n if n.startsWith("_stats_index_g") =>
          n.stripPrefix("_stats_index_g") }
        .collect { case s if s.forall(_.isDigit) && s.nonEmpty => s.toLong }
        .toSeq.sorted
    val next = gens.lastOption.fold(0L)(_ + 1L)
    val gdir = genPath(dir, next)
    stats.write.mode("overwrite").parquet(gdir.toString)
    // atomic pointer swap, checksummed format (torn writes refuse on
    // read instead of resolving a prefix directory name)
    graft.operators.BatchedState.writePointer(spark, ptrPath(dir),
      gdir.getName)
    // keep-two retention: current + previous survive; older GC'd,
    // including any legacy single-dir `_stats_index`
    gens.dropRight(1).foreach(g => hfs.delete(genPath(dir, g), true))
    hfs.delete(new Path(s"$dir/_stats_index"), true)
  }

  /** Load the co-located manifest. LAZY, like any read — load fresh
    * per query (the pointer is re-read each call; a held plan keeps
    * its pinned generation, which keep-two retention protects for one
    * more save). A table with NO manifest returns an EMPTY stats frame
    * — [[readPruned]] treats every data file as manifest-unlisted and
    * keeps it, i.e. the documented full-scan fallback, instead of the
    * old PATH_NOT_FOUND throw. Reads the legacy single-dir
    * `_stats_index` layout when no pointer exists yet. */
  def loadIndex(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = new Path(dir).getFileSystem(conf)
    val ptr = ptrPath(dir)
    val legacy = new Path(s"$dir/_stats_index")
    val named = graft.operators.BatchedState.readPointer(spark, ptr)
    if (named.isDefined) {
      spark.read.schema(statsSchema).parquet(s"$dir/${named.get}")
    } else if (hfs.exists(legacy))
      spark.read.schema(statsSchema).parquet(legacy.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], statsSchema)
  }

  /** True when `dir` has a committed manifest (pointer or legacy). */
  def indexExists(spark: SparkSession, dir: String): Boolean = {
    val hfs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.exists(ptrPath(dir)) || hfs.exists(new Path(s"$dir/_stats_index"))
  }

  /** Per-stats-row keep verdict for one bound — `true` unless this row
    * PROVES its file cannot satisfy the bound. Rows for other columns
    * are `true` (a file's verdict is the AND over its rows, so absent
    * columns fail open). */
  private def rowKeep(b: ColumnBound): Column = {
    val other = col("column") =!= b.column
    // A range bound is never satisfied by null; a provably all-null
    // column (known null count == row count) excludes the file.
    val allNull = (col("nulls") >= 0L) && (col("nulls") === col("rows"))
    val (typed, overlap) = b match {
      case LongBound(_, lo, hi) =>
        (col("ptype") === "long",
          lo.map(v => col("lmax") >= v).getOrElse(lit(true)) &&
          hi.map(v => col("lmin") <= v).getOrElse(lit(true)))
      case DoubleBound(_, lo, hi) =>
        (col("ptype") === "double",
          lo.map(v => col("dmax") >= v).getOrElse(lit(true)) &&
          hi.map(v => col("dmin") <= v).getOrElse(lit(true)))
      case StringBound(_, lo, hi) =>
        (col("ptype") === "string",
          lo.map(v => col("smax") >= v).getOrElse(lit(true)) &&
          hi.map(v => col("smin") <= v).getOrElse(lit(true)))
    }
    val trivial = b match {
      case LongBound(_, lo, hi) => lo.isEmpty && hi.isEmpty
      case DoubleBound(_, lo, hi) => lo.isEmpty && hi.isEmpty
      case StringBound(_, lo, hi) => lo.isEmpty && hi.isEmpty
    }
    if (trivial) lit(true)
    else other || when(allNull, lit(false))
      .when(!col("has_stats") || !typed, lit(true))
      .otherwise(overlap)
  }

  /** Surviving files for a conjunction of bounds — one row per kept
    * file. Pure DataFrame ops over the manifest-sized stats frame. */
  def pruneFiles(stats: DataFrame, bounds: Seq[ColumnBound]): DataFrame = {
    require(bounds.nonEmpty, "at least one bound")
    require(bounds.map(_.column).distinct.size == bounds.size,
      "one bound per column (merge intervals before pruning)")
    val keeps = bounds.zipWithIndex.map { case (b, i) =>
      bool_and(rowKeep(b)).as(s"k$i") }
    stats.groupBy("file").agg(keeps.head, keeps.tail: _*)
      .filter(bounds.indices.map(i => col(s"k$i")).reduce(_ && _))
      .select("file")
  }

  /** Read only the files that can match `bounds` — the planning-time
    * skip. `basePath` keeps hive-style partition columns when `dir` is
    * a partitioned layout. The returned frame is the PRUNED SUPERSET;
    * apply the real predicate on top (pruning never substitutes for
    * the filter). Zero survivors → an empty frame with the full
    * directory's schema.
    *
    * Data files ABSENT from the manifest fail OPEN: they are read
    * unconditionally. A manifest lagging the table (concurrent append,
    * a crash before the stats refresh, or no manifest at all — the
    * empty [[loadIndex]] fallback) therefore under-PRUNES, never
    * under-READS: pruned-read-then-filter stays ≡
    * full-read-then-filter regardless of manifest freshness. The
    * per-file listing this costs is manifest-maintenance hygiene, not
    * data IO. */
  def readPruned(spark: SparkSession, dir: String, stats: DataFrame,
      bounds: Seq[ColumnBound]): DataFrame = {
    val listed = stats.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val unlisted = listDataFiles(spark, dir).filterNot(listed)
    val files = (pruneFiles(stats, bounds).collect().map(_.getString(0))
      ++ unlisted).distinct
    if (files.isEmpty) {
      val schema = spark.read.parquet(dir).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val root = new Path(dir)
      val isDir = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(root).isDirectory
      // basePath only applies to directory roots (it keeps hive-style
      // partition columns); a single-file "table" has none to keep.
      val reader = if (isDir) spark.read.option("basePath", dir)
                   else spark.read
      reader.parquet(files.toSeq: _*)
    }
  }

  /** Pruning-effectiveness report for a bound set — ONE row:
    * (files_total, files_kept, rows_total, rows_kept_bound), where
    * rows_kept_bound sums the kept files' row counts (an UPPER bound
    * on matching rows — skipping is file-granular). This is the
    * number that decides whether a layout is earning its sort: a
    * selective predicate with rows_kept_bound ≈ rows_total says the
    * files all span the predicate's range — re-layout
    * ([[Layout.writeRangeSorted]]/[[Layout.writeZOrdered]]) before
    * blaming the index. Manifest-sized arithmetic, no data touched. */
  def explainPrune(stats: DataFrame, bounds: Seq[ColumnBound]): DataFrame = {
    val perFile = stats.groupBy("file").agg(max("rows").as("rows"))
    val kept = pruneFiles(stats, bounds)
      .withColumn("_kept", lit(true))
    perFile.join(kept, Seq("file"), "left")
      .agg(count(lit(1)).as("files_total"),
        count(col("_kept")).as("files_kept"),
        sum("rows").as("rows_total"),
        coalesce(sum(when(col("_kept"), col("rows"))), lit(0L))
          .as("rows_kept_bound"))
  }

  /** The O(delta)-IO composition for the incremental operators
    * (G14/G17/G18 refresh on `idCol > hwm`): on an append-organized
    * layout (ids correlate with arrival, so old files' id ranges sit
    * entirely below the high-water mark) this reads ONLY the files
    * that can contain new rows — the refresh's compute is already
    * O(delta); this makes its IO O(delta) too. Returns the delta
    * frame with the real `idCol > hwm` filter applied (pruning is the
    * superset; the filter is the semantics). */
  def readSince(spark: SparkSession, dir: String, stats: DataFrame,
      idCol: String, hwm: Long): DataFrame =
    readPruned(spark, dir, stats, Seq(LongBound(idCol, Some(hwm + 1), None)))
      .filter(col(idCol) > hwm)

  /** Oracle-gated skip-scan: plan via the footer index (build is a
    * footer-only pass over the canonical table), prune on a selective
    * quantity bound, then apply the REAL predicate and aggregate. The
    * result is layout-independent — pruning only ever removes files
    * the predicate excludes — so DuckDB's plain filtered aggregate is
    * the exact oracle. Min/max/count/sum-of-integral-doubles only:
    * order-independent and bit-exact cross-engine. */
  def skipScan(spark: SparkSession, dir: String): DataFrame = {
    val stats = build(spark, s"$dir/lineitem.parquet", Seq("l_quantity"))
    val pruned = readPruned(spark, s"$dir/lineitem.parquet", stats,
      Seq(DoubleBound("l_quantity", Some(45.0), None)))
    pruned.filter(col("l_quantity") >= 45.0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("l_quantity").as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skip_scan" -> skipScan _)

  val oracles: Map[String, String] = Map(
    "skip_scan" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem WHERE l_quantity >= 45.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
