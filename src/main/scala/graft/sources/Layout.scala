package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** G16: data-skipping layout — range-sorted parquet writes.
  *
  * At 100 TB the cheapest filter is the one that never reads the data.
  * Parquet keeps per-row-group min/max statistics in the footer; a scan
  * whose pushed predicate excludes a row group's range skips it without
  * touching a page. That only pays off if the layout gives each row
  * group a NARROW range of the filter column — which is exactly what
  * `repartitionByRange` + `sortWithinPartitions` produces: globally
  * range-partitioned files, each covering a disjoint slice of the key.
  *
  * The same layout compounds with partition-level pruning
  * (`Sources.writePartitioned` for coarse categorical keys like day or
  * lang) — directory pruning first, then row-group skipping inside the
  * surviving partitions. LayoutSpec measures the effect: an identical
  * selective filter reads the full table on a shuffled layout and only
  * the matching slice on the range-sorted one.
  *
  * `maxRecordsPerFile` bounds file size so a 1000-executor cluster gets
  * even task splits; one row group per file keeps the skipping unit and
  * the scheduling unit aligned.
  */
object Layout {
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       sortCols: Seq[String],
                       maxRecordsPerFile: Long = 0L,
                       statsCols: Seq[String] = Seq.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val w = df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(path)
    writeStats(df, path, statsCols)
  }

  /** Layout-time manifest write (the Delta convention: stats are
    * recorded AT commit, not by a later crawl): non-empty `statsCols`
    * makes the write also build + save the [[FileStatsIndex]] for the
    * just-written files — one footer-only pass over data whose footers
    * the OS cache still holds. */
  private def writeStats(df: DataFrame, path: String,
      statsCols: Seq[String]): Unit =
    if (statsCols.nonEmpty) {
      val spark = df.sparkSession
      FileStatsIndex.saveIndex(
        FileStatsIndex.build(spark, path, statsCols), path)
    }

  /** Z-ORDER layout — multi-column data skipping (the Delta
    * `OPTIMIZE ZORDER BY` capability, parquet-native). A linear sort
    * gives the LEADING column narrow per-file ranges and leaves every
    * other column spanning the whole domain, so only leading-column
    * predicates skip. Interleaving the bits of each column's quantile
    * bucket (Morton order) and range-sorting on that interleaved value
    * makes every file a small HYPERCUBE of the z-columns' joint
    * domain: with F files, each column's per-file range shrinks to
    * roughly (1/F)^(1/|zCols|) of its domain — EVERY z-column prunes,
    * at the price of none pruning as tightly as a dedicated
    * single-column sort (ZOrderSpec measures both sides of that trade
    * with [[FileStatsIndex]]).
    *
    * Bucketing is QUANTILE-based (approxQuantile cuts, sample-sized
    * driver state: (2^bitsPerCol − 1) × |zCols| doubles) so skewed
    * columns still spread evenly over buckets — the same sampled
    * range-id scheme Delta's implementation uses. The z value is
    * computed by a scalar UDF: deliberate — this is a WRITE-SIDE
    * one-pass layout operation, not a query hot path (§4a preference
    * order; a codegen expression would save nothing measurable against
    * the shuffle+sort+write that dominates). Nulls bucket to 0 (they
    * carry no range information; [[FileStatsIndex]] tracks them via
    * null counts instead). STRING z-columns bucket by SAMPLED rank
    * cuts (approxQuantile has no string form; a seeded sample's
    * order statistics stand in — the classic range-partitioner move,
    * and exact quantiles would buy nothing: bucketing is a locality
    * heuristic, and pruning correctness lives entirely in the footer
    * stats, never in the cut choice).
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    zCols: Seq[String], bitsPerCol: Int = 8,
                    relErr: Double = 1e-3,
                    maxRecordsPerFile: Long = 0L,
                    statsCols: Seq[String] = Seq.empty): Unit = {
    import org.apache.spark.sql.functions.{array, coalesce, col, lit, udf}
    require(zCols.nonEmpty && zCols.size <= 4,
      s"1..4 z-columns (got ${zCols.size}); beyond 4 the per-column bit " +
        "budget stops buying locality — partition coarser keys instead")
    require(bitsPerCol >= 1 && bitsPerCol * zCols.size <= 62,
      s"bitsPerCol $bitsPerCol x ${zCols.size} cols must fit a long")
    val buckets = 1 << bitsPerCol
    val maxB = buckets - 1
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val isStr = zCols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    // DEDUPLICATED cuts, rescaled over the full bit range: a dominant
    // atom (90% of a column equal to one value) makes most quantile
    // cuts identical; counting raw cuts would park that atom at a HIGH
    // bucket index and compress the whole tail into the few indices
    // above it — the tail's bits then differ from the atom's only in
    // low positions and z-range file splits stop separating them
    // (measured: the skew scenario prunes 0/8 files without this).
    // Distinct cuts give every distinct quantile step one index;
    // scaling index i to i*(B-1)/d spreads those indices back across
    // the bit positions the interleave reads. Uniform columns are
    // unchanged (d = B-1 → identity scale). Shared by the numeric and
    // string paths — only the cut SOURCE differs.
    def scaledBucket(countLE: Int, nCuts: Int): Int =
      if (nCuts == 0) 0 else ((countLE.toLong * maxB) / nCuts).toInt
    val numericCols = zCols.filter(c => !isStr(zCols.indexOf(c)))
    val numericCuts: Map[String, Array[Double]] =
      if (numericCols.isEmpty) Map.empty
      else numericCols.zip(
        df.select(numericCols.map(c => col(c).cast("double").as(c)): _*)
          .na.drop().stat
          .approxQuantile(numericCols.toArray, probs, relErr)
          .map(_.distinct.sorted)).toMap
    // string cuts: order statistics of a seeded sample (bounded driver
    // state: <= 64*buckets strings per column)
    lazy val nRows = df.count()
    val stringCuts: Map[String, Array[String]] = zCols.zip(isStr)
      .collect { case (c, true) =>
        val target = math.max(10000, 64 * buckets)
        val fraction = math.min(1.0,
          target.toDouble / math.max(1L, nRows).toDouble)
        val sampled = df.select(col(c)).na.drop()
          .sample(withReplacement = false, fraction, seed = 42L)
          .collect().map(_.getString(0)).sorted
        val cuts =
          if (sampled.length < 2) Array.empty[String]
          else (1 until buckets).map(i =>
            sampled(math.min(sampled.length - 1,
              i * sampled.length / buckets))).distinct.sorted.toArray
        c -> cuts
      }.toMap
    // per-column bucket COLUMNS (typed UDF each), then one interleave
    def bucketNum(cuts: Array[Double]) = udf { v: Double =>
      var lo = 0; var hi = cuts.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cuts(mid) <= v) lo = mid + 1 else hi = mid
      }
      scaledBucket(lo, cuts.length)
    }
    def bucketStr(cuts: Array[String]) = udf { v: String =>
      if (v == null) 0
      else {
        var lo = 0; var hi = cuts.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cuts(mid) <= v) lo = mid + 1 else hi = mid
        }
        scaledBucket(lo, cuts.length)
      }
    }
    val bucketCols = zCols.zip(isStr).map {
      case (c, true) => bucketStr(stringCuts(c))(col(c))
      case (c, false) =>
        // nulls -> -Inf -> bucket 0 (below every cut)
        bucketNum(numericCuts(c))(
          coalesce(col(c).cast("double"), lit(Double.NegativeInfinity)))
    }
    val nBits = bitsPerCol
    val zUdf = udf { (bs: Seq[Int]) =>
      var z = 0L
      var bit = nBits - 1
      while (bit >= 0) {
        var c = 0
        while (c < bs.length) {
          z = (z << 1) | ((bs(c) >> bit) & 1)
          c += 1
        }
        bit -= 1
      }
      z
    }
    val zin = array(bucketCols: _*)
    val w = df.withColumn("__graft_z", zUdf(zin))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(path)
    writeStats(df, path, statsCols)
  }

  /** In-place `OPTIMIZE ZORDER BY` — rewrite a live table directory
    * into the z-ordered layout under the repo's temp-verify-swap
    * protocol (ParquetValueStore.optimize's convention, adapted to a
    * table ROOT that cannot itself be renamed because the co-located
    * `_stats_index` manifest lives beside the data):
    *
    *   1. write the z-ordered copy to `dir/.optimize_tmp` (dot-prefix:
    *      invisible to parquet discovery, so readers never see it);
    *   2. VERIFY the rewrite's row count against the original — abort
    *      before anything destructive on mismatch, original untouched;
    *   3. delete the original data files, move the new files in
    *      (UUID part names cannot collide), refresh the manifest.
    *
    * Step 3 is the documented NON-TRANSACTIONAL window (the same gap
    * the value-store format concedes; Delta's log is what closes it):
    * a reader planning between delete and move sees a partial table.
    * Crash recovery is DETERMINISTIC, not guessed: immediately before
    * the destructive phase a `_optimize_swap` SENTINEL is written
    * recording the verified row count and the exact original file
    * names. On entry, a present sentinel means a prior attempt crashed
    * INSIDE the swap — the tmp dir plus the already-renamed-in files
    * together still hold the complete new copy, so recovery replays
    * the swap idempotently: delete any surviving ORIGINAL (named in
    * the sentinel), move everything left in tmp in, verify the visible
    * row count equals the sentinel's, and only then clear the
    * sentinel. A row-count mismatch REFUSES with the sentinel kept
    * (manual recovery, nothing further deleted). Without a sentinel, a
    * leftover tmp is pre-swap garbage (crash before anything was
    * deleted) and is safely replaced. This closes the r11 hazard where
    * a crash after ONE delete left `before.nonEmpty` true and a retry
    * deleted the tmp — the only complete copy. Run it in a quiet
    * window, like any log-less OPTIMIZE. Returns
    * (filesBefore, filesAfter). */
  def optimizeZOrdered(spark: org.apache.spark.sql.SparkSession,
      dir: String, numFiles: Int, zCols: Seq[String],
      bitsPerCol: Int = 8, relErr: Double = 1e-3,
      maxRecordsPerFile: Long = 0L,
      statsCols: Seq[String] = Seq.empty): (Int, Int) =
    rewriteInPlace(spark, dir, statsCols, (df, tmpDir) =>
      writeZOrdered(df, tmpDir, numFiles, zCols, bitsPerCol, relErr,
        maxRecordsPerFile))

  /** In-place `OPTIMIZE` — plain small-file compaction (Delta OPTIMIZE
    * without ZORDER): bin-pack a live table directory's files to
    * ~`targetFileBytes` each, under the SAME sentinel-guarded
    * temp-verify-swap protocol as [[optimizeZOrdered]] (one shared
    * implementation; the only difference is the rewrite itself).
    * Row ORDER within files is not preserved (repartition is a
    * shuffle) — use [[optimizeZOrdered]] or a re-sort when the layout
    * carries skipping value. No-op (returns (n, n)) when the file
    * count is already at or below the packed target — an OPTIMIZE
    * that always rewrites turns maintenance into churn. Sizing is by
    * CURRENT on-disk bytes, so compression ratios carry over
    * approximately; the target is a packing hint, not a guarantee. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      statsCols: Seq[String] = Seq.empty): (Int, Int) = {
    require(targetFileBytes >= 1024 * 1024,
      s"targetFileBytes $targetFileBytes below 1 MiB is file churn")
    import org.apache.hadoop.fs.Path
    val hfs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = FileStatsIndex.listDataFiles(spark, dir)
    val totalBytes = files
      .map(f => hfs.getFileStatus(new Path(f)).getLen).sum
    val target = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (files.size <= target) return (files.size, files.size)
    rewriteInPlace(spark, dir, statsCols,
      (df, tmpDir) => df.repartition(target)
        .write.mode("overwrite").parquet(tmpDir))
  }

  /** The shared in-place rewrite protocol (scaladoc at
    * [[optimizeZOrdered]]): sentinel-guarded recovery, verify before
    * anything destructive, swap, manifest rebuild. `writeTmp` writes
    * the rewritten table to the given tmp path. */
  private def rewriteInPlace(spark: org.apache.spark.sql.SparkSession,
      dir: String, statsCols: Seq[String],
      writeTmp: (DataFrame, String) => Unit): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    import java.nio.charset.StandardCharsets.UTF_8
    val root = new Path(dir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/.optimize_tmp")
    val sentinel = new Path(s"$dir/_optimize_swap")

    def renameTmpFilesIn(): Unit =
      hfs.listStatus(tmp).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet"))
        .foreach { s =>
          require(hfs.rename(s.getPath, new Path(root, s.getPath.getName)),
            s"rename ${s.getPath} into $dir failed mid-swap — the swap " +
              s"sentinel $sentinel is still in place; retrying resumes it")
        }

    if (hfs.exists(sentinel)) {
      // a prior attempt crashed inside the swap — replay it
      val in = hfs.open(sentinel)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      val expected = lines.head.toLong
      val originals = lines.tail.toSet
      FileStatsIndex.listDataFiles(spark, dir)
        .filter(f => originals(new Path(f).getName))
        .foreach(f => hfs.delete(new Path(f), false))
      if (hfs.exists(tmp)) renameTmpFilesIn()
      val recovered = spark.read.parquet(dir).count()
      require(recovered == expected,
        s"optimize swap recovery found $recovered rows where the " +
          s"sentinel records $expected — sentinel kept at $sentinel, " +
          "nothing further touched; recover manually before retrying")
      hfs.delete(tmp, true)
      hfs.delete(sentinel, false)
    } else if (hfs.exists(tmp)) {
      // No sentinel: under this protocol the destructive phase never
      // started, so tmp is pre-swap garbage. EXCEPT the legacy
      // (pre-sentinel) crash signature — tmp beside an EMPTY table —
      // which refuses rather than delete the only complete copy.
      require(FileStatsIndex.listDataFiles(spark, dir).nonEmpty,
        s"$dir has a leftover .optimize_tmp and NO visible data files — " +
          "a prior (pre-sentinel) optimize crashed between delete and " +
          s"move; move $tmp/*.parquet into $dir and delete $tmp before " +
          "retrying")
      hfs.delete(tmp, true)
    }

    val before = FileStatsIndex.listDataFiles(spark, dir)
    require(before.nonEmpty, s"nothing to optimize at $dir")
    // a manifest describing the files about to be deleted must be
    // rebuilt even when the caller passes no statsCols — its indexed
    // column set carries over
    val colsToIndex =
      if (statsCols.nonEmpty) statsCols
      else if (FileStatsIndex.indexExists(spark, dir))
        FileStatsIndex.loadIndex(spark, dir).select("column").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
      else Seq.empty
    val df = spark.read.parquet(dir)
    val nBefore = df.count()
    writeTmp(df, tmp.toString)
    val nAfter = spark.read.parquet(tmp.toString).count()
    require(nAfter == nBefore,
      s"optimize rewrote $nAfter rows where the table holds $nBefore — " +
        "aborting before the swap, original untouched")
    // arm the sentinel, THEN enter the non-transactional window
    val out = hfs.create(sentinel, true)
    try out.write((nBefore.toString +: before.map(new Path(_).getName))
      .mkString("", "\n", "\n").getBytes(UTF_8))
    finally out.close()
    before.foreach(f => hfs.delete(new Path(f), false))
    renameTmpFilesIn()
    hfs.delete(tmp, true)
    hfs.delete(sentinel, false)
    if (colsToIndex.nonEmpty)
      FileStatsIndex.saveIndex(
        FileStatsIndex.build(spark, dir, colsToIndex), dir)
    (before.size, FileStatsIndex.listDataFiles(spark, dir).size)
  }

  /** Rows the parquet reader actually produced for `df`'s scan(s) during
    * the last action — row groups pruned by footer stats never count.
    * Diagnostic for layout tuning (used by LayoutSpec). */
  def scanOutputRows(df: Dataset[Row]): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }
}
