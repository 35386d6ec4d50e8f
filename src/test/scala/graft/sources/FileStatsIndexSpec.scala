package graft.sources

import graft.SparkSpec
import graft.sources.FileStatsIndex._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FileStatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fsi").toString

  /** 4 range-disjoint files on id, plus typed columns: v double, s
    * string (zero-padded so lexical order == numeric order), alln a
    * column that is entirely null. */
  private lazy val dir: String = {
    val d = tmp()
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id").cast("double") / 10.0)
      .withColumn("s", format_string("s%06d", col("id")))
      .withColumn("alln", lit(null).cast("double"))
    Layout.writeRangeSorted(df, d, numFiles = 4, sortCols = Seq("id"))
    d
  }
  private lazy val stats: DataFrame =
    build(spark, dir, Seq("id", "v", "s", "alln"))

  private def fullRead = spark.read.parquet(dir)

  test("index shape: one row per visible file x indexed column") {
    val files = listDataFiles(spark, dir)
    assert(files.size == 4, s"expected 4 data files, got $files")
    assert(stats.count() == files.size * 4L)
    // footer row counts sum to the table row count
    val rows = stats.filter($"column" === "id")
      .agg(sum("rows")).as[Long].head()
    assert(rows == 4000L)
    // _SUCCESS / _stats_index style names never appear
    assert(!files.exists(f => new java.io.File(f).getName.startsWith("_")))
  }

  test("long-bound pruning keeps exactly the overlapping range files") {
    // ids 0..3999 over 4 range-disjoint files => [1000,1999] is 1 file
    // (2 if a boundary file straddles the cut)
    val kept = pruneFiles(stats,
      Seq(LongBound("id", Some(1200), Some(1800)))).collect()
    assert(kept.length >= 1 && kept.length <= 2,
      s"range-sorted layout should prune to the slice, kept ${kept.length}")
    val prunedRead = readPruned(spark, dir, stats,
      Seq(LongBound("id", Some(1200), Some(1800))))
    // the SCAN itself lists only the surviving files — the skip is in
    // the plan, not just the row counts
    assert(prunedRead.inputFiles.map(f => f.split('/').last).sorted.toSeq ==
      kept.map(_.getString(0).split('/').last).sorted.toSeq)
    val pruned = prunedRead.filter($"id".between(1200, 1800))
    val full = fullRead.filter($"id".between(1200, 1800))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      full.select("id").as[Long].collect().sorted.toSeq)
  }

  test("string bounds prune on UTF8 footer stats") {
    val b = Seq(StringBound("s", Some("s001200"), Some("s001800")))
    val kept = pruneFiles(stats, b).collect()
    assert(kept.length <= 2, s"kept ${kept.length}")
    val pruned = readPruned(spark, dir, stats, b)
      .filter($"s" >= "s001200" && $"s" <= "s001800")
    assert(pruned.count() == 601)
  }

  test("provably all-null column drops every file under a range bound") {
    val b = Seq(DoubleBound("alln", Some(0.0), None))
    assert(pruneFiles(stats, b).count() == 0)
    val pruned = readPruned(spark, dir, stats, b)
    // zero survivors -> empty frame with the FULL directory schema
    assert(pruned.schema == fullRead.schema)
    assert(pruned.count() == 0)
    // and that equals the real filter's result (null >= 0.0 is never true)
    assert(fullRead.filter($"alln" >= 0.0).count() == 0)
  }

  test("bounds on unindexed columns and type mismatches fail open") {
    // no stats rows for "nope" -> every file kept
    assert(pruneFiles(stats,
      Seq(LongBound("nope", Some(0), Some(1)))).count() == 4)
    // long bound against the double column's stats rows -> kept
    assert(pruneFiles(stats,
      Seq(LongBound("v", Some(999999), None))).count() == 4)
  }

  test("conjunction prunes with each bound independently") {
    val b = Seq(
      LongBound("id", Some(100), Some(300)),
      DoubleBound("v", Some(350.0), None)) // v=id/10 -> disjoint conjuncts
    // each conjunct alone keeps >=1 file; together the id-slice file
    // fails the v bound and everything else fails the id bound
    assert(pruneFiles(stats, b).count() == 0)
    assert(fullRead.filter($"id".between(100, 300) && $"v" >= 350.0)
      .count() == 0)
  }

  test("randomized bounds: pruned-read-then-filter == full-read-then-filter", graft.Slow) {
    val rnd = new scala.util.Random(11)
    (1 to 25).foreach { _ =>
      val a = rnd.nextInt(5000) - 500
      val w = rnd.nextInt(1500)
      val bounds = Seq(LongBound("id", Some(a.toLong), Some((a + w).toLong)))
      val p = readPruned(spark, dir, stats, bounds)
        .filter($"id".between(a, a + w))
        .select("id").as[Long].collect().sorted.toSeq
      val f = fullRead.filter($"id".between(a, a + w))
        .select("id").as[Long].collect().sorted.toSeq
      assert(p == f, s"mismatch for [$a, ${a + w}]")
    }
  }

  test("save/load round-trips under the data directory invisibly") {
    saveIndex(stats, dir)
    val back = loadIndex(spark, dir)
    assert(back.orderBy("file", "column").collect().toSeq ==
      stats.orderBy("file", "column").collect().toSeq)
    // the manifest does not pollute discovery of the data dir
    assert(fullRead.count() == 4000)
    assert(listDataFiles(spark, dir).size == 4)
  }

  test("refresh footer-scans only new files and matches a fresh build") {
    val d = tmp()
    val df1 = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id").cast("double"))
    Layout.writeRangeSorted(df1, d, numFiles = 2, sortCols = Seq("id"))
    val prior = build(spark, d, Seq("id", "v"))
    // append a new range-disjoint file (separate write, append mode)
    spark.range(1000, 1500).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .coalesce(1).write.mode("append").parquet(d)
    val refreshed = refresh(spark, d, Seq("id", "v"), prior)
    val fresh = build(spark, d, Seq("id", "v"))
    assert(refreshed.orderBy("file", "column").collect().toSeq ==
      fresh.orderBy("file", "column").collect().toSeq)
    // prior rows were KEPT (same file set minus nothing), not rebuilt:
    // the refreshed frame contains prior's rows verbatim
    val priorRows = prior.collect().toSet
    assert(priorRows.subsetOf(refreshed.collect().toSet))
    // and pruning over the refreshed index sees the new range
    val kept = pruneFiles(refreshed,
      Seq(LongBound("id", Some(1200), None))).collect()
    assert(kept.length == 1)
  }

  test("readSince touches only files past the high-water mark (O(delta) IO)") {
    val d = tmp()
    Layout.writeRangeSorted(
      spark.range(0, 2000).toDF("doc_id"), d, numFiles = 4,
      sortCols = Seq("doc_id"))
    val prior = build(spark, d, Seq("doc_id"))
    spark.range(2000, 2600).toDF("doc_id")
      .coalesce(1).write.mode("append").parquet(d)
    val stats = refresh(spark, d, Seq("doc_id"), prior)
    val delta = readSince(spark, d, stats, "doc_id", hwm = 1999L)
    // the scan lists ONLY the appended file — the refresh's IO is the
    // delta, not a rescan-and-filter of the whole corpus
    assert(delta.inputFiles.length == 1,
      s"expected 1 delta file, scanned ${delta.inputFiles.toSeq}")
    assert(delta.select("doc_id").as[Long].collect().sorted.toSeq ==
      (2000L until 2600L).toSeq)
  }

  test("readSince feeds the G17 incremental refresh: O(delta) compute " +
    "AND O(delta) IO, same state as a full-frame twin", graft.Slow) {
    import graft.operators.IncrementalDedup
    import graft.registry.Incremental
    def mkDocs(lo: Long, hi: Long) = spark.range(lo, hi).toDF("doc_id")
      .withColumn("text", when(col("doc_id") % 10 === 0,
        lit("the shared duplicate body of common text here"))
        .otherwise(concat(lit("unique body number "),
          col("doc_id").cast("string"), lit(" with filler words enough"))))
    val corpus = tmp()
    Layout.writeRangeSorted(mkDocs(0, 400), corpus, numFiles = 2,
      sortCols = Seq("doc_id"), statsCols = Seq("doc_id"))
    val stateDelta = tmp() + "/state"
    val stateFull = tmp() + "/state"
    // initial load: both twins see the whole corpus
    val first = spark.read.parquet(corpus)
    assert(IncrementalDedup.refresh(spark, first, stateDelta).fresh == 400L)
    assert(IncrementalDedup.refresh(spark, first, stateFull).fresh == 400L)
    // append; refresh the manifest; delta twin reads via the index
    mkDocs(400, 500).coalesce(1).write.mode("append").parquet(corpus)
    val stats = refresh(spark, corpus, Seq("doc_id"),
      loadIndex(spark, corpus))
    val wm = Incremental.watermark(spark, stateDelta)
    assert(wm == 399L)
    val delta = readSince(spark, corpus, stats, "doc_id", wm)
    assert(delta.inputFiles.length == 1,
      s"delta read must touch only the appended file: ${delta.inputFiles.toSeq}")
    assert(IncrementalDedup.refresh(spark, delta, stateDelta).fresh == 100L)
    // full twin re-reads the whole directory (the IO the index saves)
    assert(IncrementalDedup.refresh(spark,
      spark.read.parquet(corpus), stateFull).fresh == 100L)
    val a = IncrementalDedup.assignments(spark, stateDelta)
      .orderBy("doc_id").collect().toSeq
    val b = IncrementalDedup.assignments(spark, stateFull)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "delta-fed and full-fed states must agree")
  }

  test("layout-time statsCols write a loadable, pruning manifest") {
    val d = tmp()
    Layout.writeRangeSorted(
      spark.range(0, 4000).toDF("id")
        .withColumn("v", col("id").cast("double")),
      d, numFiles = 4, sortCols = Seq("id"), statsCols = Seq("id", "v"))
    val idx = loadIndex(spark, d)
    assert(idx.count() == 8) // 4 files x 2 cols
    assert(pruneFiles(idx,
      Seq(LongBound("id", Some(100), Some(200)))).count() <= 2)
    // and the manifest matches a fresh crawl exactly
    assert(idx.orderBy("file", "column").collect().toSeq ==
      build(spark, d, Seq("id", "v")).orderBy("file", "column")
        .collect().toSeq)
  }

  test("hive-partitioned layouts keep their partition columns through " +
    "a pruned read (basePath)") {
    val d = tmp()
    spark.range(0, 3000).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 3 === 0, "en")
        .when(col("doc_id") % 3 === 1, "de").otherwise("fr"))
      .withColumn("v", col("doc_id").cast("double"))
      .repartitionByRange(2, col("doc_id"))
      .write.mode("overwrite").partitionBy("lang").parquet(d)
    val stats = build(spark, d, Seq("doc_id"))
    assert(stats.select("file").distinct().count() == 6) // 3 langs x 2
    val pruned = readPruned(spark, d, stats,
      Seq(LongBound("doc_id", Some(0), Some(100))))
    // partition column survives the explicit-file-list read
    assert(pruned.columns.contains("lang"))
    val got = pruned.filter($"doc_id" <= 100)
      .groupBy("lang").count().orderBy("lang")
      .as[(String, Long)].collect().toSeq
    val want = spark.read.parquet(d).filter($"doc_id" <= 100)
      .groupBy("lang").count().orderBy("lang")
      .as[(String, Long)].collect().toSeq
    assert(got == want && got.map(_._2).sum == 101)
    // directory-level partition pruning composes: a lang-filtered
    // pruned read lists only that partition's surviving files
    val enOnly = readPruned(spark, d, stats,
      Seq(LongBound("doc_id", Some(0), Some(100))))
      .filter($"lang" === "en")
    enOnly.collect()
    assert(enOnly.inputFiles.forall(_.contains("lang=en")) ||
      Layout.scanOutputRows(enOnly) <= 1500,
      "lang filter should prune partitions or at least row groups")
  }

  test("multi-row-group files aggregate min/max/nulls across blocks") {
    val d = tmp()
    spark.range(0, 200000).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024) // force many row groups
      .parquet(d)
    val files = listDataFiles(spark, d)
    assert(files.size == 1)
    // confirm the file really has multiple row groups
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head),
        new org.apache.hadoop.conf.Configuration()))
    val nBlocks = try reader.getFooter.getBlocks.size finally reader.close()
    assert(nBlocks > 1, s"expected multiple row groups, got $nBlocks")
    val st = build(spark, d, Seq("id", "v"))
    val r = st.filter($"column" === "id").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("rows") == 200000L)
    assert(r.head.getAs[Long]("lmin") == 0L)
    assert(r.head.getAs[Long]("lmax") == 199999L)
    assert(r.head.getAs[Long]("nulls") == 0L)
  }

  test("explainPrune reports files/rows kept vs total") {
    val r = explainPrune(stats,
      Seq(LongBound("id", Some(1200), Some(1800))))
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 == 4 && r._2 >= 1 && r._2 <= 2)
    assert(r._3 == 4000L)
    // the kept files' rows bound the matching rows from above
    assert(r._4 >= 601L && r._4 <= 2000L, r.toString)
    // nothing prunes -> bound equals total; everything prunes -> 0
    val all = explainPrune(stats, Seq(LongBound("nope", Some(0), None)))
      .as[(Long, Long, Long, Long)].head()
    assert(all._2 == 4 && all._4 == 4000L)
    val none = explainPrune(stats, Seq(DoubleBound("alln", Some(0.0), None)))
      .as[(Long, Long, Long, Long)].head()
    assert(none._2 == 0 && none._4 == 0L)
  }

  test("tsBound prunes timestamp columns in epoch micros") {
    val d = tmp()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_shipdate")
    Layout.writeRangeSorted(li, d, numFiles = 4,
      sortCols = Seq("l_shipdate"))
    val stats = build(spark, d, Seq("l_shipdate"))
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z")
    val hi = java.time.Instant.parse("1996-03-31T23:59:59Z")
    val b = Seq(tsBound("l_shipdate", Some(lo), Some(hi)))
    val kept = pruneFiles(stats, b).count()
    assert(kept < 4, s"a quarter-long band should prune: kept $kept/4")
    val pred = $"l_shipdate".between(
      "1996-01-01 00:00:00", "1996-03-31 23:59:59")
    val got = readPruned(spark, d, stats, b).filter(pred).count()
    val want = spark.read.parquet(d).filter(pred).count()
    assert(got == want && got > 0)
  }

  test("cross-row-group string stats aggregate in UTF-8 BYTE order, not " +
    "UTF-16 code-unit order") {
    // U+E000 (UTF-8 EE 80 80) vs U+10000 (UTF-8 F0 90 80 80, UTF-16
    // surrogate pair D800 DC00): byte order says E000 < 10000, UTF-16
    // code-unit order says 10000 < E000. Lay the file out so one row
    // group's min is U+E000 and another's is U+10000 — a UTF-16
    // aggregation records smin=U+10000 (byte-GREATER than the true
    // min), which can prune a file containing a matching row.
    val d = tmp()
    val low = "\uE000"; val pad = "\uE001"
    val high = "\uD800\uDC00" // U+10000
    spark.range(0, 200000).select(
      when(col("id") === 0L, lit(low))
        .when(col("id") >= 170000L, lit(high))
        .otherwise(lit(pad)).as("s"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(d)
    // sanity: the layout really produced a pure-`high` trailing group
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(listDataFiles(spark, d).head),
        new org.apache.hadoop.conf.Configuration()))
    val nBlocks = try reader.getFooter.getBlocks.size finally reader.close()
    assert(nBlocks > 2, s"need several row groups, got $nBlocks")
    val st = build(spark, d, Seq("s")).filter($"column" === "s").collect()
    assert(st.length == 1)
    assert(st.head.getAs[String]("smin") == low,
      "smin must be the UTF-8 byte-order minimum")
    assert(st.head.getAs[String]("smax") == high,
      "smax must be the UTF-8 byte-order maximum")
    // the contract the ordering protects: a bound matching only the
    // supplementary-plane rows must keep the file
    val stats = build(spark, d, Seq("s"))
    assert(pruneFiles(stats,
      Seq(StringBound("s", Some(high), None))).count() == 1L)
    assert(pruneFiles(stats,
      Seq(StringBound("s", None, Some(low)))).count() == 1L)
  }

  test("data files absent from the manifest fail OPEN in readPruned") {
    val d = tmp()
    spark.range(0, 1000).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(d)
    val st = build(spark, d, Seq("id"))
    // concurrent append the manifest has not seen
    val extra = tmp()
    spark.range(5000, 5100).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(extra)
    val hfs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new java.io.File(extra).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(hfs.rename(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      new org.apache.hadoop.fs.Path(d, "appended-" + part.getName)))
    // a bound excluding every MANIFESTED file still reads the
    // unlisted appendee: pruning under-prunes, never under-reads
    val got = readPruned(spark, d, st,
      Seq(LongBound("id", Some(5000L), None)))
      .filter($"id" >= 5000L).count()
    assert(got == 100L, s"unlisted file must be read unconditionally: $got")
    // and a fresh manifest prunes it again as normal
    val st2 = build(spark, d, Seq("id"))
    assert(readPruned(spark, d, st2,
      Seq(LongBound("id", Some(5000L), None))).inputFiles.length == 1)
  }

  test("loadIndex on a manifest-less table returns the empty-stats " +
    "full-scan fallback") {
    val d = tmp()
    spark.range(0, 500).toDF("id")
      .coalesce(2).write.mode("overwrite").parquet(d)
    assert(!indexExists(spark, d))
    val st = loadIndex(spark, d)
    assert(st.count() == 0L)
    // empty manifest -> every file is unlisted -> full scan
    val got = readPruned(spark, d, st,
      Seq(LongBound("id", Some(0L), Some(10L))))
    assert(got.count() == 500L)
  }

  test("saveIndex commits via generation + atomic pointer: a plan held " +
    "across one save still reads; keep-two retention GCs older") {
    val d = tmp()
    spark.range(0, 100).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(d)
    def gens(): Seq[String] = new java.io.File(d).listFiles()
      .map(_.getName).filter(_.startsWith("_stats_index_g")).sorted.toSeq
    saveIndex(build(spark, d, Seq("id")), d)
    assert(indexExists(spark, d))
    assert(gens() == Seq("_stats_index_g0"))
    val held = loadIndex(spark, d) // lazy plan pinned to g0
    saveIndex(build(spark, d, Seq("id")), d)
    assert(gens() == Seq("_stats_index_g0", "_stats_index_g1"))
    // the pre-save plan still executes: its generation survived
    assert(held.count() == 1L)
    saveIndex(build(spark, d, Seq("id")), d)
    assert(gens() == Seq("_stats_index_g1", "_stats_index_g2"))
    // pointer follows the newest generation
    assert(loadIndex(spark, d).count() == 1L)
    // no legacy single-dir manifest is ever left behind
    assert(!new java.io.File(s"$d/_stats_index").exists())
  }

  test("gated skip_scan matches the direct filtered aggregate") {
    val viaIndex = skipScan(spark, sf).collect().toSeq
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter($"l_quantity" >= 45.0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(viaIndex == direct)
  }
}
