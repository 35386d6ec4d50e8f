package graft.sources

import graft.SparkSpec
import graft.sources.FileStatsIndex._
import org.apache.spark.sql.functions._

/** Z-order layout vs linear sort, measured through the file-stats
  * index: the linear layout prunes only on its leading column; the
  * z-ordered layout prunes on BOTH columns (less tightly on each —
  * the documented trade). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-zorder").toString

  // 2-D uniform grid: x and y independent, 200x200
  private lazy val grid = {
    val n = 200
    spark.range(0, n.toLong * n).select(
      (col("id") / n).cast("long").as("x"),
      (col("id") % n).cast("long").as("y"),
      col("id").as("payload"))
  }

  // 64 files: z-range boundaries come from the range partitioner's
  // SAMPLE, so files misalign with exact bit-prefix hypercube cells by
  // up to ~2x; enough files keeps that slack small vs the pruning win.
  private lazy val (linDir, zDir, linStats, zStats) = {
    val l = tmp(); val z = tmp()
    Layout.writeRangeSorted(grid, l, numFiles = 64, sortCols = Seq("x"))
    Layout.writeZOrdered(grid, z, numFiles = 64, zCols = Seq("x", "y"))
    (l, z,
      build(spark, l, Seq("x", "y")),
      build(spark, z, Seq("x", "y")))
  }

  test("z-ordered layout preserves content exactly") {
    val a = spark.read.parquet(zDir).select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = grid.select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("trailing-column predicate prunes on z-order, not on linear sort") {
    // y in a 10% band: linear-by-x layout has every file spanning all y
    val b = Seq(LongBound("y", Some(90L), Some(110L)))
    val keptLin = pruneFiles(linStats, b).count()
    val keptZ = pruneFiles(zStats, b).count()
    assert(keptLin == 64L,
      s"linear layout cannot prune on the trailing column, kept $keptLin")
    assert(keptZ <= 40L,
      s"z-order should prune most files on a 10% y-band, kept $keptZ")
    // correctness on the pruned read
    val pz = readPruned(spark, zDir, zStats, b)
      .filter($"y".between(90, 110)).count()
    assert(pz == grid.filter($"y".between(90, 110)).count())
  }

  test("leading-column predicate prunes on both; linear is tighter") {
    val b = Seq(LongBound("x", Some(90L), Some(110L)))
    val keptLin = pruneFiles(linStats, b).count()
    val keptZ = pruneFiles(zStats, b).count()
    assert(keptLin <= 12L, s"dedicated sort should be tightest: $keptLin")
    assert(keptZ <= 40L, s"z-order should still prune on x: $keptZ")
    assert(keptLin <= keptZ,
      "the documented trade: linear sort at least as tight on its own column")
  }

  test("2-D box predicate prunes multiplicatively on z-order") {
    val b = Seq(
      LongBound("x", Some(40L), Some(60L)),
      LongBound("y", Some(140L), Some(160L)))
    val keptZ = pruneFiles(zStats, b).count()
    assert(keptZ <= 24L, s"a 10%x10% box should touch few z-files: $keptZ")
    val got = readPruned(spark, zDir, zStats, b)
      .filter($"x".between(40, 60) && $"y".between(140, 160))
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    val want = grid
      .filter($"x".between(40, 60) && $"y".between(140, 160))
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    assert(got == want)
  }

  test("skewed column still spreads over buckets (quantile cuts)") {
    // x heavily skewed: 90% of rows at x=0, rest uniform
    val skew = spark.range(0, 20000).select(
      when(col("id") % 10 =!= 0L, 0L)
        .otherwise(col("id")).as("x"),
      (col("id") % 100).as("y"), col("id").as("payload"))
    val d = tmp()
    Layout.writeZOrdered(skew, d, numFiles = 8, zCols = Seq("x", "y"))
    val st = build(spark, d, Seq("x", "y"))
    // a predicate on the non-skewed tail of x must still prune
    val kept = pruneFiles(st, Seq(LongBound("x", Some(15000L), None))).count()
    assert(kept <= 4L, s"skew must not collapse pruning entirely: $kept")
    // content preserved
    assert(spark.read.parquet(d).count() == 20000)
  }

  test("string z-columns bucket by sampled rank cuts and prune via the " +
    "footer string stats") {
    // numeric x plus a string key whose lexical order is meaningful
    val df = spark.range(0, 20000).select(
      (col("id") % 200).as("x"),
      format_string("key%05d", col("id") % 500).as("s"),
      col("id").as("payload"))
    val d = tmp()
    Layout.writeZOrdered(df, d, numFiles = 64, zCols = Seq("x", "s"))
    assert(spark.read.parquet(d).count() == 20000)
    val st = build(spark, d, Seq("x", "s"))
    // a 10% lexical band on the STRING column prunes most files
    val b = Seq(StringBound("s", Some("key00100"), Some("key00150")))
    val kept = pruneFiles(st, b).count()
    assert(kept <= 40, s"string band should prune on the z layout: $kept/64")
    // correctness: pruned read + real predicate == direct filter
    val got = readPruned(spark, d, st, b)
      .filter($"s" >= "key00100" && $"s" <= "key00150")
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    val want = df.filter($"s" >= "key00100" && $"s" <= "key00150")
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    assert(got == want)
  }

  test("in-place optimize rewrites a live dir z-ordered, refreshes the " +
    "manifest, preserves content exactly") {
    val d = tmp()
    // shuffled initial layout WITH a manifest (to be made stale)
    grid.repartition(10).write.mode("overwrite").parquet(d)
    saveIndex(build(spark, d, Seq("x", "y")), d)
    val beforeSet = grid.select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val (nb, na) = Layout.optimizeZOrdered(spark, d, numFiles = 64,
      zCols = Seq("x", "y"))
    assert(nb == 10 && na == 64, s"($nb, $na)")
    assert(spark.read.parquet(d).select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq == beforeSet)
    // the manifest was rebuilt over the NEW files (stale one replaced)
    // with the carried-over column set, and it prunes now
    val idx = loadIndex(spark, d)
    val files = listDataFiles(spark, d).toSet
    assert(idx.select("file").distinct().collect()
      .map(_.getString(0)).toSet == files)
    assert(pruneFiles(idx,
      Seq(LongBound("y", Some(90L), Some(110L)))).count() <= 40L)
    assert(!new java.io.File(s"$d/.optimize_tmp").exists())
  }

  test("crashed optimize (tmp present, table empty) refuses with recovery " +
    "instructions; stale tmp beside intact data is replaced") {
    val d = tmp()
    grid.limit(1000).write.mode("overwrite").parquet(d)
    // stale tmp beside INTACT data: replaced, optimize proceeds
    new java.io.File(s"$d/.optimize_tmp").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/.optimize_tmp/junk.txt"), "stale")
    val (nb, na) = Layout.optimizeZOrdered(spark, d, numFiles = 2,
      zCols = Seq("x", "y"))
    assert(na == 2 && spark.read.parquet(d).count() == 1000)
    // the crash-between window: tmp holds the data, table is empty
    val d2 = tmp()
    grid.limit(100).coalesce(1).write.mode("overwrite")
      .parquet(s"$d2/.optimize_tmp")
    new java.io.File(d2).mkdirs()
    val ex = intercept[IllegalArgumentException] {
      Layout.optimizeZOrdered(spark, d2, numFiles = 2, zCols = Seq("x"))
    }
    assert(ex.getMessage.contains("crashed between delete and move"),
      ex.getMessage)
  }

  test("mid-swap crash (sentinel armed, partial delete + partial rename) " +
    "recovers deterministically — no row lost") {
    import org.apache.hadoop.fs.Path
    val d = tmp()
    val data = grid.limit(1000)
    data.repartition(4).write.mode("overwrite").parquet(d)
    val want = data.select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // reconstruct the exact crash state: verified tmp copy + armed
    // sentinel + the destructive phase interrupted mid-flight
    val originals = listDataFiles(spark, d)
    Layout.writeZOrdered(spark.read.parquet(d), s"$d/.optimize_tmp",
      numFiles = 2, zCols = Seq("x"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/_optimize_swap"),
      ("1000" +: originals.map(f => new Path(f).getName))
        .mkString("", "\n", "\n"))
    // crash after TWO originals deleted and ONE new file renamed in —
    // the r11 hazard state where `before.nonEmpty` was still true
    val hfs = new Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    originals.take(2).foreach(f => hfs.delete(new Path(f), false))
    val tmpParquet = new java.io.File(s"$d/.optimize_tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(hfs.rename(new Path(tmpParquet.getAbsolutePath),
      new Path(d, tmpParquet.getName)))
    // the retry must replay the swap, not delete the only full copy
    val (_, na) = Layout.optimizeZOrdered(spark, d, numFiles = 2,
      zCols = Seq("x"))
    assert(na == 2)
    assert(spark.read.parquet(d).select("x", "y", "payload")
      .as[(Long, Long, Long)].collect().sorted.toSeq == want)
    assert(!new java.io.File(s"$d/_optimize_swap").exists())
    assert(!new java.io.File(s"$d/.optimize_tmp").exists())
  }

  test("swap recovery refuses on a row-count mismatch and keeps the " +
    "sentinel for manual recovery") {
    import org.apache.hadoop.fs.Path
    val d = tmp()
    grid.limit(500).repartition(2).write.mode("overwrite").parquet(d)
    val originals = listDataFiles(spark, d)
    Layout.writeZOrdered(spark.read.parquet(d), s"$d/.optimize_tmp",
      numFiles = 2, zCols = Seq("x"))
    // sentinel promises MORE rows than the tmp copy holds (a corrupted
    // crash state): recovery must refuse, not certify a short table
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/_optimize_swap"),
      ("9999" +: originals.map(f => new Path(f).getName))
        .mkString("", "\n", "\n"))
    val ex = intercept[IllegalArgumentException] {
      Layout.optimizeZOrdered(spark, d, numFiles = 2, zCols = Seq("x"))
    }
    assert(ex.getMessage.contains("sentinel"), ex.getMessage)
    assert(new java.io.File(s"$d/_optimize_swap").exists())
  }

  test("nulls bucket low and never change results") {
    val withNulls = spark.range(0, 5000).select(
      when(col("id") % 7 === 0L, lit(null).cast("long"))
        .otherwise(col("id")).as("x"),
      (col("id") % 50).as("y"), col("id").as("payload"))
    val d = tmp()
    Layout.writeZOrdered(withNulls, d, numFiles = 4, zCols = Seq("x", "y"))
    val back = spark.read.parquet(d)
    assert(back.count() == 5000)
    assert(back.filter($"x".isNull).count() ==
      withNulls.filter($"x".isNull).count())
    val st = build(spark, d, Seq("x"))
    val b = Seq(LongBound("x", Some(4000L), None))
    val got = readPruned(spark, d, st, b).filter($"x" >= 4000L).count()
    assert(got == withNulls.filter($"x" >= 4000L).count())
  }
}
