package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("compact bin-packs a fragmented table under the shared sentinel " +
    "protocol; content exact; already-compact tables no-op") {
    import spark.implicits._
    val d = tmp()
    val df = spark.range(0, 20000).toDF("id")
      .withColumn("v", col("id").cast("double"))
    df.repartition(64).write.mode("overwrite").parquet(d) // fragmented
    FileStatsIndex.saveIndex(
      FileStatsIndex.build(spark, d, Seq("id")), d)
    val want = df.as[(Long, Double)].collect().sorted.toSeq
    val bytes = FileStatsIndex.listDataFiles(spark, d)
      .map(f => new java.io.File(f.stripPrefix("file:")).length()).sum
    // target half the table per file -> exactly 2 packed files
    val (nb, na) = Layout.compact(spark, d,
      targetFileBytes = math.max(1024 * 1024, bytes / 2 + 1))
    assert(nb == 64 && na <= 3, s"($nb, $na)")
    assert(spark.read.parquet(d).as[(Long, Double)]
      .collect().sorted.toSeq == want)
    // manifest rebuilt over the new files (carried column set)
    val idx = FileStatsIndex.loadIndex(spark, d)
    assert(idx.select("file").distinct().collect().map(_.getString(0))
      .toSet == FileStatsIndex.listDataFiles(spark, d).toSet)
    // second compact: already at/below the packed target -> no-op
    val (nb2, na2) = Layout.compact(spark, d,
      targetFileBytes = 128L * 1024 * 1024)
    assert(nb2 == na2 && na2 == na)
    assert(!new java.io.File(s"$d/.optimize_tmp").exists())
    assert(!new java.io.File(s"$d/_optimize_swap").exists())
  }

  test("range-sorted layout skips row groups a shuffled layout must read") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars", "lang")
    val total = docs.count()

    val sorted = tmp()
    Layout.writeRangeSorted(docs, sorted, numFiles = 8,
      sortCols = Seq("n_chars"), maxRecordsPerFile = total / 16)
    val shuffled = tmp()
    docs.repartition(8).write.mode("overwrite")
      .option("maxRecordsPerFile", total / 16).parquet(shuffled)

    def readMatching(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("n_chars") >= 100 && col("n_chars") < 200)
      // collect() executes df's OWN queryExecution — count() would build a
      // fresh one and leave this plan's scan metrics at zero
      val n = df.collect().length.toLong
      (n, Layout.scanOutputRows(df))
    }
    val (nSorted, scannedSorted) = readMatching(sorted)
    val (nShuffled, scannedShuffled) = readMatching(shuffled)

    assert(nSorted == nShuffled, "layout must never change results")
    assert(nSorted > 0 && nSorted < total, "filter should be selective")
    // shuffled layout: row groups span ~the full n_chars range, so footer
    // stats prune (almost) nothing — a small file can miss the range by
    // luck, hence >= 90% rather than exact equality
    assert(scannedShuffled >= (total * 9) / 10,
      s"expected ~no skipping on shuffled layout: $scannedShuffled vs $total")
    // range-sorted: only row groups overlapping [100, 200) are read
    assert(scannedSorted < scannedShuffled / 2,
      s"expected row-group skipping on sorted layout: $scannedSorted vs $scannedShuffled")
  }
}
