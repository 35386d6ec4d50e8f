package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

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
