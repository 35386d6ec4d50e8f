package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SpanDecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private def words(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a benchmark phrase mid-document excises with its buffer, hand-computed") {
    // doc: 30 unique words; words 10..14 are the benchmark phrase
    val phrase = "b0 b1 b2 b3 b4"
    val doc = ((0 until 10).map(i => s"w$i") ++ phrase.split(" ") ++
      (15 until 30).map(i => s"w$i")).mkString(" ")
    val docs = Seq((1L, doc), (2L, words(20, "c"))).toDF("doc_id", "text")
    val bench = Seq((100L, phrase)).toDF("bench_id", "text")
    val out = Contamination.spanDecontaminate(docs, bench,
      window = 5, buffer = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    // flagged window at p=10; cut = [10-3, 10+5+3) = words 7..17
    val expect = ((0 until 7).map(i => s"w$i") ++
      (18 until 30).map(i => s"w$i")).mkString(" ")
    assert(out(1L).getString(1) === expect)
    assert(out(1L).getLong(2) === 19L) // kept tokens
    assert(out(1L).getLong(3) === 11L) // removed
    assert(out(1L).getLong(4) === 1L)
    // the clean doc comes back VERBATIM
    assert(out(2L).getString(1) === words(20, "c"))
    assert(out(2L).getLong(3) === 0L)
  }

  test("buffers clamp at document edges; overlapping hits merge into one cut") {
    val phrase = "b0 b1 b2"
    // phrase at the very start — buffered start would be negative
    val lead = (phrase.split(" ") ++ (3 until 10).map(i => s"w$i")).mkString(" ")
    // phrase twice, 2 apart — cuts [p0-2, p0+5), [p1-2, p1+5) overlap
    val twice = ((0 until 3).map(i => s"x$i") ++ phrase.split(" ") ++
      Seq("mid") ++ phrase.split(" ") ++ (0 until 4).map(i => s"y$i"))
      .mkString(" ")
    val docs = Seq((1L, lead), (2L, twice)).toDF("doc_id", "text")
    val bench = Seq((100L, phrase)).toDF("bench_id", "text")
    val out = Contamination.spanDecontaminate(docs, bench,
      window = 3, buffer = 2).collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: cut [max(0,-2), 5) => words 5..9 remain
    assert(out(1L).getString(1) === (5 until 10).map(i => s"w$i").mkString(" "))
    // doc 2: hits at p=3 and p=7 => cuts [1,8) and [5,12) merge to
    // [1,12) => kept: x0 (index 0) and y2 y3 (indices 12, 13)
    assert(out(2L).getString(1) === "x0 y2 y3")
    assert(out(2L).getLong(3) === 11L)
    assert(out(2L).getLong(4) === 2L)
  }

  test("docs or benchmark items shorter than the window are untouched/invisible") {
    val docs = Seq((1L, "a b c"), (2L, words(30, "w"))).toDF("doc_id", "text")
    // benchmark item of 4 words < window 5: no spans, nothing flags —
    // even though doc 2 would contain it verbatim
    val bench = Seq((100L, "w3 w4 w5 w6")).toDF("bench_id", "text")
    val out = Contamination.spanDecontaminate(docs, bench, window = 5,
      buffer = 0)
    assert(out.filter(col("removed_tokens") > 0).count() === 0)
    assert(out.count() === 2)
  }

  test("matches a single-node reference on the real corpus with planted phrases") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // plant: benchmark = 13-word slices lifted from three real docs
    val bench = docs.filter(col("doc_id").isin(11L, 222L, 333L))
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(split(col("text"), " "), 5, 13)).as("text"))
      .filter(size(split(col("text"), " ")) === 13)
    assert(bench.count() >= 2)
    val window = 13; val buffer = 5
    val got = Contamination.spanDecontaminate(docs, bench,
      window = window, buffer = buffer)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // single-node reference: string w-grams (no fingerprints), same rule
    val benchSet = bench.collect().flatMap { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      ws.sliding(window).filter(_.length == window).map(_.mkString(" "))
    }.toSet
    val expect = docs.collect().map { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
      val hits = (0 to ws.length - window).filter(p =>
        benchSet(ws.slice(p, p + window).mkString(" ")))
      if (ws.length < window || hits.isEmpty)
        r.getLong(0) -> ((r.getString(1), ws.length.toLong, 0L, 0L))
      else {
        val cut = Array.fill(ws.length)(false)
        for (p <- hits; i <- math.max(0, p - buffer) until
            math.min(ws.length, p + window + buffer)) cut(i) = true
        val kept = ws.indices.filterNot(cut).map(ws)
        r.getLong(0) -> ((kept.mkString(" "), kept.length.toLong,
          (ws.length - kept.length).toLong, hits.length.toLong))
      }
    }.toMap
    assert(got.keySet === expect.keySet)
    for (id <- expect.keys) assert(got(id) === expect(id), s"doc $id")
    // the plant actually fired on its source docs
    assert(expect.count(_._2._3 > 0) >= 2)
  }

  test("token conservation, layout invariance, both fingerprint paths agree") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 20)).as("text"))
    val out = Contamination.spanDecontaminate(docs, bench, window = 8,
      buffer = 4)
    // conservation: kept + removed == original words, every doc
    val orig = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => length(w) > 0))
        .cast("long").as("n0"))
    assert(out.join(orig, Seq("doc_id"))
      .filter(col("n_tokens") + col("removed_tokens") =!= col("n0"))
      .count() === 0)
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sorted.toSeq
    assert(key(Contamination.spanDecontaminate(docs.repartition(7), bench,
      window = 8, buffer = 4)) === key(out))
    assert(key(Contamination.spanDecontaminate(docs, bench, window = 8,
      buffer = 4, rolling = false)) === key(out))
    assert(key(Contamination.spanDecontaminate(docs, bench, window = 8,
      buffer = 4, broadcastBench = false)) === key(out))
  }

  test("honest one-pass contract: an excision seam can mint a new collision") {
    // doc = A + phrase + B where A's tail + B's head form ANOTHER
    // benchmark phrase only after excision splices them
    val docs = Seq((1L, "s0 s1 p0 p1 p2 s2 s3")).toDF("doc_id", "text")
    val bench = Seq((1L, "p0 p1 p2"), (2L, "s1 s2 s3"))
      .toDF("bench_id", "text")
    val once = Contamination.spanDecontaminate(docs, bench, window = 3,
      buffer = 0)
    assert(once.head().getString(1) === "s0 s1 s2 s3") // seam now matches b2
    // a second pass converges
    val twice = Contamination.spanDecontaminate(
      once.select(col("doc_id"), col("text")), bench, window = 3, buffer = 0)
    assert(twice.head().getString(1) === "s0")
  }

  test("guards and plan shape") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c")).toDF("bench_id", "text")
    intercept[IllegalArgumentException] {
      Contamination.spanDecontaminate(docs, bench, window = 0) }
    intercept[IllegalArgumentException] {
      Contamination.spanDecontaminate(docs, bench, buffer = -1) }
    val plan = Contamination.spanDecontaminate(docs, bench)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
