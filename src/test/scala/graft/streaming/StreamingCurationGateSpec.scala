package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{LineDedup, NgramLm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed curation gate's streaming parity is structural (one
  * foreachBatch running the batch composition), so the spec pins the
  * WIRING: per-batch composed verdicts — line clean, rule gate on
  * CLEANED text, perplexity gate, the conjoined keep — must equal the
  * batch path bit-for-bit on an arbitrary arrival split, and every
  * verdict class must actually occur: cleanly kept, rule-failed,
  * ppl-failed, and a doc that cleans to empty (null ppl, kept out,
  * never dropped from the output).
  */
class StreamingCurationGateSpec extends SparkSpec {
  import spark.implicits._

  test("composed per-batch verdicts ≡ the batch line→rule→model path on an arbitrary arrival split") {
    implicit val sqlCtx = spark.sqlContext

    // corpus: real docs wrapped in chrome (the line stage's prey),
    // mangled all-OOV docs (the model gate's prey), and one all-chrome
    // doc that cleans to empty
    val base = Tables.documents(spark, sf).filter(col("doc_id") < 150)
    val chromed = base.select(col("doc_id"),
      concat(lit("NAVBAR HOME\n"), col("text"), lit("\nFOOTER LINE"))
        .as("text"))
    // junk: reverse every non-stopword — LENGTH-PRESERVING, so a junk
    // doc has the same word count / mean word length / ttr / stopwords
    // as its source and passes the rule gate whenever the source does,
    // while being out-of-vocabulary to the LM (the ppl tier's prey)
    val junk = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 9000L).as("doc_id"),
        expr("array_join(transform(split(text, ' '), " +
          "w -> CASE WHEN w IN ('the', 'a') THEN w ELSE reverse(w) END), ' ')")
          .as("text"))
    val onlyChrome = Seq((99999L, "NAVBAR HOME\nFOOTER LINE"))
      .toDF("doc_id", "text")
    val all = chromed.unionByName(junk).unionByName(onlyChrome).cache()

    // frozen artifacts, fit offline: the boilerplate index on the
    // chromed corpus, the LM on the trusted (real) text
    val dir = java.nio.file.Files.createTempDirectory("curation-gate")
    LineDedup.save(LineDedup.boilerplateIndex(all, minDocs = 3L),
      s"$dir/index")
    val index = LineDedup.load(spark, s"$dir/index")
    NgramLm.save(NgramLm.train(base.select("doc_id", "text"), order = 2),
      s"$dir/lm")
    val model = NgramLm.load(spark, s"$dir/lm")
    // cut between the trusted docs' ppl band and the junk band
    val realPpl = NgramLm.score(base.select("doc_id", "text"), model)
      .select("ppl").as[Double].collect()
    val maxPpl = realPpl.max * 1.001

    val offline = StreamingCurationGate.verdicts(all, index, model, maxPpl)
      .select("doc_id", "text", "n_lines", "removed_lines", "rule_pass",
        "ppl", "keep")
      .as[(Long, String, Long, Long, Boolean, Option[Double], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

    val rows = all.as[(Long, String)].collect()
    val got = scala.collection.mutable.Map
      .empty[Long, (String, Long, Long, Boolean, Option[Double], Boolean)]
    var batches = 0
    val mem = MemoryStream[(Long, String)]
    val q = StreamingCurationGate.gate(
        mem.toDS().toDF("doc_id", "text"), index, model, maxPpl) {
      (out: DataFrame, _: Long) =>
        got.synchronized {
          out.select("doc_id", "text", "n_lines", "removed_lines",
              "rule_pass", "ppl", "keep")
            .as[(Long, String, Long, Long, Boolean, Option[Double], Boolean)]
            .collect()
            .foreach(r => got(r._1) = (r._2, r._3, r._4, r._5, r._6, r._7))
          batches += 1
        }
    }.start()
    try {
      mem.addData(rows.take(71).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(71).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(batches >= 2, s"expected at least two micro-batches, saw $batches")
    assert(got.keySet === offline.keySet)
    got.foreach { case (id, v) => assert(v === offline(id), s"doc $id") }

    // every verdict class occurs, and the stages did their jobs
    val labels = rows.map(_._1).toSet
    assert(got.count { case (id, v) => v._3 > 0 } > 100,
      "chrome must excise broadly")
    assert(got.exists { case (id, v) => id < 9000L && v._6 }, "some real doc kept")
    assert(got.filter { case (id, _) => id >= 9000L && id < 99999L }
      .forall { case (_, v) => !v._6 }, "all-OOV junk must fail the gate")
    assert(got.exists { case (id, v) => id >= 9000L && v._4 && !v._6 },
      "some junk doc passes rules but fails on ppl — the model tier bites")
    val empty = got(99999L)
    assert(empty._1 === "" && empty._5.isEmpty && !empty._6 && !empty._4,
      s"the all-chrome doc must clean to empty and fail closed, got $empty")
  }
}
