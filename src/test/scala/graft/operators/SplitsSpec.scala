package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Splits must be a pure per-row function of (id, seed, recipe) —
  * engine/layout/corpus-growth independent — and the holdout must be
  * leak-safe in the published direction: train-side near-copies of
  * held-out text flagged, the eval side never touched. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "text").cache()
  private val recipe = Seq("train" -> 800, "valid" -> 100, "test" -> 100)

  /** The single-node reference of the shared md5-bucket convention. */
  private def refBucket(id: Long, seed: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$seed".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 1000
  }
  private def refSplit(id: Long, seed: Long): String = {
    val b = refBucket(id, seed)
    if (b < 800) "train" else if (b < 900) "valid" else "test"
  }

  test("assignSplit matches the single-node md5 reference doc for doc; every row labeled; plan is one exchange-free projection") {
    val labeled = Splits.assignSplit(docs, recipe, seed = 7L)
    val got = labeled.select("doc_id", "split").as[(Long, String)].collect()
    assert(got.length === docs.count())
    got.foreach { case (id, s) =>
      assert(s === refSplit(id, 7L), s"doc $id")
    }
    // all three splits are populated at this corpus size
    assert(got.map(_._2).distinct.sorted === Seq("test", "train", "valid"))
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignSplit shuffled:\n$plan")
  }

  test("a document's split never depends on other documents (corpus growth stability) and rotates with the seed") {
    val subset = docs.filter(col("doc_id") < 50)
    val small = Splits.assignSplit(subset, recipe)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = Splits.assignSplit(docs, recipe)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) =>
      assert(full(id) === s, s"doc $id changed split when the corpus grew")
    }
    val rotated = Splits.assignSplit(docs, recipe, seed = 1L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full.exists { case (id, s) => rotated(id) != s },
      "seed rotation left every assignment unchanged")
  }

  test("assignSplit runs UNCHANGED on a stream (stateless, no watermark); verdicts match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batch = Splits.assignSplit(docs, recipe)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Splits.assignSplit(mem.toDS().toDF("doc_id", "text"), recipe)
      .select("doc_id", "split")
      .writeStream.outputMode("append").format("memory")
      .queryName("split_stream").start()
    try {
      mem.addData(input: _*)
      q.processAllAvailable()
      val online = spark.table("split_stream")
        .as[(Long, String)].collect().toMap
      assert(online === batch)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"unexpected state operator: ${q.lastProgress}")
    } finally q.stop()
  }

  test("recipe guards: per-milles must partition 1000, names unique, recipe non-empty") {
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, Seq("train" -> 900, "valid" -> 90))
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, Seq("train" -> 1100, "valid" -> -100))
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, Seq("a" -> 500, "a" -> 500))
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplitClean(docs, recipe, trainSplit = "nope")
    }
  }

  test("holdout leakage: a planted train-side copy of held-out text is flagged; the holdout is never flagged; composition equals the manual E10 call") {
    // plant: find an id the convention assigns to train, give it the
    // text of a held-out document — a verbatim eval leak
    val full = Splits.assignSplit(docs, recipe)
    val holdoutRow = full.filter(col("split") =!= "train")
      .select("doc_id", "text").as[(Long, String)]
      .filter(r => r._2.split(" ").length >= 5).head()
    val plantedId = (1000000L to 1001000L)
      .find(id => refSplit(id, 0L) == "train").get
    val seeded = docs.unionByName(
      Seq((plantedId, holdoutRow._2)).toDF("doc_id", "text"))

    val cleaned = Splits.assignSplitClean(seeded, recipe).cache()
    assert(cleaned.count() === seeded.count(), "rows must be preserved")
    val flagged = cleaned.filter(col("leaks_holdout"))
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(flagged.map(_._1).contains(plantedId), "planted leak not flagged")
    assert(flagged.forall(_._2 == "train"),
      "a held-out row was flagged — the eval set must stay fixed")

    // composition ≡ the manual E10 call over the same slices
    val labeled = Splits.assignSplit(seeded, recipe)
    val manual = Contamination.contamination(
        labeled.filter(col("split") === "train")
          .select(col("doc_id"), col("text")),
        labeled.filter(col("split") =!= "train")
          .select(col("doc_id").as("bench_id"), col("text")),
        minOverlap = 3, broadcastBench = false)
      .select("doc_id").as[Long].collect().sorted
    assert(flagged.map(_._1).sorted.toSeq === manual.toSeq)

    // and the un-broadcast holdout join is output-identical to the
    // broadcast form (the size-based planner only changes the plan)
    val viaBroadcast = Splits.holdoutLeaks(labeled, broadcastHoldout = true)
      .select("doc_id").as[Long].collect().sorted
    assert(viaBroadcast.toSeq === manual.toSeq)
  }
}
