package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CurationRunSpec extends SparkSpec {
  import spark.implicits._
  import CurationRun.{Stage, StageReport}

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-crun").toString

  // invocation counters: resume must SKIP the fn, not just re-read
  private val calls = new AtomicInteger(0)
  private def counted(name: String)(fn: DataFrame => DataFrame) =
    Stage(name, df => { calls.incrementAndGet(); fn(df) })

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "text", "lang", "n_chars")

  private def stages = Seq(
    counted("drop_short")(_.filter(col("n_chars") >= 50)),
    counted("en_only")(_.filter(col("lang") === "en")),
    counted("strip_text")(_.drop("text")))

  test("fresh run computes every stage, lineage adds up, result matches " +
    "the direct composition") {
    val wd = tmp()
    calls.set(0)
    val (out, reps) = CurationRun.run(spark, docs, stages, wd)
    assert(calls.get() == 3)
    assert(reps.map(_.reused) == Seq(false, false, false))
    // chained lineage: each stage's rowsIn is the previous rowsOut
    assert(reps(1).rowsIn == reps(0).rowsOut)
    assert(reps(2).rowsIn == reps(1).rowsOut)
    assert(reps(2).rowsOut == out.count())
    val direct = docs.filter(col("n_chars") >= 50)
      .filter(col("lang") === "en").drop("text")
    assert(out.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    assert(reps(0).rowsIn == docs.count())
    // manifest written and mentions every stage
    val m = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$wd/manifest.json")), "UTF-8")
    stages.foreach(s => assert(m.contains(s""""stage":"${s.name}"""")))
  }

  test("re-run reuses every committed stage without invoking any fn") {
    val wd = tmp()
    CurationRun.run(spark, docs, stages, wd)
    calls.set(0)
    val (out, reps) = CurationRun.run(spark, docs, stages, wd)
    assert(calls.get() == 0, "resume must not re-run committed stages")
    assert(reps.forall(_.reused))
    assert(out.columns.toSeq == Seq("doc_id", "lang", "n_chars"))
  }

  test("a crashed (uncommitted) stage recomputes, and so does everything " +
    "downstream — a reused output never sits on a recomputed input") {
    val wd = tmp()
    CurationRun.run(spark, docs, stages, wd)
    // simulate a crash between stage 1's data write and its commit:
    // delete the marker, leave the parquet
    val meta = new java.io.File(s"$wd/stage_1_en_only/_meta")
    assert(meta.exists()); assert(meta.delete())
    calls.set(0)
    val (_, reps) = CurationRun.run(spark, docs, stages, wd)
    assert(reps.map(_.reused) == Seq(true, false, false))
    assert(calls.get() == 2)
  }

  test("a recomputing committed stage is DECERTIFIED first: a crash " +
    "mid-recompute leaves no stale marker certifying new data") {
    val wd = tmp()
    CurationRun.run(spark, docs, stages, wd)
    // break the prefix at stage 0 so the committed stage 1 must
    // recompute, and make stage 1's fn crash DURING that recompute
    assert(new java.io.File(s"$wd/stage_0_drop_short/_meta").delete())
    val boom = stages.updated(1, Stage("en_only",
      (_: DataFrame) => throw new RuntimeException("mid-recompute crash")))
    intercept[RuntimeException] {
      CurationRun.run(spark, docs, boom, wd)
    }
    // the OLD marker must be gone — the stale certificate was the r11
    // hazard: new/partial data under an old marker gets silently reused
    assert(!new java.io.File(s"$wd/stage_1_en_only/_meta").exists(),
      "stale _meta must be deleted before a recompute starts")
    // the next honest run reuses stage 0 (the crashed run re-committed
    // it before dying) and recomputes 1 and 2 — never half-reads the
    // decertified directory
    calls.set(0)
    val (_, reps) = CurationRun.run(spark, docs, stages, wd)
    assert(reps.map(_.reused) == Seq(true, false, false))
    assert(calls.get() == 2)
  }

  test("a renamed stage recomputes from there on (fresh directory), " +
    "never reuses the old identity") {
    val wd = tmp()
    CurationRun.run(spark, docs, stages, wd)
    calls.set(0)
    val renamed = stages.updated(1,
      counted("en_only_v2")(_.filter(col("lang") === "en")))
    val (out, reps) = CurationRun.run(spark, docs, renamed, wd)
    assert(reps.map(_.reused) == Seq(true, false, false))
    assert(calls.get() == 2)
    assert(new java.io.File(s"$wd/stage_1_en_only_v2/_meta").exists())
    assert(out.count() > 0)
  }

  test("stage name validation and duplicate names refuse") {
    intercept[IllegalArgumentException](Stage("../evil", identity))
    intercept[IllegalArgumentException](Stage("", identity))
    val wd = tmp()
    intercept[IllegalArgumentException] {
      CurationRun.run(spark, docs,
        Seq(Stage("a", identity), Stage("a", identity)), wd)
    }
  }

  test("a stage that drops every row keeps the chain alive, and resume " +
    "reuses the empty checkpoint") {
    val wd = tmp()
    val all = Seq(
      Stage("gate_all", _.filter(lit(false))), // legitimate gate outcome
      Stage("after", _.withColumn("tag", lit(1))))
    val (out, reps) = CurationRun.run(spark, docs, all, wd)
    assert(reps.map(_.rowsOut) == Seq(0L, 0L))
    assert(out.count() == 0)
    assert(out.columns.contains("tag")) // schema flowed through empty
    // resume: both stages reused off markers, empty schema restored
    calls.set(0)
    val (out2, reps2) = CurationRun.run(spark, docs, all, wd)
    assert(reps2.forall(_.reused) && calls.get() == 0)
    assert(out2.count() == 0 && out2.columns.contains("tag"))
  }

  test("write-audit-publish composition: the staged run is the WRITE, " +
    "ReleaseGate is the AUDIT, the caller publishes only on pass") {
    import graft.registry.ReleaseGate
    val wd = tmp()
    // the published snapshot: a prior curation of the same corpus
    val (published, _) = CurationRun.run(spark, docs, stages, tmp())
    // candidate refresh: same stages, slightly different gate (a few
    // more docs survive) — healthy churn
    val relaxed = Seq(
      counted("drop_short")(_.filter(col("n_chars") >= 45)),
      counted("en_only")(_.filter(col("lang") === "en")),
      counted("strip_text")(_.drop("text")))
    val (candidate, _) = CurationRun.run(spark, docs, relaxed, wd)
    val healthy = ReleaseGate.audit(published, candidate, "doc_id",
      compare = Seq("lang", "n_chars"), maxChurnFrac = 0.3)
    assert(healthy.publishable, healthy.failures.toString)
    // broken refresh: the extractor-dropped-everything incident — the
    // staged run still COMMITS (it is the write-aside), the gate blocks
    val broken = Seq(Stage("gate_all", _.filter(lit(false))))
    val (emptyCand, _) = CurationRun.run(spark, docs, broken, tmp())
    val blocked = ReleaseGate.audit(published, emptyCand, "doc_id")
    assert(!blocked.publishable)
  }

  test("dropped accounting: rowsIn - rowsOut per stage") {
    val wd = tmp()
    val (_, reps) = CurationRun.run(spark, docs, stages, wd)
    val total = docs.count()
    val kept = reps.last.rowsOut
    assert(reps.map(_.dropped).sum == total - kept)
  }
}
