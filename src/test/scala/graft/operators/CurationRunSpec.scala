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

  // ---- DAG execution + GC (r11 directive 8) --------------------------------

  import CurationRun.DagStage

  private def countedDag(name: String, deps: Seq[String])(
      fn: Map[String, DataFrame] => DataFrame) =
    DagStage(name, deps, m => { calls.incrementAndGet(); fn(m) })

  /** diamond: docs → a → (b, c) → d (fan-out then fan-in) */
  private def diamond = Seq(
    countedDag("a", Seq("docs"))(m =>
      m("docs").filter(col("n_chars") >= 50)),
    countedDag("b", Seq("a"))(m => m("a").filter(col("lang") === "en")),
    countedDag("c", Seq("a"))(m => m("a").filter(col("lang") =!= "en")),
    countedDag("d", Seq("b", "c"))(m =>
      m("b").unionByName(m("c")).drop("text")))

  test("diamond DAG: fresh run computes all, full re-run reuses all, " +
    "result matches the direct composition") {
    val wd = tmp()
    calls.set(0)
    val (frames, reps) = CurationRun.runDag(spark,
      Map("docs" -> docs), diamond, wd)
    assert(calls.get() == 4)
    assert(reps.map(_.reused) == Seq(false, false, false, false))
    val direct = docs.filter(col("n_chars") >= 50).drop("text")
    assert(frames("d").orderBy("doc_id").collect().toSeq ==
      direct.select(frames("d").columns.map(col): _*)
        .orderBy("doc_id").collect().toSeq)
    calls.set(0)
    val (_, reps2) = CurationRun.runDag(spark,
      Map("docs" -> docs), diamond, wd)
    assert(calls.get() == 0)
    assert(reps2.forall(_.reused))
  }

  test("diamond resume: invalidating one branch recomputes exactly its " +
    "cone — the sibling branch reuses") {
    val wd = tmp()
    CurationRun.runDag(spark, Map("docs" -> docs), diamond, wd)
    // crash b (marker gone, data stays): the recompute cone is {b, d};
    // a and c sit outside it
    assert(new java.io.File(s"$wd/dag_b/_meta").delete())
    calls.set(0)
    val (_, reps) = CurationRun.runDag(spark,
      Map("docs" -> docs), diamond, wd)
    val byName = reps.map(r => r.stage -> r.reused).toMap
    assert(byName == Map("a" -> true, "b" -> false, "c" -> true,
      "d" -> false), byName.toString)
    assert(calls.get() == 2)
  }

  test("a dep-list change invalidates the stage even with a marker " +
    "present (identity is name + deps)") {
    val wd = tmp()
    CurationRun.runDag(spark, Map("docs" -> docs), diamond, wd)
    // d now reads only b
    val redone = diamond.updated(3,
      countedDag("d", Seq("b"))(m => m("b").drop("text")))
    calls.set(0)
    val (_, reps) = CurationRun.runDag(spark,
      Map("docs" -> docs), redone, wd)
    val reusedByName = reps.map(r => r.stage -> r.reused).toMap
    assert(!reusedByName("d"))
    assert(calls.get() == 1)
  }

  test("dag validation: cycles, unknown deps, shadowed inputs refuse") {
    val wd = tmp()
    intercept[IllegalArgumentException] {
      CurationRun.runDag(spark, Map("docs" -> docs), Seq(
        DagStage("x", Seq("y"), m => m("y")),
        DagStage("y", Seq("x"), m => m("x"))), wd)
    }
    intercept[IllegalArgumentException] {
      CurationRun.runDag(spark, Map("docs" -> docs),
        Seq(DagStage("x", Seq("nope"), m => m("nope"))), wd)
    }
    intercept[IllegalArgumentException] {
      CurationRun.runDag(spark, Map("docs" -> docs),
        Seq(DagStage("docs", Seq("docs"), m => m("docs"))), wd)
    }
  }

  test("gc deletes superseded stage dirs, never a dir the live manifest " +
    "references, and refuses without a manifest") {
    val wd = tmp()
    intercept[IllegalArgumentException](CurationRun.gc(spark, wd + "/x"))
    CurationRun.run(spark, docs, stages, wd)
    // a rename supersedes stage_1_en_only; the re-run's manifest is live
    val renamed = stages.updated(1,
      counted("en_only_v2")(_.filter(col("lang") === "en")))
    CurationRun.run(spark, docs, renamed, wd)
    assert(new java.io.File(s"$wd/stage_1_en_only").exists())
    val deleted = CurationRun.gc(spark, wd)
    assert(deleted == Seq("stage_1_en_only"), deleted.toString)
    assert(!new java.io.File(s"$wd/stage_1_en_only").exists())
    // every live dir survived and the pipeline still resumes for free
    calls.set(0)
    val (_, reps) = CurationRun.run(spark, docs, renamed, wd)
    assert(reps.forall(_.reused) && calls.get() == 0)
    // idempotent: nothing left to collect
    assert(CurationRun.gc(spark, wd).isEmpty)
  }

  test("gc across forms: a dag manifest protects dag dirs; linear " +
    "leftovers in the same workDir are collected") {
    val wd = tmp()
    CurationRun.run(spark, docs, stages, wd) // linear run first
    CurationRun.runDag(spark, Map("docs" -> docs), diamond, wd)
    // the dag manifest is now live; the linear dirs are superseded
    val deleted = CurationRun.gc(spark, wd).sorted
    assert(deleted == Seq("stage_0_drop_short", "stage_1_en_only",
      "stage_2_strip_text"), deleted.toString)
    calls.set(0)
    val (_, reps) = CurationRun.runDag(spark,
      Map("docs" -> docs), diamond, wd)
    assert(reps.forall(_.reused) && calls.get() == 0)
  }

  test("dropped accounting: rowsIn - rowsOut per stage") {
    val wd = tmp()
    val (_, reps) = CurationRun.run(spark, docs, stages, wd)
    val total = docs.count()
    val kept = reps.last.rowsOut
    assert(reps.map(_.dropped).sum == total - kept)
  }
}
