package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G17: incremental dedup refreshes must be indistinguishable from a
  * one-shot recompute — the same contract IncrementalSpec proves for
  * feature materialization, here for the cluster state. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("three incremental refreshes equal the one-shot pipeline on the real corpus", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val n1 = IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state, threshold = 0.5)
    val n2 = IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 350),
      state, threshold = 0.5)
    val n3 = IncrementalDedup.refresh(spark, docs, state, threshold = 0.5)
    assert(n1.fresh === 200 && n2.fresh === 150 && n3.fresh === 150,
      "each refresh must process exactly the docs past the watermark")
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "incremental cluster state diverged from the one-shot recompute")
    // nothing new -> no-op, state untouched
    assert(IncrementalDedup.refresh(spark, docs, state, threshold = 0.5).fresh === 0L)
  }

  test("crash-retry is idempotent: a half-committed batch is invisible", graft.Slow) {
    import java.nio.file.{Files, Path}
    def copyTree(from: Path, to: Path): Unit = {
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst)
      }
    }
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = Files.createTempDirectory("graft-inccrash")
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state.toString, threshold = 0.5)
    val wmBefore = graft.registry.Incremental.watermark(spark, state.toString)
    // build the half-committed state faithfully: run the second refresh
    // in a CLONE, then copy only its new batch dirs back — the on-disk
    // picture of a crash after all three batch dirs were written but
    // before the watermark commit (so the clone's prune never ran here)
    val clone = Files.createTempDirectory("graft-inccrash-clone")
    copyTree(state, clone)
    IncrementalDedup.refresh(spark, docs, clone.toString, threshold = 0.5)
    for (sub <- Seq("hashes", "shingles", "assign"))
      copyTree(clone.resolve(s"$sub/batch=$wmBefore"),
        state.resolve(s"$sub/batch=$wmBefore"))
    // a reader between crash and retry sees exactly the pre-crash state
    val atCrash = IncrementalDedup.assignments(spark, state.toString)
    assert(atCrash.count() === 200, "uncommitted assign snapshot leaked to a reader")
    // the retry must re-derive the batch from scratch, not treat the
    // orphan dirs as prior state (which silently dropped new-rep docs)
    val n = IncrementalDedup.refresh(spark, docs, state.toString, threshold = 0.5)
    assert(n.fresh === docs.filter(col("doc_id") >= 200).count())
    val inc = IncrementalDedup.assignments(spark, state.toString)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "retry after simulated crash diverged from the one-shot recompute")
  }

  test("delta assigns + compaction: parity across snapshot boundaries, old state pruned", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-inccompact").toString
    // compactEvery=2: refreshes alternate snapshot/delta — parity must
    // hold no matter where the snapshot boundaries fall
    for (cut <- Seq(100L, 200L, 300L, 400L, Long.MaxValue))
      IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < cut),
        state, threshold = 0.5, compactEvery = 2)
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "delta/compaction label state diverged from the one-shot recompute")

    def batchDirs(sub: String): Seq[String] = {
      val d = new java.io.File(s"$state/$sub")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    }
    // snapshots were written and pruned to the latest two generations
    assert(batchDirs("assignsnap").size === 2, batchDirs("assignsnap").toString)
    // df state compacts on the same cadence: two retained count
    // snapshots, and only the post-snapshot delta dirs survive
    assert(batchDirs("dfcountsnap").size === 2, batchDirs("dfcountsnap").toString)
    assert(batchDirs("dfcounts").size === 1, batchDirs("dfcounts").toString)
    // deltas at or before the retained-previous snapshot are gone
    assert(batchDirs("assign").size < 3, batchDirs("assign").toString)
  }

  test("non-compaction refreshes write delta-sized label batches, not corpus-sized", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-incdelta").toString
    // compactEvery high enough that refreshes 2..3 write deltas
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state, threshold = 0.5, compactEvery = 100)
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 350),
      state, threshold = 0.5, compactEvery = 100)
    IncrementalDedup.refresh(spark, docs, state, threshold = 0.5, compactEvery = 100)
    val corpus = docs.count()
    for (d <- new java.io.File(s"$state/assign").listFiles()
        if d.getName.startsWith("batch=")) {
      val rows = spark.read.parquet(d.toString).count()
      // each delta holds its 150 new docs + relabeled old docs — it must
      // never approach the 500-doc corpus the old full-snapshot wrote
      assert(rows < corpus / 2,
        s"${d.getName} wrote $rows rows — corpus-sized, not delta-sized")
    }
    // and the reconstructed state still matches the one-shot
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0)
  }

  test("a lazy assignments() frame stays readable across one compaction") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-inclazy").toString
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state, threshold = 0.5, compactEvery = 1)
    val lazyFrame = IncrementalDedup.assignments(spark, state)
    // a compaction lands and prunes — but the previous generation is
    // retained, so the un-materialized frame must still be actionable
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 350),
      state, threshold = 0.5, compactEvery = 1)
    assert(lazyFrame.count() === 200)
  }

  test("stray non-numeric batch directories are skipped, not a crash") {
    val state = java.nio.file.Files.createTempDirectory("graft-incstray").toString
    val docs = Seq((1L, "a b c d e"), (2L, "p q r s t")).toDF("doc_id", "text")
    assert(IncrementalDedup.refresh(spark, docs, state, threshold = 0.35).fresh === 2L)
    // a foreign/stray directory under a state subdir (e.g. a manual
    // backup) must be ignored by committedBatches, not NumberFormatException
    for (sub <- Seq("hashes", "shingles", "assign"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(state, sub, "batch=backup"))
    val assign = IncrementalDedup.assignments(spark, state)
    assert(assign.count() === 2L)
    assert(IncrementalDedup.refresh(spark, docs, state, threshold = 0.35).fresh === 0L)
  }

  test("a held refresh lock makes refresh fail loudly and write nothing", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-inclock").toString
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state, threshold = 0.5)
    val wmBefore = graft.registry.Incremental.watermark(spark, state)
    val batchesBefore = new java.io.File(s"$state/hashes").listFiles().length
    // an in-flight refresher holds the lock (what the loser of a race sees)
    val lock = java.nio.file.Paths.get(state, "_lock_refresh")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.refresh(spark, docs, state, threshold = 0.5)
    }
    assert(e.getMessage.contains("_lock_refresh"))
    assert(graft.registry.Incremental.watermark(spark, state) === wmBefore,
      "failed refresh must not advance the watermark")
    assert(new java.io.File(s"$state/hashes").listFiles().length === batchesBefore,
      "failed refresh must not write batch dirs")
    // the in-flight refresher finishes (lock released) -> retry succeeds
    java.nio.file.Files.delete(lock)
    assert(IncrementalDedup.refresh(spark, docs, state, threshold = 0.5).fresh === 300L)
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0)
  }

  test("two concurrent refreshes: exactly one processes the delta — no silent drop", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-incrace").toString
    IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < 200),
      state, threshold = 0.5)
    // two refreshes race on one state dir. The pre-lock bug: both read
    // the same watermark, both write the SAME batch=<wm> dirs, the
    // second overwrite silently replaces the first's delta. Legal
    // outcomes per attempt now: it wins and processes the delta; it
    // arrives after the winner committed and sees nothing new (0); or it
    // overlaps the winner and fails loudly on the lock.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(
        IncrementalDedup.refresh(spark, docs, state, threshold = 0.5))),
      Future(scala.util.Try(
        IncrementalDedup.refresh(spark, docs, state, threshold = 0.5))))),
      300.seconds)
    results.filter(_.isFailure).foreach { l =>
      assert(l.failed.get.isInstanceOf[IllegalStateException], s"unexpected: $l")
      assert(l.failed.get.getMessage.contains("_lock_refresh"))
    }
    assert(results.count { r => r.isSuccess && r.get.fresh > 0 } === 1,
      s"exactly one attempt must process the delta: $results")
    // and the surviving state equals a clean sequential run's
    val inc = IncrementalDedup.assignments(spark, state)
    val full = DedupPipeline.dedup(docs, threshold = 0.5)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "state after the race diverged from the one-shot recompute")
  }

  test("a new doc bridges two existing clusters; all members relabel") {
    val state = java.nio.file.Files.createTempDirectory("graft-incbridge").toString
    val a = "a b c d e"
    val b = "p q r s t"
    val batch1 = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // J(bridge, a) = J(bridge, b) = 3/8 — above 0.35, so the bridge doc
    // near-dups with BOTH prior clusters and must merge them
    val batch2 = Seq((3L, s"$a $b"), (4L, b)).toDF("doc_id", "text")

    assert(IncrementalDedup.refresh(spark, batch1, state, threshold = 0.35).fresh === 2L)
    val before = IncrementalDedup.assignments(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before === Map(1L -> 1L, 2L -> 2L), "disjoint clusters before the bridge")

    assert(IncrementalDedup.refresh(spark, batch2, state, threshold = 0.35).fresh === 2L)
    val after = IncrementalDedup.assignments(spark, state).cache()
    val byDoc = after.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 3 bridges clusters {1} and {2}: everyone relabels to min id 1 —
    // including doc 4, an exact copy of PRIOR doc 2, which must inherit
    // 2's post-merge label, not its stale one
    (1L to 4L).foreach(i => assert(byDoc(i)._1 === 1L, s"doc $i: ${byDoc(i)}"))
    assert(after.filter(col("keep")).select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // parity with the one-shot over the concatenated corpus
    val full = DedupPipeline.dedup(batch1.unionByName(batch2), threshold = 0.35)
    assert(after.except(full).count() === 0 && full.except(after).count() === 0)
  }
}
