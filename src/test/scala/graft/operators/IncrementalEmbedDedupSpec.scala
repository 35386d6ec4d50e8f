package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The embedding twin of IncrementalDedupSpec: split refreshes must be
  * indistinguishable from the one-shot lshNearDupPairs. */
class IncrementalEmbedDedupSpec extends SparkSpec {

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("graft-incembed").toString

  test("three incremental refreshes equal one-shot lshNearDupPairs on the real embeddings", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    val n1 = IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 150), state, threshold = 0.3)
    val n2 = IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 350), state, threshold = 0.3)
    val n3 = IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3)
    assert(n1.fresh === 150 && n2.fresh === 200 && n3.fresh === 150,
      "each refresh must process exactly the vectors past the watermark")

    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.3)
    assert(full.count() > 0, "test needs a non-empty pair set to be meaningful")
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "split-refresh pair set diverged from the one-shot operator")
    // no duplicate discovery: an old-old pair must never re-verify
    assert(inc.groupBy("id_a", "id_b").count()
      .filter(col("count") > 1).count() === 0)
    // nothing new -> no-op
    assert(IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3).fresh === 0L)
  }

  test("two concurrent refreshes: exactly one processes the delta — no silent drop") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 300), state, threshold = 0.3)
    // the same race class IncrementalDedupSpec pins: unserialized, both
    // writers share the watermark-derived batch tag and the second
    // overwrite silently drops the first's delta. With the lock, per
    // attempt: win and process, arrive late and see 0 new, or overlap
    // and fail loudly having written nothing.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(
        IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3))),
      Future(scala.util.Try(
        IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3))))),
      300.seconds)
    results.filter(_.isFailure).foreach { l =>
      assert(l.failed.get.isInstanceOf[IllegalStateException], s"unexpected: $l")
      assert(l.failed.get.getMessage.contains("_lock_refresh"))
    }
    assert(results.count { r => r.isSuccess && r.get.fresh > 0 } === 1,
      s"exactly one attempt must process the delta: $results")
    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.3)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "pair state after the race diverged from the one-shot operator")
  }

  test("a held refresh lock makes refresh fail loudly and write nothing") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val state = tmpState()
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 300), state, threshold = 0.3)
    val wmBefore = graft.registry.Incremental.watermark(spark, state)
    val lock = java.nio.file.Paths.get(state, "_lock_refresh")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalStateException] {
      IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3)
    }
    assert(e.getMessage.contains("_lock_refresh"))
    assert(graft.registry.Incremental.watermark(spark, state) === wmBefore,
      "failed refresh must not advance the watermark")
    java.nio.file.Files.delete(lock)
    assert(IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3).fresh > 0)
  }

  test("cells compaction: parity across snapshot boundaries, old batches pruned", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    // compactEvery=2: refreshes alternate snapshot/delta cell writes —
    // the candidate index must be identical either way
    for (cut <- Seq(100L, 200L, 300L, 400L, Long.MaxValue))
      IncrementalEmbedDedup.refresh(spark, vecs.filter(col("vec_id") < cut),
        state, threshold = 0.3, compactEvery = 2)
    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.3)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "compacted cell index diverged from the one-shot operator")
    def batchDirs(sub: String): Seq[String] = {
      val d = new java.io.File(s"$state/$sub")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    }
    assert(batchDirs("cellsnap").size === 2, batchDirs("cellsnap").toString)
    assert(batchDirs("cells").size === 1, batchDirs("cells").toString)
    // the raw-vector store rides the SAME snapshot cadence and retention
    assert(batchDirs("vecsnap").size === 2, batchDirs("vecsnap").toString)
    assert(batchDirs("vectors").size === 1, batchDirs("vectors").toString)
  }

  test("refreshes fed ONLY their delta equal the one-shot (self-contained state)") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 150), state, threshold = 0.3)
    // old embeddings must come from the state's own vector store: these
    // two refreshes never see a pre-watermark row
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") >= 150 && col("vec_id") < 350), state,
      threshold = 0.3)
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") >= 350), state, threshold = 0.3)
    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.3)
    assert(full.count() > 0)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "delta-only refreshes diverged from the one-shot operator")
  }

  test("the stored vector store prunes by id_bucket (the old-side attach read shape)") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    // bucketWidth 64 -> the 500-vector corpus spans ~8 partitions
    IncrementalEmbedDedup.refresh(spark, vecs.filter(col("vec_id") < 250),
      state, threshold = 0.3, bucketWidth = 64)
    IncrementalEmbedDedup.refresh(spark, vecs, state,
      threshold = 0.3, bucketWidth = 64)
    val stored = IncrementalEmbedDedup.storedVectors(spark, state)
    assert(stored.count() === 500)
    val pruned = stored.filter(col("id_bucket").isin(0L, 3L))
    pruned.collect()
    val lines = pruned.queryExecution.executedPlan.toString.split('\n')
    val scans = lines.filter(_.contains("FileScan"))
    assert(scans.nonEmpty)
    scans.foreach { l =>
      val pf = l.indexOf("PartitionFilters:")
      assert(pf >= 0 && l.substring(pf).takeWhile(_ != ']').contains("id_bucket"),
        s"vector-store scan not pruned by id_bucket:\n$l")
    }
  }

  test("pre-r8 state without a vector store fails loudly, not with silently dropped pairs") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 250), state, threshold = 0.3)
    // simulate a state written before the vector store existed
    import scala.reflect.io.Directory
    for (sub <- Seq("vectors", "vecsnap"))
      new Directory(new java.io.File(s"$state/$sub")).deleteRecursively()
    val e = intercept[IllegalArgumentException] {
      IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3)
    }
    assert(e.getMessage.contains("vector store"))
  }

  test("a crashed refresh (no watermark swap) is invisible; retry lands it once") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val state = tmpState()
    IncrementalEmbedDedup.refresh(spark,
      vecs.filter(col("vec_id") < 250), state, threshold = 0.3)
    val before = IncrementalEmbedDedup.pairs(spark, state).count()

    // simulate: second refresh writes its batch dirs but dies before the
    // watermark swap — run it fully in a clone, copy only the batch dirs
    import java.nio.file.{Files, Path, Paths}
    def copyTree(from: Path, to: Path): Unit =
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst)
      }
    val clone = Files.createTempDirectory("graft-incembed-clone")
    copyTree(Paths.get(state), clone)
    IncrementalEmbedDedup.refresh(spark, vecs, clone.toString, threshold = 0.3)
    val wmBefore = graft.registry.Incremental.watermark(spark, state)
    for (sub <- Seq("cells", "pairs"))
      copyTree(clone.resolve(s"$sub/batch=$wmBefore"),
        Paths.get(state, sub, s"batch=$wmBefore"))

    // a reader between crash and retry sees exactly the pre-crash state
    assert(IncrementalEmbedDedup.pairs(spark, state).count() === before,
      "uncommitted pair batch leaked to a reader")
    // retry re-derives the batch; final state matches the one-shot
    assert(IncrementalEmbedDedup.refresh(spark, vecs, state, threshold = 0.3).fresh ===
      vecs.filter(col("vec_id") >= 250).count())
    val inc = IncrementalEmbedDedup.pairs(spark, state)
    val full = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.3)
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0,
      "retry after simulated crash diverged from the one-shot operator")
  }
}
